"""Exact-substring duplicate-span removal (dedup.remove_duplicate_spans):
pure-Python replay parity, merge semantics, case sensitivity, hostile
shapes, and the plan invariant (no cartesian / no range join — membership
is a per-doc HOF filter against a collected interval list)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.operators import dedup

DUP = "alpha beta gamma delta epsilon"  # a 5-token span planted twice


def _replay(corpus: dict[int, str], n: int, min_count: int) -> dict[int, tuple]:
    """Reference implementation: literal restatement of Lee et al.'s
    rule — cut every token n-gram occurring >= min_count times corpus-wide,
    merging overlapping/adjacent spans first."""
    toks = {d: t.split(" ") for d, t in corpus.items()}
    from collections import Counter

    cnt: Counter = Counter()
    for tk in toks.values():
        for i in range(len(tk) - n + 1):
            cnt[" ".join(tk[i : i + n])] += 1
    out = {}
    for d, tk in toks.items():
        starts = [
            i
            for i in range(len(tk) - n + 1)
            if cnt[" ".join(tk[i : i + n])] >= min_count
        ]
        ivs: list[list[int]] = []
        for s in starts:
            if ivs and s <= ivs[-1][1]:
                ivs[-1][1] = max(ivs[-1][1], s + n)
            else:
                ivs.append([s, s + n])
        kept = [
            t
            for i, t in enumerate(tk)
            if not any(a <= i < b for a, b in ivs)
        ]
        out[d] = (" ".join(kept), len(tk), len(tk) - len(kept))
    return out


def _run(spark, corpus: dict[int, str], n: int = 5, min_count: int = 2):
    df = spark.createDataFrame(
        list(corpus.items()), ["doc_id", "text"]
    )
    return {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_duplicate_spans(
            df, n=n, min_count=min_count
        ).collect()
    }


def test_replay_parity_planted_and_natural(spark):
    corpus = {
        1: f"one two three {DUP} four five six",
        2: f"{DUP} seven eight nine ten eleven twelve",
        3: "unique tokens only here nothing shared at all",
        4: f"x1 x2 {DUP} x3 {DUP} x4",  # two intra-doc copies
        5: "short doc",  # < n tokens: untouched
        6: "",  # empty: untouched
    }
    assert _run(spark, corpus) == _replay(corpus, 5, 2)


def test_overlapping_spans_merge_into_one_region(spark):
    # doc 2 contains an 8-token window whose two overlapping 5-gram
    # alignments are each duplicated (via docs 1 and 3) — the merge must
    # produce ONE contiguous cut, not two with a resurrected middle
    corpus = {
        1: "a b c d e tailA tailB tailC",
        2: "head1 a b c d e f g h head2 head3 head4",
        3: "d e f g h otherA otherB otherC",
    }
    got = _run(spark, corpus)
    assert got == _replay(corpus, 5, 2)
    assert got[2][0] == "head1 head2 head3 head4"


def test_case_sensitive_exactness(spark):
    # ExactSubstr is byte-exact: a case-differing span is NOT a duplicate
    corpus = {
        1: f"{DUP} pad1 pad2 pad3 pad4",
        2: f"{DUP.upper()} pad5 pad6 pad7 pad8",
    }
    got = _run(spark, corpus)
    assert got[1][2] == 0 and got[2][2] == 0


def test_full_document_clone_strips_both_to_empty(spark):
    text = "w1 w2 w3 w4 w5 w6 w7"
    got = _run(spark, {1: text, 2: text})
    assert got[1] == ("", 7, 7) and got[2] == ("", 7, 7)


def test_min_count_threshold(spark):
    corpus = {
        1: f"{DUP} p1 p2 p3",
        2: f"{DUP} q1 q2 q3",
        3: f"{DUP} r1 r2 r3",
    }
    # min_count=4: three occurrences are below threshold — nothing removed
    got = _run(spark, corpus, min_count=4)
    assert all(v[2] == 0 for v in got.values())
    # min_count=3: all three copies go
    got = _run(spark, corpus, min_count=3)
    assert all(v[2] == 5 for v in got.values())


def test_plan_has_no_cartesian_or_range_join(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} {DUP} z{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    plan = dedup.remove_duplicate_spans(df, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fast_hash_mode_matches_md5_mode(spark):
    # xxhash64 production digests produce the identical rewrite (collision
    # odds at test scale are 0 for all practical purposes)
    corpus = {
        1: f"one two three {DUP} four five six",
        2: f"{DUP} seven eight nine ten eleven twelve",
        3: "unique tokens only here nothing shared at all",
        4: f"x1 x2 {DUP} x3 {DUP} x4",
    }
    assert _run(spark, corpus) == {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.remove_duplicate_spans(
            spark.createDataFrame(list(corpus.items()), ["doc_id", "text"]),
            n=5,
            min_count=2,
            hash_fn="fast",
        ).collect()
    }


def test_cluster_representatives_argmax_and_ties(spark):
    rows = [
        (1, "a", 0.5),
        (2, "a", 0.9),
        (3, "a", 0.9),  # tie with 2 -> smaller id wins
        (4, "b", 0.1),  # singleton keeps itself
    ]
    df = spark.createDataFrame(rows, ["doc_id", "cluster", "score"])
    got = {
        r["doc_id"]: (r["keep_id"], r["keep"])
        for r in dedup.cluster_representatives(df).collect()
    }
    assert got == {1: (2, False), 2: (2, True), 3: (2, False), 4: (4, True)}


def test_cluster_representatives_composes_with_near_dup_clusters(spark):
    # the intended composition: near_dup_clusters assigns the cluster,
    # quality_score picks the survivor
    from llm_document_parser_spark.operators.textstats import quality_score

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds sing in the tall green trees every single morning"
    )
    rows = [
        (10, base),
        (11, base + " extra closing sentence with more words here"),
        (12, "completely different content about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    clusters = dedup.near_dup_clusters(
        df, num_hashes=8, bands=4
    ).withColumnRenamed("component", "cluster")
    scored = df.select(
        "doc_id", quality_score(F.col("text")).alias("score")
    ).join(clusters, "doc_id")
    reps = dedup.cluster_representatives(scored)
    got = {r["doc_id"]: r["keep"] for r in reps.collect()}
    assert got[12] is True  # singleton
    assert got[10] != got[11]  # exactly one of the near-dup pair survives
    kept = 10 if got[10] else 11
    # the survivor is the higher-quality member
    scores = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert scores[kept] == max(scores[10], scores[11])
