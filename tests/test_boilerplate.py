"""Frequent-line boilerplate removal (dedup.strip_frequent_lines)."""

from __future__ import annotations

from llm_document_parser_spark.operators.dedup import strip_frequent_lines


def _corpus(spark):
    # host A: nav line in all 6 docs; host B: same line in only 2 docs
    rows = []
    for i in range(6):
        rows.append((i, "a.com", f"unique body {i}\nHOME | ABOUT | CONTACT"))
    for i in range(6, 8):
        rows.append((i, "b.com", f"other body {i}\nHOME | ABOUT | CONTACT"))
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_scoped_threshold(spark):
    out = {
        r["doc_id"]: r
        for r in strip_frequent_lines(
            _corpus(spark), min_docs=5, scope_col="host"
        ).collect()
    }
    # host A: nav line removed from every doc, body kept
    for i in range(6):
        assert out[i]["clean_text"] == f"unique body {i}"
        assert out[i]["n_lines"] == 2 and out[i]["n_removed"] == 1
    # host B: same line is below threshold there — kept
    for i in range(6, 8):
        assert "HOME | ABOUT | CONTACT" in out[i]["clean_text"]
        assert out[i]["n_removed"] == 0


def test_global_scope_and_duplicate_lines_within_doc(spark):
    # the same line twice within ONE doc counts as one distinct doc
    rows = [(1, "x\nx"), (2, "x"), (3, "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in strip_frequent_lines(df, min_docs=3).collect()
    }
    # 'x' appears in 2 distinct docs < 3 — kept everywhere
    assert out[1]["clean_text"] == "x\nx" and out[1]["n_removed"] == 0
    out2 = {
        r["doc_id"]: r
        for r in strip_frequent_lines(df, min_docs=2).collect()
    }
    assert out2[1]["clean_text"] == "" and out2[1]["n_removed"] == 2
    assert out2[3]["clean_text"] == "y"


def test_all_blank_doc_survives(spark):
    df = spark.createDataFrame([(1, "  \n "), (2, "ok")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_frequent_lines(df, min_docs=9).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_lines"] == 0
    assert out[2]["clean_text"] == "ok"
