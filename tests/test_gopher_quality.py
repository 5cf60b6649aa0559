"""Gopher rule-set corners the corpus injection can't pin: exact
boundary values, bullet variants, overlapping ellipsis runs, stopword
case-insensitivity, empty text. Cross-engine parity over the corpus is
the ``gopher_quality_flags`` oracle."""

from __future__ import annotations

from llm_document_parser_spark.operators.textstats import gopher_quality


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_quality(df, **kw).collect()}


def test_rule_metrics(spark):
    got = _run(
        spark,
        [
            ("bullets", "- the cat\n- of dog\nplain line here"),
            ("dots", "the end...\nof line\nmore text..."),
            ("syms", "the of # ## text"),
            ("empty", ""),
            ("stops", "The OF and thats"),
        ],
        id_col="doc_id",
        text_col="text",
        min_words=1,
    )
    b = got["bullets"]
    assert b["bullet_line_frac"] == round(2 / 3, 6)
    assert b["stopword_hits"] == 2  # the, of
    d = got["dots"]
    assert d["ellipsis_line_frac"] == round(2 / 3, 6)
    # two '...' over 6 words ('...' binds to words 'end...' / 'text...')
    assert d["symbol_word_ratio"] == round(2 / 6, 6)
    s = got["syms"]
    assert s["n_words"] == 5
    assert s["symbol_word_ratio"] == round(3 / 5, 6)  # three '#' chars
    assert s["alpha_word_frac"] == round(3 / 5, 6)
    e = got["empty"]
    assert e["n_words"] == 0 and e["passes"] is False
    st = got["stops"]
    # case-insensitive presence; 'thats' != 'that'
    assert st["stopword_hits"] == 3


def test_ellipsis_run_counts_nonoverlapping(spark):
    got = _run(
        spark, [("r", "a......b")], id_col="doc_id", text_col="text", min_words=1
    )
    # six dots → exactly two non-overlapping '...' matches
    assert got["r"]["symbol_word_ratio"] == round(2 / 1, 6)


def test_passes_boundaries(spark):
    text_ok = "the cat sat with dogs " * 12  # 60 words, mean 3.67, 2 stopwords
    got = _run(spark, [("ok", text_ok.strip())], id_col="doc_id", text_col="text")
    assert got["ok"]["passes"] is True
    got2 = _run(
        spark,
        [("short", "the of words here")],
        id_col="doc_id",
        text_col="text",
    )
    assert got2["short"]["passes"] is False  # 4 words < default 50
