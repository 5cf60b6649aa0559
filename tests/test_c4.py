"""C4 rule set (operators/c4.py): line rewrites, page vetoes, verdict."""

from __future__ import annotations

from llm_document_parser_spark.operators.c4 import c4_clean


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df, **kw).collect()[0]


def test_terminal_punct_and_short_lines(spark):
    r = _run(
        spark,
        "This is a good sentence.\nno terminal punct\nok?\n"
        'He said "stop right there."\nShort.\n',
    )
    # kept: the good sentence + the quote line ('ok?' and 'Short.' have <3
    # words; 'no terminal punct' has no terminal)
    assert r["n_lines"] == 5
    assert r["n_kept"] == 2
    assert r["clean_text"].splitlines() == [
        "This is a good sentence.",
        'He said "stop right there."',
    ]


def test_javascript_line_dropped(spark):
    r = _run(spark, "Enable JavaScript to continue here.\nA real sentence stays.")
    assert r["n_kept"] == 1
    assert "JavaScript" not in r["clean_text"]


def test_page_vetoes(spark):
    assert _run(spark, "Lorem Ipsum dolor sit amet.")["has_lorem_ipsum"]
    assert _run(spark, "code follows { now done.")["has_brace"]
    assert _run(spark, "play casino games online today.")["has_blocked_word"]
    assert not _run(spark, "a casino-like word is not a token match.")[
        "has_blocked_word"
    ]


def test_sentence_minimum_after_filtering(spark):
    # three sentences across kept lines -> passes at the default min of 3
    good = "One full sentence here. Another one follows! A third one ends?"
    r = _run(spark, good)
    assert r["n_sentences"] == 3 and r["passes"]
    # the same page with the sentences on dropped lines fails
    r2 = _run(spark, "One full sentence here.\nshort\nno terminal")
    assert r2["n_sentences"] == 1 and not r2["passes"]


def test_empty_survivors(spark):
    r = _run(spark, "nope\nstill nope")
    assert r["n_kept"] == 0 and r["clean_text"] == "" and not r["passes"]
