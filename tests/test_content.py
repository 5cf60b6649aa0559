"""Link-density content extraction: hand-built pages with known block
structure, keep/drop verdicts, density math, reassembly order, and the
zero-shuffle scoring plan."""

from __future__ import annotations

from llm_document_parser_spark.operators.content import (
    content_blocks,
    extract_content,
    score_blocks,
)

_LONG = "word " * 12  # 60 visible chars after normalization (trailing trim)


def _pages(spark):
    rows = [
        (
            "u1",
            '<nav><a href="/">Home</a> <a href="/x">All articles</a></nav>'
            f"<p>{_LONG}</p>"
            f'<p>{_LONG} see <a href="/d">details</a></p>'
            "<footer>(c) site</footer>",
        ),
        ("u2", "<p>short</p>"),
        ("u3", f"<div><B>bold</B> {_LONG}</div>"),
    ]
    return spark.createDataFrame(rows, "url string, html string")


def test_block_scores_and_verdicts(spark):
    got = {
        (r["url"], r["block_idx"]): r
        for r in content_blocks(_pages(spark), min_chars=30).collect()
    }
    # u1: nav content is all-anchor → dropped; both <p>s kept; footer short
    u1 = [v for (u, _), v in sorted(got.items()) if u == "u1"]
    kept_texts = [r["block_text"] for r in u1 if r["kept"] == 1]
    assert len(kept_texts) == 2
    assert kept_texts[0] == _LONG.strip()
    assert kept_texts[1].endswith("see details")
    nav = next(r for r in u1 if "Home" in r["block_text"])
    # inter-anchor whitespace is visible but not anchor text, so
    # link_chars is one short of n_chars; density still far over 0.4
    assert nav["kept"] == 0 and nav["link_density"] > 0.4
    assert nav["link_chars"] == nav["n_chars"] - 1
    footer = next(r for r in u1 if "(c) site" in r["block_text"])
    assert footer["kept"] == 0 and footer["n_chars"] < 30
    # u2: single short block dropped
    assert all(r["kept"] == 0 for (u, _), r in got.items() if u == "u2")
    # u3: inline <b> stripped from visible text, block kept
    u3_kept = [r for (u, _), r in got.items() if u == "u3" and r["kept"] == 1]
    assert len(u3_kept) == 1
    assert u3_kept[0]["block_text"].startswith("bold word")
    assert u3_kept[0]["link_chars"] == 0


def test_density_math(spark):
    rows = [("u", '<p>aaaaa <a href="x">bbbbb</a></p>')]
    df = spark.createDataFrame(rows, "url string, html string")
    r = next(
        b for b in score_blocks(df).collect() if b["n_chars"] > 0
    )
    assert r["n_chars"] == 11  # "aaaaa bbbbb"
    assert r["link_chars"] == 5
    assert r["link_density"] == round(5 / 11, 6)


def test_extract_content_reassembles_in_order(spark):
    got = {
        r["url"]: r["content"] for r in extract_content(_pages(spark)).collect()
    }
    assert got["u1"] == f"{_LONG.strip()} {_LONG}see details"
    assert "u2" not in got  # nothing kept


def test_scoring_plan_has_no_exchange(spark):
    plan = score_blocks(_pages(spark))
    physical = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical, physical
