"""Hostile-payload battery: the pipeline must DEGRADE, never throw.

Spark 4 ANSI mode makes this non-trivial — decode()/element_at()/strict
casts all throw on bad input — so the engine uses cast("string"),
try_element_at and try_* variants throughout (see operators/kind.py,
pipeline.py). The reference's equivalent behavior is its exception path:
"No text could be extracted from the document" (src/document_parser.py:
762-766).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_document_parser_spark.pipeline import RESULT_COLUMNS, extract_pipeline

NO_TEXT_ERR = "No text could be extracted from the document"

HOSTILE = [
    ("null-payload", None),
    ("empty-payload", b""),
    ("invalid-utf8", b"\xff\xfe\xfa\x80\x80 garbage \x80"),
    ("truncated-pdf", b"%PDF-1.4\n1 0 obj\n<< /Len"),
    ("flate-pdf", b"%PDF-1.7\nstream\n\x78\x9c\x03\x00\x00\x00\x00\x01\nendstream"),
    ("pdf-magic-only", b"%PDF-"),
    ("boilerplate-html", b"<html><head><script>x()</script></head><body><nav>a b</nav></body></html>"),
    ("html-invalid-utf8", b"<html><body>ok \xff\x80 text that is long enough to score</body></html>"),
    ("nul-bytes-text", b"words\x00with\x00nuls and more words here"),
    ("control-chars", bytes(range(1, 32)) + b" after controls"),
    ("deep-nesting-html", b"<html><body>" + b"<div>" * 200 + b"deep" + b"</div>" * 200 + b"</body></html>"),
    ("long-line-text", b"A" * 200_000),
    ("bom-text", b"\xef\xbb\xbfplain text after a BOM"),
    ("fake-image", b"\x89PNG\r\n\x1a\nnot really a png"),
]


def test_hostile_payloads_never_throw(spark):
    rows = [
        (f"hostile://{name}", None, bytearray(p) if p is not None else None, None, "en")
        for name, p in HOSTILE
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = extract_pipeline(pages).collect()  # must not raise
    assert len(out) == len(HOSTILE)
    by_url = {r["url"]: r for r in out}

    for name, _ in HOSTILE:
        r = by_url[f"hostile://{name}"]
        assert r["success"] in (True, False)
        if not r["success"]:
            assert r["error"] == NO_TEXT_ERR, name
            assert r["extracted_text"] == "", name
        else:
            assert len(r["extracted_text"]) > 0, name
        # contract fields are always well-formed
        assert set(r["entities"].keys()) == {"PERSON", "ORG", "GPE", "DATE", "MONEY", "PRODUCT"}
        assert r["features"]["text_length"] == len(r["extracted_text"]), name

    # kind sniffing on the hostile set
    assert by_url["hostile://null-payload"]["doc_kind"] == "empty"
    assert by_url["hostile://empty-payload"]["doc_kind"] == "empty"
    assert by_url["hostile://truncated-pdf"]["doc_kind"] == "pdf"
    assert by_url["hostile://fake-image"]["doc_kind"] == "image"
    assert by_url["hostile://boilerplate-html"]["doc_kind"] == "html"
    assert by_url["hostile://invalid-utf8"]["doc_kind"] == "text"

    # specific degrade expectations
    for name in ("null-payload", "empty-payload", "truncated-pdf", "flate-pdf",
                 "pdf-magic-only", "fake-image"):
        assert by_url[f"hostile://{name}"]["success"] is False, name
    assert by_url["hostile://long-line-text"]["success"] is True
    assert by_url["hostile://bom-text"]["extracted_text"].endswith("plain text after a BOM")


def test_hostile_results_write_and_reread(spark, tmp_path):
    """The degraded rows round-trip through the parquet sink with a stable
    schema — the driver-contract guarantee."""
    rows = [
        (f"hostile://{n}", None, bytearray(p) if p is not None else None, None, "en")
        for n, p in HOSTILE
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    path = str(tmp_path / "hostile_results")
    extract_pipeline(pages).write.parquet(path)
    back = spark.read.parquet(path)
    assert set(back.columns) == set(RESULT_COLUMNS)
    assert back.count() == len(HOSTILE)
    assert back.filter(F.col("success").isNull()).count() == 0


def test_adversarial_regex_inputs_stay_fast(spark):
    """Superlinear-regex guard: degenerate single-token and digit+word lines
    (the shapes that made the unguarded email/address patterns take minutes
    per document) must process in seconds."""
    import time

    payloads = [
        ("letter-run", b"A" * 200_000),
        ("digitword", b"1 " + b"word " * 6_400),       # 32 KB, one digit start
        ("many-digit-starts", b"1 aa " * 6_400),        # 32 KB, many starts
        ("digit-run", b"7" * 100_000 + b" Main St, Denver, CO 80205"),
        ("space-words", (b"a " * 50_000)),
        # cue-NER stress shapes: long capitalized-bigram runs and comma
        # lists drive the _NAME/(?:,\s*NAME)* quantifiers end-to-end
        ("cap-word-run", b"Aa " * 20_000),
        ("cue-comma-list", b"TO: " + b"Aa Bb, " * 10_000 + b"Zz"),
        ("cue-no-boundary", b"FROM: " + b"Aa" * 40_000),
    ]
    rows = [(f"adv://{n}", None, bytearray(p), None, "en") for n, p in payloads]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    t0 = time.perf_counter()
    out = extract_pipeline(pages).collect()
    elapsed = time.perf_counter() - t0
    assert len(out) == len(payloads)
    assert elapsed < 60, f"adversarial batch took {elapsed:.1f}s"
