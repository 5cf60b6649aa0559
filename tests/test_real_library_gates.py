"""The real-library seams: pdfplumber dispatch and the spaCy NER stage.

Neither library is installable in this environment, so these tests drive
the SEAMS with fakes — the dispatch logic, the batch plumbing, the column
contract — not the libraries themselves (reference behavior being mirrored:
src/document_parser.py:148-159 for pdfplumber, :443-460 for spaCy).

Everything shipped to executors is defined inside the test functions so
cloudpickle serializes it by value (no importable test module needed on
Python workers).
"""

from __future__ import annotations

import pytest

from llm_document_parser_spark import minipdf
from llm_document_parser_spark.datagen import generate_pages
from llm_document_parser_spark.operators.ner import ENTITY_LABELS, spacy_entities_stage
from llm_document_parser_spark.pipeline import RESULT_COLUMNS, extract_pipeline

# ------------------------------------------------------------- pdfplumber


class _FakePage:
    def __init__(self, text):
        self._text = text

    def extract_text(self):
        return self._text


class _FakePdf:
    def __init__(self, pages):
        self.pages = pages

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _FakePdfplumber:
    """Stands in for the pdfplumber module: open(fileobj) -> context mgr."""

    def __init__(self, pages=None, raise_on_open=False):
        self._pages = pages or []
        self._raise = raise_on_open
        self.opened_with = None

    def open(self, fileobj):
        if self._raise:
            raise ValueError("not a pdf I can read")
        self.opened_with = fileobj.read()
        return _FakePdf([_FakePage(t) for t in self._pages])


COMPRESSED_STYLE_PDF = (
    b"%PDF-1.7\n1 0 obj\n<< /Filter /FlateDecode /Length 20 >>\n"
    b"stream\n\x78\x9c\x0b\x49\xad(\x01\x00\x04]\x01\xc1\nendstream\nendobj\n"
)


def test_builtin_extractor_degrades_on_compressed_pdf():
    assert not minipdf.HAS_PDFPLUMBER  # environment precondition
    assert minipdf.extract_pdf_text(COMPRESSED_STYLE_PDF) == ""


def test_pdfplumber_dispatch_when_installed(monkeypatch):
    fake = _FakePdfplumber(pages=["PAGE ONE", None, "PAGE TWO"])
    monkeypatch.setattr(minipdf, "pdfplumber", fake)
    monkeypatch.setattr(minipdf, "HAS_PDFPLUMBER", True)
    # page loop contract (reference :150-156): non-empty pages + '\n' each
    assert minipdf.extract_pdf_text(COMPRESSED_STYLE_PDF) == "PAGE ONE\nPAGE TWO\n"
    assert fake.opened_with == COMPRESSED_STYLE_PDF


def test_pdfplumber_error_degrades_to_empty(monkeypatch):
    monkeypatch.setattr(minipdf, "pdfplumber", _FakePdfplumber(raise_on_open=True))
    monkeypatch.setattr(minipdf, "HAS_PDFPLUMBER", True)
    assert minipdf.extract_pdf_text(COMPRESSED_STYLE_PDF) == ""


def test_non_pdf_rejected_before_dispatch(monkeypatch):
    fake = _FakePdfplumber(pages=["SHOULD NOT APPEAR"])
    monkeypatch.setattr(minipdf, "pdfplumber", fake)
    monkeypatch.setattr(minipdf, "HAS_PDFPLUMBER", True)
    assert minipdf.extract_pdf_text(b"not a pdf") == ""
    assert fake.opened_with is None


# ------------------------------------------------------------------ spaCy


def _make_fake_nlp_factory():
    """Build an executor-side fake nlp factory: tokens shaped LABEL_word
    become entities of that label; everything else is ignored. The returned
    factory is a NESTED function so cloudpickle ships it by value — Python
    workers can't import this test module."""

    def factory():
        from types import SimpleNamespace

        known = {"PERSON", "ORG", "GPE", "DATE", "MONEY", "PRODUCT", "NORP"}

        def pipe(texts, batch_size=64):
            for t in texts:
                ents = []
                for tok in t.split():
                    label = tok.split("_")[0]
                    if "_" in tok and label in known:
                        ents.append(SimpleNamespace(label_=label, text=tok))
                yield SimpleNamespace(ents=ents)

        return SimpleNamespace(pipe=pipe)

    return factory


def test_spacy_stage_contract(spark):
    df = spark.createDataFrame(
        [
            ("a", "PERSON_Alice met PERSON_Bob and PERSON_Alice in GPE_Paris"),
            ("b", "MONEY_5 NORP_french plain words"),  # NORP not in contract -> dropped
            ("c", ""),
        ],
        "url string, extracted_text string",
    )
    out = spacy_entities_stage(df, nlp_factory=_make_fake_nlp_factory())
    rows = {r["url"]: r["entities"] for r in out.collect()}

    for ents in rows.values():
        assert set(ents) == set(ENTITY_LABELS)  # all six keys always present
    # order-preserving dedup (reference :455-458)
    assert rows["a"]["PERSON"] == ["PERSON_Alice", "PERSON_Bob"]
    assert rows["a"]["GPE"] == ["GPE_Paris"]
    assert rows["b"]["MONEY"] == ["MONEY_5"]
    assert all(rows["b"][k] == [] for k in ENTITY_LABELS if k != "MONEY")
    assert all(rows["c"][k] == [] for k in ENTITY_LABELS)


def test_spacy_stage_requires_library_or_factory(spark):
    df = spark.createDataFrame([("a", "x")], "url string, extracted_text string")
    with pytest.raises(RuntimeError, match="spaCy is not installed"):
        spacy_entities_stage(df)


def test_pipeline_selects_spacy_stage(spark):
    pages = generate_pages(spark, 12, seed=31, partitions=2)
    out = extract_pipeline(pages, use_spacy_ner=True, nlp_factory=_make_fake_nlp_factory())
    assert out.columns == RESULT_COLUMNS  # schema identical to the rule path
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert set(r["entities"].keys()) == set(ENTITY_LABELS)


def test_spacy_auto_select_requires_loadable_model(spark, monkeypatch):
    """`import spacy` succeeding must NOT auto-enable the spaCy stage when
    the model package is missing — spacy.load would OSError on every
    executor. Auto-select keys on spacy_model_available() instead."""
    import contextlib
    import io
    from types import SimpleNamespace

    from llm_document_parser_spark.operators import ner

    df = spark.createDataFrame(
        [("u", None, None, "plain text", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )

    # spaCy installed, model NOT installed -> rule path (no MapInPandas)
    monkeypatch.setattr(ner, "HAS_SPACY", True)
    monkeypatch.setattr(
        ner, "spacy",
        SimpleNamespace(util=SimpleNamespace(is_package=lambda m: False)),
        raising=False,
    )
    assert not ner.spacy_model_available()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_pipeline(df).explain(mode="simple")
    assert "MapInPandas" not in buf.getvalue()
    row = extract_pipeline(df).collect()[0]  # and it runs, rule-NER end-to-end
    assert set(row["entities"].keys()) == set(ENTITY_LABELS)

    # model present -> auto-select plans the spaCy stage
    monkeypatch.setattr(
        ner, "spacy",
        SimpleNamespace(util=SimpleNamespace(is_package=lambda m: m == "en_core_web_sm")),
        raising=False,
    )
    assert ner.spacy_model_available()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_pipeline(df).explain(mode="simple")
    assert "MapInPandas" in buf.getvalue()

    # is_package itself blowing up degrades to the rule path, never raises
    def broken(m):
        raise RuntimeError("corrupt metadata")

    monkeypatch.setattr(ner, "spacy", SimpleNamespace(util=SimpleNamespace(is_package=broken)), raising=False)
    assert not ner.spacy_model_available()


def test_pipeline_defaults_to_rule_ner_without_spacy(spark, tmp_path):
    import contextlib
    import io

    # materialize pages first — generate_pages itself is a mapInPandas stage
    # and would pollute the plan-shape assertion
    pages_path = str(tmp_path / "pages")
    generate_pages(spark, 6, seed=33, partitions=1).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        extract_pipeline(pages).explain(mode="simple")
    plan = buf.getvalue()
    # without spaCy installed the plan must stay single-Python-stage
    assert plan.count("ArrowEvalPython") == 1
    assert "MapInPandas" not in plan


# -------------------------------------------------------------------- OCR


PNG_1PX = (  # minimal valid PNG header + IHDR prefix (sniffing only)
    b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR" + b"\x00" * 20
)


def test_image_kind_sniffing():
    from llm_document_parser_spark.html_extract import sniff_doc_kind

    assert sniff_doc_kind(PNG_1PX) == "image"
    assert sniff_doc_kind(b"\xff\xd8\xff\xe0JFIF") == "image"
    assert sniff_doc_kind(b"GIF89a....") == "image"
    assert sniff_doc_kind(b"GIF87a....") == "image"
    assert sniff_doc_kind(b"II*\x00tiff") == "image"
    assert sniff_doc_kind(b"%PDF-1.4") == "pdf"
    assert sniff_doc_kind(b"plain words") == "text"


# real-web text that merely STARTS with a weak magic must not be routed to
# OCR (that path extracts "" and silently drops the document)
BMP_HEADER = b"BM" + (146).to_bytes(4, "little") + b"\x00\x00\x00\x00" + b"\x46\x00\x00\x00rest"


def test_weak_magics_require_corroboration(spark):
    from pyspark.sql import functions as F

    from llm_document_parser_spark.html_extract import sniff_doc_kind
    from llm_document_parser_spark.operators.kind import doc_kind_col

    cases = [
        (b"BMW Annual Report 2024: deliveries grew", "text"),
        (b"BM<html><body>broker marketing</body></html>", "html"),
        (BMP_HEADER, "image"),
        (b"GIF8 is the 1987 image format family", "text"),
        (b"GIF89a" + b"\x00" * 8, "image"),
        (b"BM", "text"),  # bare 2 bytes: no header to validate -> not image
    ]
    for payload, want in cases:
        assert sniff_doc_kind(payload) == want, payload[:20]
    # the native column expression must agree byte-for-byte with the oracle
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, (p, _) in enumerate(cases)], "i long, payload binary"
    )
    got = {r["i"]: r["kind"] for r in df.select("i", doc_kind_col(F.col("payload")).alias("kind")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, cases[i][0][:20]


def test_ocr_degrades_without_library():
    from llm_document_parser_spark.operators import extract_udfs as eu

    assert not eu.HAS_OCR  # environment precondition
    assert eu._payload_to_text(PNG_1PX, "image") == ""


def test_ocr_dispatch_when_installed(monkeypatch):
    from types import SimpleNamespace

    from llm_document_parser_spark.operators import extract_udfs as eu

    opened = {}

    class _FakeImageMod:
        @staticmethod
        def open(fobj):
            opened["bytes"] = fobj.read()
            return "fake-image-object"

    fake_tess = SimpleNamespace(
        image_to_string=lambda img: "OCR TEXT" if img == "fake-image-object" else ""
    )
    monkeypatch.setattr(eu, "pytesseract", fake_tess)
    monkeypatch.setattr(eu, "Image", _FakeImageMod)
    monkeypatch.setattr(eu, "HAS_OCR", True)
    assert eu._payload_to_text(PNG_1PX, "image") == "OCR TEXT"
    assert opened["bytes"] == PNG_1PX

    # any OCR error degrades to "" (reference :144-146)
    monkeypatch.setattr(
        eu, "pytesseract",
        SimpleNamespace(image_to_string=lambda img: (_ for _ in ()).throw(ValueError())),
    )
    assert eu._payload_to_text(PNG_1PX, "image") == ""


def test_image_payload_flows_to_success_false(spark):
    """End-to-end: an image payload without OCR installed becomes a
    success=false row with doc_kind='image' — never a crash."""
    from llm_document_parser_spark.pipeline import extract_pipeline

    pages = spark.createDataFrame(
        [("img://1", None, bytearray(PNG_1PX), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    row = extract_pipeline(pages).collect()[0]
    assert row["doc_kind"] == "image"
    assert row["success"] is False
    assert row["error"] == "No text could be extracted from the document"
