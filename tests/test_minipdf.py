"""Round-trip tests for the minimal PDF writer/extractor (S1 analog)."""

from llm_document_parser_spark.minipdf import extract_pdf_text, write_pdf


def test_single_page_roundtrip():
    pdf = write_pdf(["Hello World\nSecond line"])
    assert pdf.startswith(b"%PDF-")
    assert extract_pdf_text(pdf) == "Hello World\nSecond line\n"


def test_multi_page_joins_with_newline():
    # mirrors the reference page loop: each page contributes text + '\n'
    pdf = write_pdf(["page one text", "page two text"])
    assert extract_pdf_text(pdf) == "page one text\npage two text\n"


def test_escaping():
    tricky = r"parens (here) and \backslash"
    assert extract_pdf_text(write_pdf([tricky])) == tricky + "\n"


def test_non_pdf_payload_returns_empty():
    assert extract_pdf_text(b"<html></html>") == ""
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(None) == ""
