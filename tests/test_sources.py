"""Training-data sources (S3/S4/S5, X13 templates, X16 auto-detect)."""

from __future__ import annotations

import os

from llm_document_parser_spark.minipdf import write_pdf
from llm_document_parser_spark.sources import (
    detect_csv_document_type,
    load_document_dir,
    load_training_csv,
)


def test_detect_csv_document_type():
    assert detect_csv_document_type(["first_name", "qty", "junk"]) == "invoice"
    assert detect_csv_document_type(["tender_title", "x"]) == "contract"
    assert detect_csv_document_type(["store", "total"]) == "receipt"
    assert detect_csv_document_type(["a", "b"]) == "general"
    assert detect_csv_document_type(["FIRST_NAME"]) == "invoice"  # case-insensitive


def test_load_invoice_csv_autodetect(spark, tmp_path):
    p = str(tmp_path / "inv.csv")
    with open(p, "w") as f:
        f.write("first_name,last_name,email,product_id,qty,amount\n")
        f.write("John,Smith,john@x.com,PROD-1,2,19.99\n")
        f.write("Jane,Davis,jane@x.com,PROD-2,5,7.50\n")
    df = load_training_csv(spark, p)
    rows = df.collect()
    assert len(rows) == 2
    assert all(r["document_type"] == "invoice" for r in rows)
    assert "Product ID: PROD-1" in rows[0]["text"]
    assert "Contact: john@x.com" in rows[0]["text"]


def test_load_passthrough_csv(spark, tmp_path):
    p = str(tmp_path / "train.csv")
    with open(p, "w") as f:
        f.write("text,document_type\n")
        f.write("some invoice text here,invoice\n")
        f.write(",receipt\n")  # empty text filtered (F1)
    df = load_training_csv(spark, p)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["document_type"] == "invoice"


def test_load_generic_csv(spark, tmp_path):
    p = str(tmp_path / "g.csv")
    with open(p, "w") as f:
        f.write("alpha,beta\n1,x\n")
    rows = load_training_csv(spark, p, document_type="letter").collect()
    assert rows[0]["document_type"] == "letter"
    assert "alpha: 1 | beta: x" in rows[0]["text"]


def test_load_document_dir(spark, tmp_path):
    d = str(tmp_path / "pdfs")
    os.makedirs(d)
    long_text = "Invoice line with plenty of text content " * 3
    with open(os.path.join(d, "a.pdf"), "wb") as f:
        f.write(write_pdf([long_text]))
    with open(os.path.join(d, "b.pdf"), "wb") as f:
        f.write(write_pdf(["short"]))  # < 50 chars -> filtered (F2)
    rows = load_document_dir(spark, d, document_type="invoice").collect()
    assert len(rows) == 1
    assert rows[0]["source_file"].endswith("a.pdf")
    assert rows[0]["document_type"] == "invoice"
    assert "plenty of text content" in rows[0]["text"]
