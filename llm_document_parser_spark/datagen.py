"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Generation is fully distributed: ``spark.range(n)`` → ``mapInPandas``, with
every row derived from ``random.Random(seed * 1e9 + id)`` so content is a pure
function of (seed, id) — identical regardless of partitioning or parallelism.
No driver-side loops, no external data.

Document bodies are re-expressions of the reference's own synthetic
generators: invoice (reference: src/document_parser.py:573-593), receipt
(reference: src/document_parser.py:600), contact (reference:
src/document_parser.py:605), contract (reference:
src/document_parser.py:277-298 template shape). Payload mix ~60% HTML /
25% PDF / 15% plaintext; host distribution is zipfian to exercise skew
handling (SURVEY.md §7.3 hazard 4).
"""

from __future__ import annotations

import datetime as _dt
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .minipdf import write_pdf
from .schemas import PAGES_SCHEMA

FIRST_NAMES = ["John", "Jane", "Robert", "Emily", "Michael", "Sarah", "Ethan", "Olivia"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Davis", "Miller"]
CITIES = ["New York", "Los Angeles", "Chicago", "Houston", "Phoenix", "Seattle"]
COMPANIES = ["Acme Corp", "Globex Inc", "Initech LLC", "Umbrella Ltd", "Stark Industries"]
JOBS = ["Engineer", "Analyst", "Manager", "Consultant", "Designer"]

_BASE_TS = _dt.datetime(2024, 3, 1, 0, 0, 0)

DOC_TYPE_CYCLE = ["invoice", "receipt", "contact", "contract", "general"]


def _invoice_body(rng: random.Random, i: int) -> str:
    first = rng.choice(FIRST_NAMES)
    last = rng.choice(LAST_NAMES)
    email = f"{first.lower()}.{last.lower()}@example.com"
    qty = rng.randint(1, 10)
    amount = round(rng.uniform(10.0, 1000.0), 2)
    date = f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/2024"
    due = f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/2024"
    city = rng.choice(CITIES)
    lines = [
        f"INVOICE #INV-{1000 + i}",
        f"Date: {date}",
        f"Due Date: {due}",
        "Bill To:",
        f"{first} {last}",
        f"{rng.randint(100, 999)} Main St",
        f"{city}",
        f"Product ID: PROD-{1000 + i}",
        f"Quantity: {qty}",
        f"Amount: ${amount:.2f}",
        f"Total: ${amount * 1.1:.2f}",
        f"Tax: ${amount * 0.1:.2f}",
        f"Contact: {email}",
        f"Job: JOB-{rng.randint(100, 999)}",
        f"Stock Code: STK-{rng.randint(1000, 9999)}",
        f"Prepared by: {rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}",
    ]
    return "\n".join(lines)


def _receipt_body(rng: random.Random, i: int) -> str:
    total = round(rng.uniform(5.0, 300.0), 2)
    date = f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/2024"
    method = rng.choice(["Credit Card", "Cash", "Debit Card"])
    return (
        f"Receipt #{2000 + i}\nDate: {date}\nTotal: ${total:.2f}\n"
        f"Payment Method: {method}\nThank you for shopping with us today"
    )


def _contact_body(rng: random.Random, i: int) -> str:
    first = rng.choice(FIRST_NAMES)
    last = rng.choice(LAST_NAMES)
    company = rng.choice(COMPANIES)
    phone = f"+1-555-{rng.randint(200, 999)}-{rng.randint(1000, 9999)}"
    return (
        f"Contact: {first} {last}\nCompany: {company}\n"
        f"Email: {first.lower()}.{last.lower()}{i}@example.com\nPhone: {phone}\n"
        f"Website: https://www.{company.split()[0].lower()}.example\n"
        f"Contact Information: reach us at {rng.randint(100, 999)} Market Street Suite {rng.randint(1, 99)}"
    )


def _contract_body(rng: random.Random, i: int) -> str:
    buyer = rng.choice(COMPANIES)
    supplier = rng.choice(COMPANIES)
    value = round(rng.uniform(1000.0, 90000.0), 2)
    date = f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/2024"
    term = f"{rng.randint(1, 5)} years"
    return "\n".join(
        [
            "CONTRACT AGREEMENT",
            f"Contract #CTR-{3000 + i}",
            f"Effective Date: {date}",
            f"Between: {buyer} and {supplier}",
            f"Buyer: {buyer}",
            f"Supplier: {supplier}",
            f"Amount: ${value:.2f}",
            f"Term: {term}",
            f"This agreement covers {rng.choice(JOBS).lower()} services for the stated term.",
        ]
    )


def _general_body(rng: random.Random, i: int) -> str:
    pct = round(rng.uniform(0.5, 99.5), 1)
    amount = rng.randint(100, 99999)
    date = f"{rng.randint(1, 12):02d}/{rng.randint(1, 28):02d}/2024"
    return (
        f"Quarterly report {4000 + i} published {date} shows revenue of "
        f"${amount:,}.00 which is {pct}% above plan.\n"
        f"Operations reviewed by {rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)} "
        f"of {rng.choice(COMPANIES)} during the reporting window."
    )


_BODY_FNS = {
    "invoice": _invoice_body,
    "receipt": _receipt_body,
    "contact": _contact_body,
    "contract": _contract_body,
    "general": _general_body,
}


def _wrap_html(body: str, rng: random.Random, host: str) -> bytes:
    """Wrap a document body in boilerplate-heavy HTML (nav/footer/link noise)."""
    nav_links = " ".join(
        f'<a href="/{w}">{w.capitalize()} section</a>' for w in ["home", "docs", "pricing"]
    )
    # group lines into multi-line paragraphs so blocks clear the extractor's
    # minimum-length bar (single short field lines would be dropped as noise)
    lines = body.split("\n")
    paragraphs = "".join(
        f"<p>{' '.join(lines[j : j + 4])}</p>" for j in range(0, len(lines), 4)
    )
    promo = (
        f'<div>Check out <a href="https://{host}/promo">our latest promotional '
        f'offers and seasonal discounts</a> available now</div>'
    )
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>Document {rng.randint(1, 10 ** 6)}</title>"
        "<style>body { font: 12px sans-serif; }</style>"
        "<script>var tracker = 'noise';</script></head>"
        f"<body><nav><ul><li>{nav_links}</li></ul></nav>"
        f"<header><div>{host} document portal archive page</div></header>"
        f"<article>{paragraphs}</article>"
        f"{promo}"
        "<footer><p>Copyright 2024 Example Portal. All rights reserved. "
        "Terms of service apply to every download.</p></footer>"
        "</body></html>"
    ).encode("utf-8")


def generate_page(seed: int, i: int) -> tuple[str, _dt.datetime, bytes, str | None, str]:
    """Pure function of (seed, id) → one pages-table row."""
    rng = random.Random(seed * 1_000_000_007 + i)
    doc_type = DOC_TYPE_CYCLE[i % len(DOC_TYPE_CYCLE)]
    body = _BODY_FNS[doc_type](rng, i)

    # zipfian host skew: host rank ~ floor(pareto); host-0 is heavily hot
    host_rank = min(int(rng.paretovariate(1.1)) - 1, 499)
    host = f"host-{host_rank}.example"
    url = f"https://{host}/{doc_type}/{i}"

    kind_draw = rng.random()
    if kind_draw < 0.60:
        payload = _wrap_html(body, rng, host)
    elif kind_draw < 0.85:
        # split body into pages of ~6 lines for multi-page PDFs
        lines = body.split("\n")
        pages = ["\n".join(lines[j : j + 6]) for j in range(0, len(lines), 6)]
        payload = write_pdf(pages)
    else:
        payload = body.encode("utf-8")

    pre_text = body if rng.random() < 0.2 else None
    warc_ts = _BASE_TS + _dt.timedelta(seconds=i % 86_400, days=i % 30)
    return url, warc_ts, payload, pre_text, "en"


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages DataFrame of ``n`` rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [generate_page(seed, int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    rng_df = spark.range(n, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages(
    spark: SparkSession, path: str, n: int, seed: int = 42, partitions: int | None = None
) -> None:
    generate_pages(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
