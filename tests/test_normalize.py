"""NFC normalization: pinned Unicode cases, idempotence, and a direct
cross-engine check against DuckDB's utf8proc ``nfc_normalize`` on hostile
non-ASCII strings (the catalog query covers the documents table; this
covers the corners the synthetic corpus can't reach)."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from llm_document_parser_spark.operators.normalize import (
    nfc_normalize_text,
    nfc_stats,
)

# (raw, expected-NFC) — hand-pinned, not derived from unicodedata at test
# time, so a platform with a broken unicodedata would fail loudly.
PINNED = [
    ("éclair", "éclair"),  # combining acute composes
    ("Å", "Å"),  # A + ring -> Å
    ("Å", "Å"),  # ANGSTROM SIGN -> Å (singleton)
    ("ﬁle", "ﬁle"),  # fi ligature is compatibility-only: NFC keeps it
    ("ḍ̇", "ḍ̇"),  # canonical reordering: d+dot-above+dot-below
    ("각", "각"),  # Hangul jamo compose to syllable GAG
    ("ascii stays ascii", "ascii stays ascii"),
    ("", ""),
]

HOSTILE = [raw for raw, _ in PINNED] + [
    "é" * 500,  # long run of decomposed pairs
    "́leading combining mark",
    "mixed é and é spellings",
    "ÅÅÅ",
    "emoji \U0001f600 é",  # astral plane neighbors
]


def _spark_nfc(spark, values):
    schema = StructType([StructField("t", StringType())])
    df = spark.createDataFrame([(v,) for v in values], schema)
    out = nfc_normalize_text(df, "t", "n").select("t", "n").collect()
    return {r["t"]: r["n"] for r in out}


def test_pinned_cases(spark):
    got = _spark_nfc(spark, [raw for raw, _ in PINNED])
    for raw, want in PINNED:
        assert got[raw] == want, f"NFC({raw!r}) = {got[raw]!r}, want {want!r}"


def test_null_passthrough(spark):
    schema = StructType([StructField("t", StringType())])
    df = spark.createDataFrame([(None,), ("é",)], schema)
    rows = nfc_normalize_text(df, "t").orderBy(F.col("t").asc_nulls_first()).collect()
    assert rows[0]["t"] is None
    assert rows[1]["t"] == "é"


def test_idempotent(spark):
    once = _spark_nfc(spark, HOSTILE)
    twice = _spark_nfc(spark, list(once.values()))
    for v in once.values():
        assert twice[v] == v


def test_matches_duckdb_utf8proc(spark):
    """Two independent Unicode implementations (CPython unicodedata vs
    DuckDB's utf8proc) must agree on every hostile string."""
    got = _spark_nfc(spark, HOSTILE)
    con = duckdb.connect()
    for raw in HOSTILE:
        (want,) = con.execute("select nfc_normalize(?)", [raw]).fetchone()
        assert got[raw] == want, f"engine disagreement on {raw!r}"


def test_stats_counts_composed_pairs(spark):
    schema = StructType(
        [StructField("id", StringType()), StructField("t", StringType())]
    )
    df = spark.createDataFrame(
        [("a", "éé"), ("b", "plain")], schema
    )
    rows = {r["id"]: r for r in nfc_stats(df, "id", "t").collect()}
    assert rows["a"]["raw_chars"] == 4
    assert rows["a"]["nfc_chars"] == 2
    assert rows["a"]["composed"] == 2
    assert rows["b"]["composed"] == 0
    # digest is over the NORMALIZED bytes
    import hashlib

    want = hashlib.md5("éé".encode()).hexdigest()
    assert rows["a"]["nfc_digest"] == want


def test_plan_is_single_arrow_stage(spark):
    """One ArrowEvalPython, no shuffle — the 10^12-row shape."""
    schema = StructType([StructField("t", StringType())])
    df = spark.createDataFrame([("x",)], schema)
    plan = nfc_normalize_text(df, "t")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
