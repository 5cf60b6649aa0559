"""Round-6 optimization: size-gated repartition-after-read for the
single-file corpus tables (queries._t / _scan_balance_width).

The sf tables are one-file one-row-group parquet, so without the gate
every narrow stage above the scan runs in ONE task. The gate must fire
for the corpus tables (documents/embeddings), stay away from the
relational tables (their scan-bound aggregations measured SLOWER with
the extra exchange), and disable itself when the input is already wide
(the at-scale case)."""

from __future__ import annotations

import os

import pytest

from llm_document_parser_spark import queries as q
from llm_document_parser_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", app_name="test-scan-balance")
    yield s


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_parse_bytes_accepts_spark_size_strings():
    assert q._parse_bytes("134217728") == 128 << 20
    assert q._parse_bytes("128m") == 128 << 20
    assert q._parse_bytes("128mb") == 128 << 20
    assert q._parse_bytes("1g") == 1 << 30
    assert q._parse_bytes("64k") == 64 << 10
    assert q._parse_bytes("junk") == 128 << 20  # safe fallback


SF_DIR_BIG = "/root/testdata/sf0.1"


@pytest.mark.skipif(not os.path.isdir(SF_DIR_BIG), reason="testdata missing")
def test_documents_scan_is_rebalanced(spark):
    # sf0.1's documents file is big enough (≥ a few hundred KB) for the
    # gate to fire; sf0.01's 500-row file correctly stays single-task
    plan = _plan(q._t(spark, SF_DIR_BIG, "documents"))
    assert "Repartition" in plan
    small = _plan(q._t(spark, SF_DIR, "documents"))
    assert "Repartition" not in small


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_relational_tables_not_rebalanced(spark):
    for name in ("orders", "events", "lineitem", "nation"):
        assert "Repartition" not in _plan(q._t(spark, SF_DIR, name)), name


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_gate_disables_on_wide_scans(spark):
    # a parallelism of 1 means the single scan task already matches the
    # cluster width — the gate must return 0 (no repartition) rather
    # than add an exchange
    path = os.path.join(SF_DIR, "documents.parquet")
    n = q._scan_balance_width(spark, path)
    assert n == 0 or n > 1  # with local[4] the width must exceed 1 if set


def test_gate_zero_for_missing_or_big(spark, tmp_path):
    assert q._scan_balance_width(spark, str(tmp_path / "nope.parquet")) == 0
    big = tmp_path / "big.parquet"
    big.write_bytes(b"\0" * 16)
    # pretend it is over the size cap by monkeypatching the constant
    orig = q._SCAN_BALANCE_MAX_BYTES
    q._SCAN_BALANCE_MAX_BYTES = 8
    try:
        assert q._scan_balance_width(spark, str(big)) == 0
    finally:
        q._SCAN_BALANCE_MAX_BYTES = orig
