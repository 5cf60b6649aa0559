"""Distributed WARC export (warc.write_warc_shards): roundtrip through
load_warc_dir, manifest accounting, determinism, gzip/plain modes, and
empty-partition behavior."""

from __future__ import annotations

import datetime
import glob
import gzip
import os

from pyspark.sql import functions as F

from llm_document_parser_spark.warc import load_warc_dir, write_warc_shards

TS = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _pages(spark, n=20):
    rows = [
        (
            f"http://site{i % 5}.example/p{i}",
            TS + datetime.timedelta(seconds=i),
            f"<html><body>page {i} éü</body></html>".encode(),
            "text/html",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, content_type string"
    )


def test_roundtrip_through_load_warc_dir(spark, tmp_path):
    out = str(tmp_path / "warcout")
    manifest = write_warc_shards(
        _pages(spark), out, n_shards=4
    ).collect()
    assert sum(m["n_records"] for m in manifest) == 20
    assert all(m["shard"].endswith(".warc.gz") for m in manifest)
    back = load_warc_dir(spark, out)
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["content_type"])
        for r in back.collect()
    }
    exp = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["content_type"])
        for r in _pages(spark).collect()
    }
    assert got == exp  # urls, timestamps, bodies (incl. non-ASCII) survive


def test_manifest_bytes_match_files(spark, tmp_path):
    out = str(tmp_path / "warcbytes")
    manifest = write_warc_shards(_pages(spark), out, n_shards=3).collect()
    for m in manifest:
        assert os.path.getsize(m["shard"]) == m["n_bytes"]
    files = sorted(glob.glob(os.path.join(out, "part-*.warc.gz")))
    assert files == sorted(m["shard"] for m in manifest)


def test_deterministic_bytes_across_runs(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc_shards(_pages(spark), a, n_shards=2).collect()
    write_warc_shards(_pages(spark), b, n_shards=2).collect()
    fa = sorted(glob.glob(os.path.join(a, "*")))
    fb = sorted(glob.glob(os.path.join(b, "*")))
    assert [os.path.basename(f) for f in fa] == [
        os.path.basename(f) for f in fb
    ]
    for x, y in zip(fa, fb):
        assert open(x, "rb").read() == open(y, "rb").read()


def test_plain_mode_and_cc_style_gzip_members(spark, tmp_path):
    out = str(tmp_path / "plain")
    m = write_warc_shards(
        _pages(spark, 5), out, n_shards=1, gzip_members=False
    ).collect()
    raw = open(m[0]["shard"], "rb").read()
    assert raw.startswith(b"WARC/1.0\r\n")
    outz = str(tmp_path / "gz")
    mz = write_warc_shards(_pages(spark, 5), outz, n_shards=1).collect()
    data = open(mz[0]["shard"], "rb").read()
    # CC-style: every record its own gzip member -> 5 magic headers
    assert data.count(b"\x1f\x8b\x08") == 5
    assert gzip.decompress(data[: data.find(b"\x1f\x8b\x08", 3)]).startswith(
        b"WARC/1.0\r\n"
    )


def test_empty_partitions_write_no_files(spark, tmp_path):
    out = str(tmp_path / "sparse")
    manifest = write_warc_shards(
        _pages(spark, 3), out, n_shards=16
    ).collect()
    files = glob.glob(os.path.join(out, "*"))
    assert len(files) == len(manifest) <= 3
    assert sum(m["n_records"] for m in manifest) == 3


def test_null_body_degrades_to_empty_record(spark, tmp_path):
    df = spark.createDataFrame(
        [("http://x.example/", TS, None, None)],
        "url string, warc_ts timestamp, html binary, content_type string",
    )
    out = str(tmp_path / "nullbody")
    m = write_warc_shards(df, out, n_shards=1).collect()
    assert m[0]["n_records"] == 1
    back = load_warc_dir(spark, out).collect()
    assert bytes(back[0]["html"]) == b""
    assert back[0]["content_type"] == "text/html"  # coalesced default
