"""Unicode-script profile corners: tie-breaks, none, mixed-script argmax.
Cross-engine parity over the corpus is the ``doc_script_profile`` oracle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from llm_document_parser_spark.operators.textstats import (
    SCRIPT_ORDER,
    dominant_script,
    script_char_count,
)


def test_dominant_script_cases(spark):
    cases = {
        "latin only": "latin",
        "мир мир мир ab": "cyrillic",  # 9 cyr > 2 latin
        "漢字 ab": "latin",  # tie 2-2 → latin (SCRIPT_ORDER)
        "漢字文 ab": "han",
        "مرحبا яя": "arabic",  # 5 arabic > 2 cyrillic
        "1234 !?": "none",  # digits/punct are Common script
        "": "none",
    }
    schema = StructType([StructField("t", StringType())])
    df = spark.createDataFrame([(k,) for k in cases], schema)
    got = {
        r["t"]: r["d"]
        for r in df.select("t", dominant_script(F.col("t")).alias("d")).collect()
    }
    for text, want in cases.items():
        assert got[text] == want, (text, got[text], want)


def test_counts_ignore_common_script(spark):
    schema = StructType([StructField("t", StringType())])
    df = spark.createDataFrame([("ab12 мир!",)], schema)
    row = df.select(
        *[script_char_count(F.col("t"), s).alias(s) for s in SCRIPT_ORDER]
    ).collect()[0]
    assert row["latin"] == 2
    assert row["cyrillic"] == 3
    assert row["han"] == 0 and row["arabic"] == 0
