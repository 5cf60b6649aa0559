"""Custom stateful streaming operator: cross-micro-batch first-seen dedup.

A crawl-ingest need the reference can't express (its dedup is per-request):
the same url may arrive in many WARC micro-batches; only the first
occurrence should flow downstream. Implemented with
``applyInPandasWithState`` — per url-hash group, the state is the set of
seen url hashes (xxhash64, 8 bytes/url), so state size is bounded by
corpus cardinality / num_groups and lookups are O(1) per row.

At 10¹² urls this is the streaming counterpart of exact_dup_groups: state
shards across ``num_groups`` partitions exactly like the lineage buckets.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("first_seen_batch_rows", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen_hashes", ArrayType(LongType()))])


def _dedup_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    seen: set[int] = set(state.get[0]) if state.exists else set()
    out: list[pd.DataFrame] = []
    for pdf in pdfs:
        fresh_mask = []
        for h in pdf["url_hash"]:
            h = int(h)
            if h in seen:
                fresh_mask.append(False)
            else:
                seen.add(h)
                fresh_mask.append(True)
        fresh = pdf[fresh_mask]
        if len(fresh):
            out.append(
                pd.DataFrame(
                    {
                        "url": fresh["url"],
                        "warc_ts": fresh["warc_ts"],
                        "first_seen_batch_rows": len(fresh),
                    }
                )
            )
    state.update((list(seen),))
    for pdf in out:
        yield pdf


def first_seen_urls(pages_stream: DataFrame, num_groups: int = 32) -> DataFrame:
    """Streaming DataFrame of first occurrences per url (append mode)."""
    keyed = pages_stream.select(
        "url",
        "warc_ts",
        F.pmod(F.xxhash64("url"), F.lit(num_groups)).alias("grp"),
        F.xxhash64("url").alias("url_hash"),
    )
    return keyed.groupBy("grp").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
