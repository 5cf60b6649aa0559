"""Stateful streaming operators for crawl ingest.

Two tiers, chosen deliberately:

* ``first_seen_pages`` — cross-micro-batch url dedup. This is Structured
  Streaming's built-in ``dropDuplicates``: per-key state in the state
  store, real url comparison (no hash-collision loss), full row preserved.
  Don't hand-roll what the engine already scales.

* ``host_crawl_budget`` — a genuinely custom stateful operator via
  ``applyInPandasWithState``: per-host cumulative page counting with a
  budget flag, the streaming analog of the reference's per-user daily
  quota (reference: src/api_server.py:1358-1361, src/rate_limiter.py).
  Not expressible as dropDuplicates or a windowed agg (it emits one row
  per host per micro-batch carrying both the batch delta and the running
  total). State is two longs per host — bounded by host cardinality, not
  page count, so it holds at 10¹² pages.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def first_seen_pages(pages_stream: DataFrame) -> DataFrame:
    """Cross-batch first-seen dedup with the full page row preserved.

    ``dropDuplicates`` keeps per-url state in the state store; for
    bounded-retention crawls use ``dropDuplicatesWithinWatermark`` after a
    ``withWatermark("warc_ts", ...)`` to cap state growth.
    """
    return pages_stream.dropDuplicates(["url"])


BUDGET_OUTPUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("batch_pages", LongType()),
        StructField("total_pages", LongType()),
        StructField("batches_seen", LongType()),
        StructField("over_budget", BooleanType()),
    ]
)

BUDGET_STATE_SCHEMA = StructType(
    [
        StructField("total_pages", LongType()),
        StructField("batches_seen", LongType()),
    ]
)


def _budget_group(budget: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        total, batches = state.get if state.exists else (0, 0)
        # aggregate across ALL Arrow chunks of this micro-batch before
        # emitting — one output row per host per batch, not per chunk
        batch_pages = sum(len(pdf) for pdf in pdfs)
        total += batch_pages
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "batch_pages": [batch_pages],
                "total_pages": [total],
                "batches_seen": [batches],
                "over_budget": [total > budget],
            }
        )

    return fn


def host_crawl_budget(pages_stream: DataFrame, budget: int = 1000) -> DataFrame:
    """Per-host running crawl totals + budget flag, one row per host per
    micro-batch (update mode). T7 quota analog with bounded state."""
    keyed = pages_stream.select(
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host")
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _budget_group(budget),
        outputStructType=BUDGET_OUTPUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
