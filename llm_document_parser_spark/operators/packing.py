"""Sequence packing — place curated documents into fixed-length training
sequences, the last transform before tokenized shards feed a trainer.

Two packing disciplines used by real LLM data pipelines, both here:

* ``pack_concat_split`` (GPT-style): concatenate the token stream in a
  deterministic order and cut every ``seq_len`` tokens. Documents may
  span a sequence boundary (the trainer masks or accepts cross-doc
  attention). 100% utilization by construction; the interesting outputs
  are each document's placement and the boundary-crossing fraction.
  Shape: deterministic hash shards, then ONE window (running sum within
  the shard partition) — fully parallel, no global serial stage.
* ``pack_greedy`` (no-split first-fit-sequential): walk the shard's
  documents in deterministic order, close the current bin when the next
  document would overflow ``seq_len``. No document is ever split (needed
  when cross-document attention must be avoided and truncation is not
  acceptable); utilization < 1 and is worth auditing. A running sum
  cannot express "reset at overflow", so the per-shard walk runs in one
  Arrow batch per shard (``applyInPandas``) over (id, tokens) METADATA
  only — a shard of 10^7 docs is ~160 MB of ids+counts, comfortably in
  executor memory, and shards are the parallelism unit. The DuckDB
  oracle replays the identical walk as a recursive CTE (queries.py
  ``greedy_pack_bins``).

Determinism: order within a shard is ``(md5(id), id)`` — stable across
engines, partitionings and runs; no RNG state anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import token_count


def _with_shard_and_order(
    docs: DataFrame, n_shards: int, id_col: str, text_col: str,
    tokens_col: Column | None,
) -> DataFrame:
    toks = tokens_col if tokens_col is not None else token_count(F.col(text_col))
    ord_key = F.md5(F.col(id_col).cast("string"))
    # shard from the first 4 hex digits of the same md5 — portable to SQL
    # (DuckDB: CAST(('0x' || substr(md5(..),1,4)) AS INT) % n), uniform,
    # and independent of partitioning
    shard = F.conv(F.substring(ord_key, 1, 4), 16, 10).cast("long") % n_shards
    return docs.select(
        F.col(id_col),
        toks.cast("long").alias("n_tokens"),
        shard.alias("shard"),
        ord_key.alias("ord"),
    )


def pack_concat_split(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """GPT-style packing plan: per document, its placement in the packed
    token stream of its shard — ``(id, shard, n_tokens, start_tok,
    seq_first, seq_last, crosses_boundary)``. ``seq_first``/``seq_last``
    are the first/last ``seq_len``-token sequences the document touches;
    a document longer than ``seq_len`` necessarily crosses.

    One shuffle (the shard window); the running sum streams, nothing
    buffers. ``tokens_col`` swaps in an exact-BPE count column when true
    token accounting is required (operators/tokenizers.py)."""
    t = _with_shard_and_order(docs, n_shards, id_col, text_col, tokens_col)
    w = Window.partitionBy("shard").orderBy("ord", F.col(id_col).cast("string"))
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_tok")
    return (
        t.select(
            id_col,
            "shard",
            "n_tokens",
            start,
            F.floor((cum - F.col("n_tokens")) / seq_len).alias("seq_first"),
            F.floor((cum - 1) / seq_len).alias("seq_last"),
        )
        .withColumn(
            "crosses_boundary",
            (F.col("seq_last") > F.col("seq_first")).cast("int"),
        )
    )


def packing_stats(plan: DataFrame, seq_len: int) -> DataFrame:
    """Shard-level audit of a ``pack_concat_split`` plan: documents,
    tokens, full sequences produced, and the boundary-crossing fraction
    (the share of documents a trainer would see split across sequences)."""
    return plan.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.ceil(F.sum("n_tokens") / seq_len).cast("long").alias("n_sequences"),
        F.round(F.avg("crosses_boundary"), 6).alias("boundary_cross_frac"),
    )


def pack_greedy(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """No-split greedy packing: ``(id, shard, n_tokens, bin_id)`` where
    ``bin_id`` counts bins within the shard, opening a new bin whenever
    the next document (in deterministic ``md5(id)`` order) would push the
    current bin past ``seq_len``. A document longer than ``seq_len``
    always opens (and overflows) its own bin — it is never dropped here;
    filter oversized docs upstream if the trainer cannot truncate.

    The walk is inherently sequential per shard, so it runs as one Arrow
    batch per shard over (id, n_tokens) metadata only; shards are the
    scale-out axis (64 shards → 64-way parallel; raise ``n_shards`` with
    corpus size). Exactly one shuffle (the groupBy on shard)."""
    t = _with_shard_and_order(docs, n_shards, id_col, text_col, tokens_col)

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        # string-cast tiebreak mirrors the window/oracle ORDER BY exactly
        pdf = pdf.assign(_k=pdf[id_col].astype(str)).sort_values(
            ["ord", "_k"], kind="mergesort"
        )
        bins: list[int] = []
        bin_id = -1
        fill = 0
        first = True
        for n in pdf["n_tokens"]:
            if first or fill + n > seq_len:
                bin_id += 1
                fill = int(n)
                first = False
            else:
                fill += int(n)
            bins.append(bin_id)
        out = pdf[[id_col, "shard", "n_tokens"]].copy()
        out["bin_id"] = pd.Series(bins, index=pdf.index, dtype="int64")
        return out

    schema = (
        t.select(id_col, "shard", "n_tokens").schema.add("bin_id", "long")
    )
    return t.groupBy("shard").applyInPandas(walk, schema=schema)


def greedy_bin_stats(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-(shard, bin) audit of a ``pack_greedy`` result: document count,
    token fill, and utilization against ``seq_len`` (can exceed 1 only for
    a single oversized document)."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / seq_len, 6).alias("utilization"),
    )
