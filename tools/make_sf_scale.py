"""Scale an sf testdata dir by an integer factor, preserving layout.

Usage: python tools/make_sf_scale.py SRC_DIR DST_DIR FACTOR

Replicates each table FACTOR times with consistent key offsets so
referential integrity and per-copy distributions match the source:

- documents: doc_id offset; copy>0 tokens get a per-copy suffix so copies
  do not alias as exact/near duplicates (the scaled corpus behaves as
  FACTOR independent sub-corpora, matching "10x corpus, same local
  structure"); n_chars recomputed.
- embeddings: vec_id offset; vectors perturbed deterministically per copy
  so top-k neighborhoods are not degenerate ties.
- events: event_id/user_id offset.
- lineitem/orders/customer/supplier/part: all keys offset per copy,
  orderkey<->custkey<->partkey<->suppkey links preserved.
- nation/region: copied unchanged.

Every output table is ONE parquet file with ONE row group, matching the
driver's single-file layout (this is what makes the scan-parallelism
behavior representative).

Measurement aid only — never used by bench.py or queries.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_OFFSETS = {
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "lineitem": {"l_orderkey": 100_000_000, "l_partkey": 10_000_000, "l_suppkey": 1_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 10_000_000},
}

UNCHANGED = ["nation", "region"]


def _suffix_tokens(texts: pa.ChunkedArray, c: int) -> pa.Array:
    """token -> token<c> for every whitespace token (vectorized)."""
    # replace every token boundary: append suffix before each space and at end
    arr = pc.replace_substring_regex(texts.combine_chunks(), r"(\S+)", rf"\1{c}")
    return arr


def scale_table(name: str, src: str, dst: str, factor: int) -> None:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in UNCHANGED or factor == 1:
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=max(len(t) * factor, 1))
        return
    copies = []
    rng_base = np.random.default_rng(42)
    for c in range(factor):
        cols = {}
        for field in t.schema.names:
            col = t.column(field)
            offs = KEY_OFFSETS.get(name, {})
            if field in offs and c > 0:
                cols[field] = pc.add(col, offs[field] * c)
            elif name == "documents" and field == "text" and c > 0:
                cols[field] = _suffix_tokens(col, c)
            elif name == "embeddings" and field == "embedding" and c > 0:
                flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
                rng = np.random.default_rng(1000 + c)
                pert = (flat + rng.normal(0, 0.01, len(flat))).astype(np.float32)
                offsets = col.combine_chunks().offsets
                cols[field] = pa.ListArray.from_arrays(offsets, pa.array(pert))
            else:
                cols[field] = col
        if name == "documents":
            cols["n_chars"] = pc.utf8_length(cols["text"].combine_chunks()
                                             if isinstance(cols["text"], pa.ChunkedArray)
                                             else cols["text"]).cast(pa.int64())
        copies.append(pa.table(cols, schema=None).cast(t.schema)
                      if False else pa.table({k: cols[k] for k in t.schema.names}))
    out = pa.concat_tables(copies).combine_chunks()
    out = out.cast(t.schema)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                   row_group_size=len(out))


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        scale_table(name, src, dst, factor)
        print("wrote", name)
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
