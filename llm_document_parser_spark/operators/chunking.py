"""Token-window chunking — split documents into fixed-size overlapping
token chunks, the standard preparation for embedding/RAG indexing and for
long-document training with sliding windows.

Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_len)`` with
``stride = chunk_len - overlap``; the last chunk is the first one whose
window reaches the end of the document (so every token is covered and no
empty trailing chunk is emitted). A document with ``<= chunk_len`` tokens
yields exactly one chunk.

Shape: narrow per-row work (one split + one ``sequence`` explode + one
``slice`` per chunk) — zero shuffles until the caller aggregates. The
explode multiplies rows by ``~n_tokens/stride``, which is the output's
actual size; nothing is buffered per document beyond its own token array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens, original case, empty runs dropped — matches the
    oracle's ``list_filter(string_split(text, ' '), ...)``."""
    return F.filter(F.split(text, " "), lambda x: x != "")


def chunk_tokens(
    docs: DataFrame,
    chunk_len: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, chunk_id, start_tok, chunk_tokens, chunk_digest)`` per chunk.
    ``chunk_digest`` is md5 of the space-joined chunk text — a compact,
    cross-engine-checkable stand-in for shipping the chunk text itself;
    select the slice directly when the text is wanted downstream."""
    if overlap >= chunk_len:
        raise ValueError("overlap must be smaller than chunk_len")
    stride = chunk_len - overlap
    toks = _ws_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_len, F.lit(1)).otherwise(
        F.ceil((n - chunk_len) / float(stride)).cast("long") + 1
    )
    t = docs.select(
        F.col(id_col), toks.alias("_toks"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))
        ).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("_toks"), start + 1, chunk_len)
    return t.select(
        id_col,
        "chunk_id",
        start.alias("start_tok"),
        F.size(piece).cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_digest"),
    )
