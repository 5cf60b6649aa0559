"""Sentence-level bitext alignment — the step after URL pair mining.

``operators/urls.bitext_url_pairs`` finds page pairs that differ only in
a language path segment (the ParaCrawl/CCMatrix prelude); this module
turns a matched pair's two texts into aligned sentence pairs — the unit
parallel-corpus training actually consumes. The aligner is the
Gale-Church diagonal baseline: sentences pair up positionally, and a
pair survives only if the two lengths agree within a ratio gate (real
translations track each other's length closely; boilerplate, truncated
pages and mis-paired content do not).

The ratio gate is INTEGER arithmetic (``max*den <= min*num``) so the
DuckDB oracle matches exactly — no float threshold in an admission
decision.

Scale shape: whatever join produced the pairs is the only shuffle;
splitting, zipping and gating are all narrow per-row expressions
(``split`` → ``transform``/``filter`` → ``zip_with`` → ``posexplode``),
zero Python. A page's sentence list lives in one row — no cross-row
state — so the operator streams at scan speed at 10^12 pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# portable sentence boundary (RE2-safe: no lookbehind): terminal
# punctuation run + whitespace; the last sentence keeps its terminal run,
# stripped during normalization below
SENT_SPLIT_RE = r"[.!?]+\s+"


def sentences(text: Column) -> Column:
    """Array of normalized sentences: boundary split, terminal
    punctuation stripped, trimmed, empties dropped."""
    return F.filter(
        F.transform(
            F.split(text, SENT_SPLIT_RE),
            lambda s: F.trim(F.regexp_replace(s, r"[.!?]+$", "")),
        ),
        lambda s: s != "",
    )


def align_sentences(
    pairs: DataFrame,
    id_col: str = "pair_id",
    a_col: str = "text_a",
    b_col: str = "text_b",
    ratio_num: int = 2,
    ratio_den: int = 1,
    short_len: int = 15,
) -> DataFrame:
    """Positionally aligned sentence pairs with the length-ratio verdict.

    Output: ``(pair_id, idx, sent_a, sent_b, len_a, len_b, aligned)`` for
    every index present in BOTH texts (the shorter side truncates).
    ``aligned`` = 1 when ``max(len)*ratio_den <= min(len)*ratio_num`` or
    both sentences are ≤ ``short_len`` chars (short UI strings pair
    loosely — the standard Gale-Church small-segment exemption)."""
    sa, sb = sentences(F.col(a_col)), sentences(F.col(b_col))
    z = F.zip_with(sa, sb, lambda x, y: F.struct(x.alias("sa"), y.alias("sb")))
    rows = (
        pairs.select(F.col(id_col).alias("pair_id"), F.posexplode(z))
        .select(
            "pair_id",
            F.col("pos").cast("long").alias("idx"),
            F.col("col.sa").alias("sent_a"),
            F.col("col.sb").alias("sent_b"),
        )
        .where(F.col("sent_a").isNotNull() & F.col("sent_b").isNotNull())
    )
    la = F.length("sent_a").cast("long")
    lb = F.length("sent_b").cast("long")
    big, small = F.greatest(la, lb), F.least(la, lb)
    ok = (big * ratio_den <= small * ratio_num) | (big <= short_len)
    return rows.select(
        "pair_id",
        "idx",
        "sent_a",
        "sent_b",
        la.alias("len_a"),
        lb.alias("len_b"),
        ok.cast("int").alias("aligned"),
    )
