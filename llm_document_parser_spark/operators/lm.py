"""Unigram language-model quality scoring — a CCNet-style perplexity proxy.

Web-corpus curation pipelines (CCNet, RefinedWeb, Gopher) score documents
by language-model perplexity and drop or bucket the tails. The real thing
needs KenLM; the distributed SHAPE of the computation — train token
statistics over the corpus, broadcast the model, score every document —
is identical for a unigram LM, and a unigram avg(-log p) already separates
natural prose from boilerplate/gibberish. This module implements that
shape natively (no Python in the hot path), leaving the n-gram backoff
model as a drop-in replacement for the lm table.

Two stages:

* ``train_unigram_lm``: one explode + one groupBy (single shuffle) →
  ``(token, logp)`` with ``logp = ln(count/total)``. The total arrives by
  broadcast cross-join of the 1-row sum — no second shuffle, no collect.
* ``score_unigram_logprob``: explode + join tokens→lm + per-doc agg.
  The lm table is BROADCAST by default: a capped vocabulary fits in
  executor memory (``vocab_limit`` keeps the top-K tokens; everything
  else scores at a floor), so the scoring pass is map-side only — the
  token join would otherwise shuffle on Zipf-skewed keys ('the'
  dominates), the classic skew trap at 10^12 rows.

Determinism: integer counts → one ln per vocab row → avg of doubles;
round(6) absorbs libm-ulp and summation-order noise (same policy as
textstats.quality_score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )


def train_unigram_lm(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram model: ``(token, logp)``, logp = ln(count/total)."""
    counts = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("double").alias("c"))
    )
    total = counts.agg(F.sum("c").alias("s"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("c") / F.col("s")).alias("logp")
    )


def score_unigram_logprob(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = True,
    floor_logp: float | None = None,
) -> DataFrame:
    """Per-document mean negative log-probability under ``lm``:
    ``(id, n_tokens, avg_neg_logp)``. Lower = more typical of the corpus.

    ``floor_logp`` scores out-of-vocabulary tokens (left join + coalesce)
    — required when the lm was trained elsewhere or capped with
    ``vocab_limit``; None keeps the inner join (every token in-vocab,
    the self-scoring case)."""
    toks = _doc_tokens(df, id_col, text_col)
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    if floor_logp is None:
        joined = toks.join(lm_side, "token")
        logp = F.col("logp")
    else:
        joined = toks.join(lm_side, "token", "left")
        logp = F.coalesce(F.col("logp"), F.lit(float(floor_logp)))
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg(-logp), 6).alias("avg_neg_logp"),
    )


def cap_vocab(lm: DataFrame, vocab_limit: int) -> DataFrame:
    """Keep the ``vocab_limit`` highest-probability tokens (ties broken by
    token for determinism) — the broadcastable production model.
    orderBy+limit compiles to TakeOrderedAndProject (per-partition top-K,
    then a K-row merge), not a global sort — safe on a 10^9-row vocab."""
    return lm.orderBy(F.col("logp").desc(), "token").limit(vocab_limit)
