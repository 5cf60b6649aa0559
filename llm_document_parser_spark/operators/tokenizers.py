"""Exact BPE token counting — the gated real-tokenizer seam.

Token counts drive real corpus accounting (``curation_funnel.kept_tokens``
budgets training runs), so the engine exposes BOTH semantics:

* **portable path** (``textstats.token_count`` /
  ``textstats.bpe_token_count``): native regexp column expressions,
  reproducible in the ANSI-SQL oracle, zero Python. ``kept_tokens`` in the
  oracle-verified funnel uses the whitespace counter — that's the
  cross-engine-checkable definition, and it's what the catalog attests.
* **exact path** (this module): true BPE token counts from a real
  tokenizer (tiktoken when importable, any ``.encode()``-shaped encoder
  via injection) inside ONE Arrow-batched pandas UDF. This is the number
  a training run actually consumes; use it for final corpus accounting
  when the tokenizer library is present. Counts differ from the portable
  path by construction (BPE merges are data-driven) — pipelines must not
  mix the two definitions within one budget.

Gating follows the repo's seam pattern (spaCy/pdfplumber/Pillow/
pytesseract/openpyxl/sklearn): tiktoken/HF are not installable in this
sandbox, so ``tiktoken_available()`` gates the default factory and a
deterministic regex stand-in encoder — which reproduces
``textstats.BPE_TOKEN_PATTERN`` exactly, tying the fake to the documented
approximation — drives the plumbing in tests.

At 10^12 rows: encoder built once per worker (lazy holder), one
ArrowEvalPython stage, no shuffle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .textstats import BPE_TOKEN_PATTERN

DEFAULT_ENCODING = "cl100k_base"


def tiktoken_available() -> bool:
    try:
        import tiktoken  # noqa: F401

        return True
    except ImportError:
        return False


class RegexStandInEncoder:
    """Deterministic ``.encode()``-shaped stand-in: the same letter-run /
    digit-run / mark pre-tokenization as ``textstats.BPE_TOKEN_PATTERN``,
    so seam tests can pin exact-path plumbing against the portable
    column expression value-for-value. Picklable from this module."""

    _rx = re.compile(BPE_TOKEN_PATTERN)

    def encode(self, text: str) -> list[str]:
        return self._rx.findall(text)


def _default_factory(encoding: str):
    def factory():
        import tiktoken

        return tiktoken.get_encoding(encoding)

    return factory


def exact_token_counts(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    encoding: str = DEFAULT_ENCODING,
    encoder_factory=None,
) -> DataFrame:
    """Add ``out_col`` = true tokenizer token count of ``text_col``.

    ``encoder_factory`` is the seam: a zero-arg callable returning an
    object with ``.encode(str) -> sequence``, built LAZILY once per
    worker (tokenizer construction loads vocab files — never per batch).
    Default requires tiktoken; raises loudly when absent rather than
    silently substituting the approximate count.
    """
    if encoder_factory is None:
        if not tiktoken_available():
            raise RuntimeError(
                "exact_token_counts needs tiktoken (or an injected "
                "encoder_factory); for the portable approximation use "
                "textstats.bpe_token_count / token_count"
            )
        encoder_factory = _default_factory(encoding)

    holder: list = []

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        if not holder:
            holder.append(encoder_factory())
        enc = holder[0]
        return texts.fillna("").map(lambda t: len(enc.encode(str(t))))

    return df.withColumn(out_col, _count(F.col(text_col)))
