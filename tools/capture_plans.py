"""Capture .explain('formatted') output for the queries touched in the
optimization round. Run from the repo root being captured:

    python tools/capture_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt. With no query list, captures the
default set of round-6-touched queries.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from llm_document_parser_spark.queries import REGISTRY  # noqa: E402
from llm_document_parser_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "curation_funnel",
    "doc_repetition_stats",
    "verified_near_dup_pairs",
    "minhash_near_dup_pairs",
    "near_dup_clusters",
    "doc_quality",
    "doc_lang_id",
    "exact_dup_groups",
    "winnow_overlap_pairs",
    "redirect_resolution",
    "host_trust_propagation",
    "bm25_relevance",
    "dup_span_removal",
    "decontaminate_docs",
    "hourly_event_counts",
]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(master="local[4]", app_name="capture-plans")
    for name in names:
        fn = REGISTRY.get(name)
        if fn is None:
            print(f"skip {name}: not in registry")
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
