"""Two-cluster-size scaling evidence (north_rule ≥0.8 efficiency N→4N).

No real cluster exists in this sandbox, so per driver instructions the same
extraction job runs at two local parallelism levels (local[N] and local[4N])
over the identical materialized pages table; efficiency =
(throughput_4N / throughput_N) / 4. Results are appended to
BENCH/BASELINE.md.

Each parallelism level runs in its OWN subprocess: a PySpark JVM persists
across SparkSession.stop(), so a second in-process session inherits the
first one's master/driver-memory and breaks the measurement (python-worker
broken pipes under heap pressure were the observable symptom).

Usage: python tools/scaling_bench.py [n_docs] [N] (default 16000 docs, N=8)
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys, time, json
sys.path.insert(0, {repo!r})
from llm_document_parser_spark.session import get_spark
from llm_document_parser_spark.pipeline import extract_pipeline

cores, pages_path, n_docs = {cores}, {pages_path!r}, {n_docs}
spark = get_spark(master=f"local[{{cores}}]", app_name=f"scale-{{cores}}")
# full untimed warm-up run: JIT, python-worker pool, page cache all hot —
# the timed run measures steady-state throughput
extract_pipeline(spark.read.parquet(pages_path), repartition_to=cores
    ).write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
extract_pipeline(spark.read.parquet(pages_path), repartition_to=cores
    ).write.format("noop").mode("overwrite").save()
secs = time.perf_counter() - t0
print(json.dumps({{"docs_per_sec": n_docs / secs, "seconds": secs}}))
spark.stop()
"""


def run_at(cores: int, pages_path: str, n_docs: int) -> float:
    script = _CHILD.format(repo=REPO, cores=cores, pages_path=pages_path, n_docs=n_docs)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, check=True
    )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)["docs_per_sec"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pages_path = os.path.join(REPO, ".data", f"scale_pages_{n_docs}")
    if not os.path.exists(pages_path):
        gen = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from llm_document_parser_spark.session import get_spark\n"
            "from llm_document_parser_spark.datagen import write_pages\n"
            "s = get_spark(master='local[{c}]', app_name='scale-gen')\n"
            "write_pages(s, {p!r}, {n}, seed=42, partitions={parts})\n"
            "s.stop()\n"
        ).format(repo=REPO, c=4 * n, p=pages_path, n=n_docs, parts=8 * n)
        subprocess.run([sys.executable, "-c", gen], check=True, capture_output=True)

    tp_n = run_at(n, pages_path, n_docs)
    tp_4n = run_at(4 * n, pages_path, n_docs)
    eff = (tp_4n / tp_n) / 4
    result = {
        "date": datetime.date.today().isoformat(),
        "n_docs": n_docs,
        "cores_N": n,
        "cores_4N": 4 * n,
        "docs_per_sec_N": round(tp_n, 1),
        "docs_per_sec_4N": round(tp_4n, 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    md = (
        f"\n| {result['date']} | {n_docs} | local[{n}] {result['docs_per_sec_N']}"
        f" docs/s | local[{4*n}] {result['docs_per_sec_4N']} docs/s"
        f" | {result['scaling_efficiency']} |"
    )
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(
                "# BENCH/BASELINE — measured extraction throughput + scaling\n\n"
                "Two-cluster-size criterion evidenced at two local parallelism\n"
                "levels on identical input (driver-sanctioned sandbox adaptation\n"
                "of the N vs 4N executor rule). Efficiency = (tp_4N / tp_N) / 4.\n"
                "Each level runs in its own subprocess (fresh JVM).\n\n"
                "| date | docs | N throughput | 4N throughput | efficiency |\n"
                "|---|---|---|---|---|"
            )
    with open(path, "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
