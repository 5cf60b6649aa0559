"""Adjudicate the round-4 `curation_funnel` bench swing (20.7s -> 97.4s).

The catalog query body is unchanged between tag c3256ea (round 3) and HEAD
(git diff shows docstring-only), yet BENCH_r04 read 97.4s vs BENCH_r03's
20.7s. Round-4's BENCH/BASELINE.md note mis-attributed the swing to the
decontamination/token-budget gates, which were added to jobs/curate_job.py
-- a module the bench does not time. This probe settles the question the
way the extract adjudication did: interleaved fresh-JVM legs of HEAD vs the
round-3 tag on the SAME quiet window, with /proc/loadavg before and after
each leg.

Usage: python tools/funnel_probe.py [trials] [cores]
       (default 3 trials per code version, 32 cores, sf0.1)

Appends per-leg rows to .data/funnel_legs.jsonl immediately (loss-proof),
prints a summary JSON line at the end.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_SHA = "c3256ea"
OLD_WT = os.path.join(REPO, ".data", "wt_" + OLD_SHA)

_CHILD = """
import sys, time, json, os
sys.path.insert(0, {codepath!r})
cores = {cores}
# lazy heap — this host supplies first-touch pages at ~40-70 MB/s, so a
# pre-touched 64 GB heap costs 15-25 min of startup per fresh-JVM leg
# (the very pathology that sank the first version of this probe); the
# untimed warm-up run commits every page the timed run needs
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "16g"
from llm_document_parser_spark.session import get_spark
from llm_document_parser_spark.queries import REGISTRY

spark = get_spark(master=f"local[{{cores}}]", app_name="funnel-probe")
sf_dir = {sf_dir!r}
fn = REGISTRY["curation_funnel"]
# untimed warm-up: JIT, python worker pool, parquet footer + page cache
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
print(json.dumps({{"secs": time.perf_counter() - t0}}))
spark.stop()
"""


def _loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def _ensure_worktree() -> None:
    if os.path.exists(os.path.join(OLD_WT, "llm_document_parser_spark")):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", OLD_WT, OLD_SHA],
        cwd=REPO,
        check=True,
        capture_output=True,
    )


def run_leg(codepath: str, label: str, cores: int, sf_dir: str) -> float:
    script = _CHILD.format(codepath=codepath, cores=cores, sf_dir=sf_dir)
    load_before = _loadavg()
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        check=True,
        timeout=1800,
    )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    secs = json.loads(last)["secs"]
    row = {
        "ts": datetime.datetime.now().isoformat(timespec="seconds"),
        "code": label,
        "cores": cores,
        "secs": round(secs, 2),
        "loadavg_before": load_before,
        "loadavg_after": _loadavg(),
    }
    with open(os.path.join(REPO, ".data", "funnel_legs.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    return secs


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_worktree()
    head_times, old_times = [], []
    for _ in range(trials):
        head_times.append(run_leg(REPO, "HEAD", cores, sf_dir))
        old_times.append(run_leg(OLD_WT, OLD_SHA, cores, sf_dir))
        time.sleep(2)
    print(
        json.dumps(
            {
                "head_min": round(min(head_times), 2),
                "old_min": round(min(old_times), 2),
                "head_all": [round(t, 2) for t in head_times],
                "old_all": [round(t, 2) for t in old_times],
                "ratio_head_over_old": round(min(head_times) / min(old_times), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
