#!/usr/bin/env python
"""Fresh-JVM interleaved A/B for the driver-round-floor change in the
greedy/CC convergence loops (round 6): old = a git worktree at the
pre-change commit, new = this repo. House protocol: interleaved fresh
JVMs, warm (2nd in-JVM run with cache cleared), compare medians.

Usage: python scripts/loopfloor_ab.py <old_repo_dir> [runs_per_variant]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

NEW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import importlib.util, json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(repo, "__spark_entry__.py"))
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)
from soweego_spark.session import get_spark
spark = get_spark(cpus=32, app_name="loopfloor-ab", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
sf = "/root/testdata/sf0.1"
out = {}
for name in ("incremental_neardup_exact", "incremental_neardup_exact_full"):
    walls = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    out[name] = round(walls[-1], 2)  # warm value
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_child(repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, repo],
        capture_output=True, text=True, cwd=repo, timeout=1800,
        env=dict(os.environ),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    old = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    results: dict = {"old": [], "new": []}
    for i in range(runs):
        for label, repo in (("old", old), ("new", NEW)):
            r = run_child(repo)
            results[label].append(r)
            print(f"run {i} {label}: {r}", flush=True)
    for q in ("incremental_neardup_exact", "incremental_neardup_exact_full"):
        for label in ("old", "new"):
            vals = [r[q] for r in results[label]]
            print(f"{q} {label}: median {statistics.median(vals):.2f} "
                  f"runs {sorted(vals)}")


if __name__ == "__main__":
    main()
