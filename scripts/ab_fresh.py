#!/usr/bin/env python
"""Interleaved fresh-JVM A/B between two repo roots (the CLAUDE.md house
measurement rule). Usage:

  python scripts/ab_fresh.py ROOT_A ROOT_B q1 q2 ...

Per round, runs each (root, query) pair in a fresh subprocess JVM
(warm-up run + measured run inside each child), alternating roots so
host-load drift hits both variants equally. Prints per-query medians.
Env: AB_ROUNDS (default 3), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import __spark_entry__ as entry
from soweego_spark.session import get_spark
spark = get_spark(cpus={cpus}, app_name="ab-fresh",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
qs[{name!r}](spark, {sf!r}).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
t0 = time.time()
qs[{name!r}](spark, {sf!r}).write.format("noop").mode("overwrite").save()
print("RESULT " + json.dumps({{"secs": round(time.time() - t0, 3)}}))
spark.stop()
"""


def run_one(root: str, name: str) -> float | None:
    code = CHILD.format(root=root, cpus=CPUS, parts=2 * CPUS,
                        name=name, sf=SF_DIR)
    env = dict(os.environ)
    env["PYTHONPATH"] = root
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=root, timeout=1800, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["secs"]
    print(out.stderr[-2000:])
    return None


def main() -> None:
    root_a, root_b, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    walls: dict[tuple[str, str], list[float]] = {}
    for r in range(ROUNDS):
        for name in names:
            # alternate within-pair order per round: the first child of a
            # pair warms the OS page cache for the second, a systematic
            # bias if one variant always runs first
            order = (("A", root_a), ("B", root_b))
            if r % 2 == 1:
                order = order[::-1]
            for tag, root in order:
                got = run_one(root, name)
                if got is not None:
                    walls.setdefault((name, tag), []).append(got)
                print(f"round {r} {name} {tag}: {got}", flush=True)
    for name in names:
        a = walls.get((name, "A"), [])
        b = walls.get((name, "B"), [])
        ma = statistics.median(a) if a else None
        mb = statistics.median(b) if b else None
        print(f"{name}: A(median)={ma} runs={a}  B(median)={mb} runs={b}")


if __name__ == "__main__":
    main()
