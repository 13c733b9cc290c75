#!/usr/bin/env python
"""Round-7 measurement harness (bench.py is FROZEN — this file holds the
extra instrumentation the optimization round needs).

Modes:

  python bench_extra.py warm  q1 q2 ...   # one JVM, N warm runs per query
  python bench_extra.py fresh q1 q2 ...   # fresh JVM per (query, run),
                                          # variants interleaved round-robin
  python bench_extra.py plan  q1 q2 ...   # print explain("formatted")

The warm protocol matches bench.py exactly (clearCache before every
measured run, noop sink) so warm numbers here predict the driver's
numbers. The fresh protocol is the CLAUDE.md house rule for A/Bs on this
shared host: fresh-JVM subprocesses, interleaved, compare medians.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), BENCH_EXTRA_RUNS (default 3).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))


def _spark():
    from soweego_spark.session import get_spark

    spark = get_spark(
        cpus=CPUS, app_name="bench-extra", shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def warm(names: list[str]) -> None:
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        runs = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(f"{name}: runs={runs} min={min(runs)}", flush=True)
    print("JSON " + json.dumps(out))


_FRESH_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_SF_DIR", {sf!r})
import __spark_entry__ as entry
from soweego_spark.session import get_spark
spark = get_spark(cpus={cpus}, app_name="bench-extra-fresh",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
qs = entry.queries()
# warm-up run (JVM/codegen), then the measured run — house protocol
qs[{name!r}](spark, {sf!r}).write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
t0 = time.time()
qs[{name!r}](spark, {sf!r}).write.format("noop").mode("overwrite").save()
print("RESULT " + json.dumps({{"secs": round(time.time() - t0, 3)}}))
spark.stop()
"""


def fresh(names: list[str]) -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    walls: dict[str, list[float]] = {n: [] for n in names}
    for r in range(RUNS):
        for name in names:  # interleave variants each round
            code = _FRESH_CHILD.format(
                repo=repo, sf=SF_DIR, cpus=CPUS, parts=2 * CPUS, name=name
            )
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, cwd=repo, timeout=1800,
            )
            got = None
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    got = json.loads(line[len("RESULT "):])["secs"]
            if got is None:
                print(f"{name} run {r}: FAILED\n{out.stderr[-2000:]}")
                continue
            walls[name].append(got)
            print(f"{name} run {r}: {got}", flush=True)
    for name in names:
        w = walls[name]
        if w:
            print(
                f"{name}: median={statistics.median(w):.2f} runs={w}",
                flush=True,
            )
    print("JSON " + json.dumps(walls))


def plan(names: list[str]) -> None:
    import __spark_entry__ as entry

    spark = _spark()
    qs = entry.queries()
    for name in names:
        print(f"===== {name} =====")
        qs[name](spark, SF_DIR).explain("formatted")


if __name__ == "__main__":
    mode, names = sys.argv[1], sys.argv[2:]
    {"warm": warm, "fresh": fresh, "plan": plan}[mode](names)
