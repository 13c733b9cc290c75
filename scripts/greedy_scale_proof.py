#!/usr/bin/env python
"""Adversarial-scale proof for the joins greedy path (round 6, VERDICT
r5 task 4): the r5 fix is hash-gated at sf0.01, but its memory claim —
"one shuffle partition of id pairs per task, no per-task graph" — is
demonstrated here AT VOLUME UNDER A CONSTRAINED HEAP, in a fresh
subprocess JVM per shape so the cap is real.

Shapes (each an over-cap SINGLE component):

* dense  — a 1.2M-edge star around vertex 0 plus a 0.3M-edge random
  blob wired into it (the templated-spam mega-cluster): greedy resolves
  it in a couple of wavefront rounds; the per-component pandas path
  would hold all 1.5M edges in ONE task's dict.
* chain  — an ascending N-vertex path: the round-pathological shape
  (longest dependency chain = N/2 rounds); measures the per-round
  driver floor directly.

Both run through dedup._greedy_component_drops with the cap BELOW the
component size (dense routes over-cap through CC + join rounds; chain
uses max_component_edges=0 to force pure joins) inside a subprocess
whose spark.driver.memory is the argument cap (default 2g — the dense
shape's 1.5M-edge pandas dict would not be the constraint there, the
point is the JOIN path never builds one). Correctness: drop sets are
compared against the sequential-greedy Python oracle.

Usage: python scripts/greedy_scale_proof.py [heap] [dense_leaves]
                                            [blob_edges] [chain_len]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, random, sys, time
sys.path.insert(0, {repo!r})
from soweego_spark.session import get_spark
from soweego_spark.operators import dedup

shape, heap = sys.argv[1], sys.argv[2]
spark = get_spark(cpus=8, app_name=f"greedy-proof-{{shape}}",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")

if shape == "dense":
    leaves, blob = int(sys.argv[3]), int(sys.argv[4])
    rng = random.Random(606)
    edges = [(i, 0) for i in range(1, leaves + 1)]
    for _ in range(blob):
        a, b = rng.randrange(1, leaves + 1), rng.randrange(1, leaves + 1)
        if a != b:
            edges.append((max(a, b), min(a, b)))
    cap = 1_000_000  # over-cap: routes through CC + join rounds
else:
    n = int(sys.argv[3])
    edges = [(i + 1, i) for i in range(n - 1)]
    cap = 0          # pure joins path

# python sequential-greedy oracle (ascending id order)
adj = {{}}
for a, b in edges:
    adj.setdefault(a, set()).add(b)
    adj.setdefault(b, set()).add(a)
kept, dropped = set(), set()
for v in sorted(adj):
    if adj[v] & kept:
        dropped.add(v)
    else:
        kept.add(v)

df = spark.createDataFrame(edges, "doc_id long, other_id long")
df.count()  # materialize input outside the timed window
t0 = time.time()
got = sorted(
    r["doc_id"]
    for r in dedup._greedy_component_drops(
        df, max_component_edges=cap
    ).collect()
)
wall = time.time() - t0
print("RESULT " + json.dumps(dict(
    shape=shape, heap=heap, edges=len(edges),
    rounds=dedup.LAST_JOINS_ROUNDS, wall_s=round(wall, 2),
    drops=len(got), correct=(got == sorted(dropped)),
    secs_per_round=round(wall / max(dedup.LAST_JOINS_ROUNDS, 1), 3),
)))
spark.stop()
"""


def run_shape(heap: str, shape: str, *args: str) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM=heap)
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), shape, heap,
         *args],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-3000:])


def main() -> None:
    heap = sys.argv[1] if len(sys.argv) > 1 else "2g"
    leaves = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
    blob = int(sys.argv[3]) if len(sys.argv) > 3 else 300_000
    chain = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    for res in (
        run_shape(heap, "dense", str(leaves), str(blob)),
        run_shape(heap, "chain", str(chain)),
    ):
        print(json.dumps(res))


if __name__ == "__main__":
    main()
