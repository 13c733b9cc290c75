#!/usr/bin/env python
"""Fresh-JVM interleaved A/B for featurize-stage changes (house protocol:
PERF.md/CLAUDE.md — never accept an in-session before/after).

Variant wiring: the child sets SOWEEGO_LEV_SHORTCIRCUIT=0/1; pairfeatures
reads it at expression-build time (round 6 — it was import-time before),
so the fresh-JVM child inherits it either way.

Usage: python scripts/featurize_ab.py [n_entities] [runs_per_variant]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from soweego_spark.session import get_spark
from soweego_spark.sources.pages import generate_pages, pages_to_spark
from soweego_spark.plans.pipeline import run_pipeline, PipelineConfig

n_entities = int(sys.argv[1])
spark = get_spark(cpus=32, app_name="featurize-ab", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
closure_of = lambda fx: {{r.code: list(r.related)
                         for r in fx.occupation_closure.itertuples(index=False)}}
# JVM warm-up on seed A, MEASURE on seed B (cache cleared) — warm
# protocol without cache replay
fx_warm = generate_pages(n_entities=n_entities, seed=7)
pages, _, labeled, _ = pages_to_spark(spark, fx_warm)
run_pipeline(spark, pages, labeled,
             PipelineConfig(occupation_closure=closure_of(fx_warm))
             ).clusters.write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
fx = generate_pages(n_entities=n_entities, seed=42)
pages, _, labeled, _ = pages_to_spark(spark, fx)
t0 = time.time()
res = run_pipeline(spark, pages, labeled,
                   PipelineConfig(occupation_closure=closure_of(fx)))
res.clusters.write.format("noop").mode("overwrite").save()
secs = time.time() - t0
print("RESULT " + json.dumps(dict(
    secs=round(secs, 2), f1=round(res.metrics["f1"], 4),
    pairs=res.features.count())))
spark.stop()
"""


def run_child(n_entities: int, variant: str) -> dict:
    env = dict(os.environ, SOWEEGO_LEV_SHORTCIRCUIT=variant)
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(n_entities)],
        capture_output=True, text=True, cwd=REPO, timeout=1800, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    samples = {"0": [], "1": []}
    results = {"0": [], "1": []}
    for _ in range(runs):
        for variant in ("0", "1"):  # interleaved
            r = run_child(n_entities, variant)
            samples[variant].append(r["secs"])
            results[variant].append(r)
    print(json.dumps({
        "n_entities": n_entities,
        "off_runs": samples["0"],
        "on_runs": samples["1"],
        "off_median": statistics.median(samples["0"]),
        "on_median": statistics.median(samples["1"]),
        "f1_off": results["0"][0]["f1"],
        "f1_on": results["1"][0]["f1"],
        "pairs": results["0"][0]["pairs"],
    }))


if __name__ == "__main__":
    main()
