#!/usr/bin/env python
"""Replace-with-literal featurize ablation, round 2 (post-lev-short-
circuit): run the flagship with each feature column replaced by a
literal (SOWEEGO_ABLATE knob in compute_features — measurement-only, it
changes outputs by construction) to find the current top marginal cost.
Fresh JVM per run, variants interleaved, medians (house protocol).

Usage: python scripts/featurize_ablate.py [n_entities] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FEATURES = [
    "", "name_exact", "name_lev", "name_cos", "name_shared", "url_exact",
    "url_tok_shared", "born_sim", "died_sim", "desc_cos", "occ_shared",
    "genre_shared",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from soweego_spark.session import get_spark
from soweego_spark.sources.pages import generate_pages, pages_to_spark
from soweego_spark.plans.pipeline import run_pipeline, PipelineConfig

n_entities = int(sys.argv[1])
spark = get_spark(cpus=32, app_name="featurize-ablate",
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
closure_of = lambda fx: {{r.code: list(r.related)
                         for r in fx.occupation_closure.itertuples(index=False)}}
fx_w = generate_pages(n_entities=n_entities, seed=7)
pages, _, labeled, _ = pages_to_spark(spark, fx_w)
run_pipeline(spark, pages, labeled,
             PipelineConfig(occupation_closure=closure_of(fx_w))
             ).clusters.write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
fx = generate_pages(n_entities=n_entities, seed=42)
pages, _, labeled, _ = pages_to_spark(spark, fx)
t0 = time.time()
res = run_pipeline(spark, pages, labeled,
                   PipelineConfig(occupation_closure=closure_of(fx)))
res.clusters.write.format("noop").mode("overwrite").save()
print("RESULT " + json.dumps(dict(secs=round(time.time() - t0, 2))))
spark.stop()
"""


def run_child(n_entities: int, ablate: str) -> float:
    env = dict(os.environ, SOWEEGO_ABLATE=ablate)
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(n_entities)],
        capture_output=True, text=True, cwd=REPO, timeout=1800, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["secs"]
    raise RuntimeError(ablate + ":\n" + out.stderr[-2000:])


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    samples: dict[str, list[float]] = {f: [] for f in FEATURES}
    for _ in range(rounds):
        for f in FEATURES:  # interleaved across variants
            samples[f].append(run_child(n_entities, f))
            print(f"{f or 'baseline':>15}: {samples[f][-1]}", flush=True)
    base = statistics.median(samples[""])
    rows = {
        (f or "baseline"): {
            "median": statistics.median(samples[f]),
            "runs": samples[f],
            "saving_vs_baseline": round(
                base - statistics.median(samples[f]), 2
            ),
        }
        for f in FEATURES
    }
    print(json.dumps({"n_entities": n_entities, "rounds": rounds,
                      "rows": rows}))


if __name__ == "__main__":
    main()
