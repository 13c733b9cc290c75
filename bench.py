#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs (a) the flagship end-to-end ER pipeline (extract -> block -> featurize
-> train -> score -> rules -> threshold -> connected components) on the
deterministic synthetic pages table, and (b) the scale-meaningful operator
queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR.

Measurement protocol (round 4 — the house rule from CLAUDE.md): every
query and the flagship pipeline run TWICE in the same JVM and the
REPORTED per-query value is the second (warm) run. First-execution wall
on this shared box swings 3-30x on unchanged code (JIT/codegen warmup,
page cache, host noise) — round 3 burned a session adjudicating a 24%
phantom "regression" that was pure cold-run noise. The DataFrame cache is
cleared before every measured run, so "warm" means JVM/codegen-warm full
recompute, never a CacheManager replay of run 1's .cache() data (which
would hide regressions in the dominant stages). Warm values are
reproducible within ~1.5x run-to-run; the cold pass is still recorded
(``queries_cold`` / ``cold_wall_seconds``) so cross-round comparisons
against the pre-round-4 cold-only numbers stay possible.

Excluded from the timed set (not silently — by design):
  * token_blocking_topk / token_jaccard_neardup — deliberately quadratic
    demonstrations of the naive token self-join; at sf0.1 the 31-word
    vocabulary makes them ~450M intermediate pairs. Their scale path IS
    minhash_lsh_neardup / simhash_neardup, which are timed here.

Also reported: ``ann_recall_at_10`` — measured recall of the default IVF
config against exact brute force (the ANN quality gate; a fast index with
silently-wrong neighbors is not done). Quality numbers sit next to wall
numbers on purpose.

Plans are executed with a noop-format write so the full plan runs without
driver-side collection. Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_ER_ENTITIES (default 2000),
SPARK_GRAFT_BENCH_RUNS (default 2; 1 = legacy cold-only mode).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ER_ENTITIES = int(os.environ.get("SPARK_GRAFT_ER_ENTITIES", "2000"))
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
# fresh-JVM flagship runs (round 6): single in-JVM warm numbers whipsaw
# 1.3-1.5x run-to-run on this shared host (VERDICT r5 "What's wrong" #2);
# the cross-round headline is the MEDIAN of N fresh-JVM subprocesses,
# each JVM-warmed on seed 7 and measured on seed 42. 0 = skip.
FRESHJVM_RUNS = int(os.environ.get("SPARK_GRAFT_FRESHJVM_RUNS", "3"))

BENCH_QUERIES = [
    "minhash_lsh_neardup",
    "simhash_neardup",
    "exact_dedup",
    "embedding_topk",
    "embedding_neardup",
    "embedding_lsh_neardup",
    "embedding_ivf_topk",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "topk_per_key",
    "threshold_dedup",
    "set_validation",
    "relationship_join",
    "date_precision_match",
    "windowed_events",
    "group_collect",
    "anti_join_dead_ids",
    "union_dedup",
    "confusion_matrix",
    "domain_frequency",
    "perfect_name_join",
    "winnowing_neardup",
    "external_id_extraction",
    "bio_validation",
    "bio_dates_validation",
    "url_blacklist",
    "three_way_outer_join",
    "lang_id_ngram",
]

# queries added in round 3 — tracked separately so the suite wall stays
# comparable across rounds (the shared-subset wall is the regression
# signal; total wall grows whenever coverage grows)
ROUND3_QUERIES = [
    "pair_features",
    "logistic_score",
    "statement_plan",
    "gopher_quality",
    "pii_scrub",
    "sessionize",
    "cluster_metrics",
    "incremental_neardup",
    "mnm_entries",
    "identifier_actions",
]
ROUND4_QUERIES = [
    "incremental_neardup_exact",
    "imdb_person_flavor",
    "musicbrainz_artist_flavor",
    "discogs_master_flavor",
    "discogs_artist_flavor",
    "musicbrainz_links_flavor",
]
ROUND5_QUERIES = [
    # exact-mode dedup at the 64/16 operator defaults, forced through
    # the distributed local-minima join rounds (the r5 scale path)
    "incremental_neardup_exact_full",
]
ROUND6_QUERIES = [
    # ExactSubstr cut pass: gram-count shuffle + span windows + the
    # rewrite join — the corpus-curation headline
    "substring_dedup_cut",
    # sequence packing: one shard Exchange + per-shard window cumsum
    "pack_sequences",
    # learned tokenizer: distributed word-count + type-table merge fold
    # + token join-back (operators/bpe.py)
    "bpe_encode",
    # CCNet-style n-gram LM quality pass: ref-slice model + two hash
    # joins + integer decision (operators/lmfilter.py)
    "lm_filter",
    # the composed curation line: quality -> dedup -> decontam -> pack
    # (plans/curate.py; the engine behind jobs/curate_job.py)
    "curate_pipeline",
]
BENCH_QUERIES = (
    BENCH_QUERIES
    + ROUND3_QUERIES
    + ROUND4_QUERIES
    + ROUND5_QUERIES
    + ROUND6_QUERIES
)


def _run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entry_mod
    from soweego_spark.plans.pipeline import PipelineConfig, run_pipeline
    from soweego_spark.session import get_spark
    from soweego_spark.sources.pages import generate_pages, pages_to_spark

    spark = get_spark(
        cpus=CPUS, app_name="soweego-spark-bench", shuffle_partitions=2 * CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    qs = entry_mod.queries()
    for name in BENCH_QUERIES:
        for run in range(N_RUNS):
            # Warm must mean "JVM/codegen warm", NOT "cached": a repeated
            # plan-identical query is served from run 1's .cache() by the
            # CacheManager and measures nothing (the PERF.md §16 trap).
            # Clearing the DataFrame cache each run keeps every measured
            # run a full recompute.
            spark.catalog.clearCache()
            t0 = time.time()
            _run_noop(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            if run == 0:
                cold[name] = dt
            warm[name] = dt  # last run wins; == cold when N_RUNS == 1

    # Flagship: full record-linkage pipeline over the synthetic pages table.
    fx = generate_pages(n_entities=ER_ENTITIES, seed=42)
    pages, _, labeled, _ = pages_to_spark(spark, fx)
    closure = {
        r.code: list(r.related)
        for r in fx.occupation_closure.itertuples(index=False)
    }
    n_pairs, n_docs, er_f1 = 0, 0, 0.0
    for run in range(N_RUNS):
        spark.catalog.clearCache()  # same no-cache-replay rule as above
        t0 = time.time()
        res = run_pipeline(
            spark, pages, labeled, PipelineConfig(occupation_closure=closure)
        )
        n_pairs = res.features.count()
        _run_noop(res.clusters)
        dt = time.time() - t0
        er_f1 = res.metrics["f1"]
        n_docs = res.signatures.count()
        if run == 0:
            cold["er_pipeline"] = dt
        warm["er_pipeline"] = dt
    er_secs = warm["er_pipeline"]

    # ANN quality gate: recall@10 of the default IVF config vs brute force
    # on the same embeddings table (worst-case uniform-random vectors).
    from pyspark.sql import functions as F

    from soweego_spark.operators.ann import ivf_recall_at_k

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ann_recall = ivf_recall_at_k(emb, emb.filter(F.col("vec_id") < 50), k=10)

    # Golden-sample parity (round 5): 5-fold NB/LR over the reference's
    # OWN frozen IMDb fixtures through the real linker path
    # (plans/golden.py). Published full-data anchors (docs/evaluations.
    # rst:78-87): NB F1 director .932, musician .924, producer .918,
    # writer .935 (actor: TODO in the reference). The 2,467-person sample
    # target is a much easier negative pool than full IMDb, so sample
    # scores sit ABOVE those anchors — quality numbers, not wall numbers.
    golden_eval = {}
    try:
        from soweego_spark.plans import golden as golden_mod

        if os.path.isdir(golden_mod.SAMPLES_DIR):
            t0 = time.time()
            for prof in golden_mod.PROFESSIONS:
                r = golden_mod.evaluate_golden(
                    spark, prof, classifiers=["naive_bayes", "logistic"]
                )
                golden_eval[prof] = {
                    "pairs": r["pairs"],
                    "positives": r["positives"],
                    "nb_f1": round(r["naive_bayes"]["f1"], 4),
                    "nb_f1_std": round(r["naive_bayes"]["f1_std"], 4),
                    "lr_f1": round(r["logistic"]["f1"], 4),
                }
            golden_eval["wall_seconds"] = round(time.time() - t0, 2)
    except Exception as exc:  # pragma: no cover — samples dir optional
        golden_eval = {"error": str(exc)[:200]}

    # Ingestion-loop throughput (round 6): the production per-batch loop
    # behind jobs/ingest_job.py — per batch exact dedup -> near-dup vs
    # the persisted corpus band table -> fold survivors into checkpointed
    # state — over the documents table split into 3 deterministic
    # batches. A FRESH state dir per run (manifest memoization would
    # otherwise turn run 2 into pure parquet reads); warm = last run.
    import shutil
    import tempfile

    from soweego_spark.plans.ingest_loop import (
        IngestConfig,
        run_ingest_loop,
        split_batches,
    )

    ingest_stats: dict = {}
    for run in range(N_RUNS):
        spark.catalog.clearCache()
        td = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            res = run_ingest_loop(
                spark, td,
                split_batches(spark, f"{SF_DIR}/documents.parquet", 3),
                IngestConfig(),
            )
            ingest_stats = res.as_dict()
        finally:
            shutil.rmtree(td, ignore_errors=True)

    total = sum(warm.values())
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = (
            {
                "metric": "suite_wall_seconds",
                "value": round(total, 2),
                "protocol": f"warm (run {N_RUNS} of {N_RUNS} per query, one JVM)",
                "cold_wall_seconds": round(sum(cold.values()), 2),
                "shared_r2_wall_seconds": round(
                    sum(v for k, v in warm.items()
                        if k not in ROUND3_QUERIES
                        and k not in ROUND4_QUERIES
                        and k not in ROUND5_QUERIES
                        and k not in ROUND6_QUERIES), 2
                ),
                "shared_r2_wall_cold_seconds": round(
                    sum(v for k, v in cold.items()
                        if k not in ROUND3_QUERIES
                        and k not in ROUND4_QUERIES
                        and k not in ROUND5_QUERIES
                        and k not in ROUND6_QUERIES), 2
                ),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in warm.items()},
                "queries_cold": {k: round(v, 3) for k, v in cold.items()},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "er_pairs_scored": n_pairs,
                "er_pairs_scored_per_sec": round(n_pairs / er_secs, 1),
                # docs/sec is the scale-meaningful throughput: round 4's
                # blocking selectivity change needs 3x fewer candidate
                # pairs for the same linking quality, so pairs/sec DROPS
                # while the lake drains faster (PERF.md section 16)
                "er_docs": n_docs,
                "er_docs_per_sec": round(n_docs / er_secs, 1),
                "er_f1": round(er_f1, 4),
                "ann_recall_at_10": round(ann_recall, 4),
                "golden_imdb_5fold": golden_eval,
                "ingest_loop": ingest_stats,
                "cpus": CPUS,
            }
    )
    spark.stop()

    # Fresh-JVM flagship medians (round 6, VERDICT r5 "What's wrong" #2):
    # run AFTER spark.stop() so each child owns the box. The median of
    # fresh JVMs is the number cross-round comparisons should use; the
    # in-JVM warm value above stays for continuity with r1-r5.
    if FRESHJVM_RUNS > 0:
        payload["er_pipeline_freshjvm"] = _freshjvm_flagship(FRESHJVM_RUNS)

    print(json.dumps(payload))


_FRESHJVM_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from soweego_spark.session import get_spark
from soweego_spark.sources.pages import generate_pages, pages_to_spark
from soweego_spark.plans.pipeline import run_pipeline, PipelineConfig

spark = get_spark(cpus={cpus}, app_name="bench-freshjvm",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
closure_of = lambda fx: {{r.code: list(r.related)
                         for r in fx.occupation_closure.itertuples(index=False)}}
# JVM warm-up on seed 7, MEASURE on seed 42 (house warm protocol)
fx_w = generate_pages(n_entities={n}, seed=7)
pages, _, labeled, _ = pages_to_spark(spark, fx_w)
run_pipeline(spark, pages, labeled,
             PipelineConfig(occupation_closure=closure_of(fx_w))
             ).clusters.write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
fx = generate_pages(n_entities={n}, seed=42)
pages, _, labeled, _ = pages_to_spark(spark, fx)
t0 = time.time()
res = run_pipeline(spark, pages, labeled,
                   PipelineConfig(occupation_closure=closure_of(fx)))
res.clusters.write.format("noop").mode("overwrite").save()
print("RESULT " + json.dumps({{"secs": round(time.time() - t0, 2)}}))
spark.stop()
"""


def _freshjvm_flagship(runs: int) -> dict:
    import statistics
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    code = _FRESHJVM_CHILD.format(
        repo=repo, cpus=CPUS, parts=2 * CPUS, n=ER_ENTITIES
    )
    walls = []
    for _ in range(runs):
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd=repo, timeout=1800,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                walls.append(json.loads(line[len("RESULT "):])["secs"])
                break
        else:
            return {"error": (out.stdout + out.stderr)[-500:]}
    return {
        "median": round(statistics.median(walls), 2),
        "runs": walls,
        "protocol": "fresh JVM per run; warm-up seed 7, measured seed 42",
    }


if __name__ == "__main__":
    main()
