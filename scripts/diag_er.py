#!/usr/bin/env python
"""Round-7 diagnostic: per-stage wall of the flagship ER pipeline at the
bench fixture (2000 entities, seed 42), fresh session, warm protocol.

Each stage is forced with a noop write (or the pipeline's own action),
labelled via setJobDescription.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soweego_spark.operators import blocking as blk  # noqa: E402
from soweego_spark.operators import classify as clf  # noqa: E402
from soweego_spark.operators import pairfeatures as pf  # noqa: E402
from soweego_spark.operators.cluster import assign_clusters  # noqa: E402
from soweego_spark.operators.extract import extract_signatures  # noqa: E402
from soweego_spark.plans.pipeline import PipelineConfig  # noqa: E402
from soweego_spark.session import get_spark  # noqa: E402
from soweego_spark.sources.pages import (  # noqa: E402
    generate_pages,
    pages_to_spark,
)

N = int(os.environ.get("ER_N", "2000"))
spark = get_spark(cpus=32, app_name="diag-er", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_once(tag: str, seed: int) -> None:
    spark.catalog.clearCache()
    fx = generate_pages(n_entities=N, seed=seed)
    pages, _, labeled, _ = pages_to_spark(spark, fx)
    closure = {
        r.code: list(r.related)
        for r in fx.occupation_closure.itertuples(index=False)
    }
    cfg = PipelineConfig(occupation_closure=closure)
    t_all = time.time()

    t0 = time.time()
    sig = extract_signatures(pages)
    sig.cache()
    noop(sig)
    print(f"{tag} extract+cache: {time.time()-t0:6.2f}", flush=True)

    t0 = time.time()
    pairs = blk.block_candidates(
        sig, top_k=cfg.top_k, token_df_cap=cfg.token_df_cap,
        use_lsh=cfg.use_lsh, use_url_key=cfg.use_url_key,
        lsh_rows_per_band=cfg.lsh_rows_per_band,
    )
    noop(pairs)
    print(f"{tag} block:         {time.time()-t0:6.2f}", flush=True)

    t0 = time.time()
    pair_rows = pf.assemble_pairs(pairs, sig, occupation_closure=closure)
    features = pf.compute_features(
        pair_rows, occupation_closure=closure, carry_rule_cols=True
    )
    features.cache()
    noop(features)
    print(f"{tag} featurize:     {time.time()-t0:6.2f}", flush=True)

    t0 = time.time()
    X, y = clf.collect_training_matrix(features, labeled)
    model = clf.train_logistic(X, y)
    print(f"{tag} train:         {time.time()-t0:6.2f}", flush=True)

    t0 = time.time()
    scored = clf.apply_rules(
        clf.score(features, model), pair_rows=None,
        name_rule=cfg.name_rule, url_rule=cfg.url_rule,
    )
    matches = clf.threshold_and_dedup(scored, threshold=cfg.threshold)
    matches.cache()
    noop(matches)
    print(f"{tag} score+match:   {time.time()-t0:6.2f}", flush=True)

    t0 = time.time()
    clusters = assign_clusters(sig.select("url"), matches)
    noop(clusters)
    print(f"{tag} cluster:       {time.time()-t0:6.2f}", flush=True)

    t0 = time.time()
    clf.confusion_and_f1(matches, labeled)
    print(f"{tag} metrics:       {time.time()-t0:6.2f}", flush=True)
    print(f"{tag} TOTAL:         {time.time()-t_all:6.2f}", flush=True)


run_once("warmup(seed7) ", 7)
run_once("measure(seed42)", 42)
spark.stop()
