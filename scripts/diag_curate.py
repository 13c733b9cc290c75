#!/usr/bin/env python
"""Round-7 diagnostic: per-stage wall of q_curate_pipeline (gate config).

Times each StageCheckpointer.stage call (write+readback+counts) and the
in-stage compute, so the optimization round knows whether the 28-50 s
curate wall is stage floor or operator compute.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as entry  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from soweego_spark.operators.dedup import md5_60  # noqa: E402
from soweego_spark.plans import checkpoint as ckpt_mod  # noqa: E402
from soweego_spark.plans.curate import CurateConfig, run_curate  # noqa: E402
from soweego_spark.session import get_spark  # noqa: E402

spark = get_spark(cpus=32, app_name="diag-curate", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

orig_stage = ckpt_mod.StageCheckpointer.stage
orig_save = ckpt_mod.StageCheckpointer.save


def timed_stage(self, name, config, compute):
    t0 = time.time()
    out = orig_stage(self, name, config, compute)
    print(f"  stage {name:10s}: {time.time() - t0:6.2f}s", flush=True)
    return out


def timed_save(self, stage, df, cfg_hash):
    t0 = time.time()
    out = orig_save(self, stage, df, cfg_hash)
    print(f"    save {stage:10s}: {time.time() - t0:6.2f}s", flush=True)
    return out


ckpt_mod.StageCheckpointer.stage = timed_stage
ckpt_mod.StageCheckpointer.save = timed_save

cfg = CurateConfig(
    gopher=True, lm=True,
    lm_slots=entry._LM_SLOTS, lm_max_oov_pct=entry._LM_MAX_OOV_PCT,
    lm_min_avg_num=entry._LM_MIN_AVG_NUM, lm_min_avg_den=entry._LM_MIN_AVG_DEN,
    lm_count_cap=entry._LM_COUNT_CAP,
    num_perm=32, bands=8, shingle_n=3, jaccard_threshold=0.7,
    within_batch="exact", tokenizer="whitespace",
    seq_len=entry._CUR_SEQ_LEN, n_shards=entry._CUR_SHARDS,
    hash_family="md5",
)


def docs_thunk():
    return entry._t(spark, SF_DIR, "documents").select("doc_id", "text")


def bench_thunk():
    slot = F.pmod(
        md5_60(F.concat(F.lit("bench:"), F.col("doc_id").cast("string"))),
        F.lit(entry._CUR_BENCH_SLOTS),
    )
    return (
        entry._t(spark, SF_DIR, "documents")
        .where(slot == 0).select("doc_id", "text")
    )


for run in range(2):
    td = tempfile.mkdtemp(prefix="diag_curate_")
    t0 = time.time()
    res = run_curate(spark, td, docs_thunk, cfg, bench_thunk=bench_thunk)
    print(f"run {run}: total {time.time() - t0:.2f}s  stages={res['stages']}",
          flush=True)
    import shutil
    shutil.rmtree(td, ignore_errors=True)
spark.stop()
