"""jobs/ingest_job.py — the production ingestion loop as a spark-submit
job: semantics vs the handwritten composition (test_ingestion_loop.py),
the bucketed band-table probe plan THROUGH the composed loop's written
state, and a real spark-submit kill-and-resume."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from soweego_spark.operators.dedup import (
    band_keys,
    minhash_signatures,
    shingles,
)
from soweego_spark.plans.checkpoint import StageCheckpointer
from soweego_spark.plans.ingest_loop import (
    IngestConfig,
    run_ingest_loop,
    split_batches,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NUM_PERM, BANDS = 32, 8
_WORDS = [f"w{i:03d}" for i in range(120)]


def _doc(start: int, n: int = 12) -> str:
    # same corpus shape as test_ingestion_loop: 12-word windows at stride
    # 3 share 9 words but only 7/13 shingles (J≈0.54 < 0.7) — no
    # accidental near-dups; +1 word = J≈0.91 planted near-dup
    return " ".join(_WORDS[(start + j) % len(_WORDS)] for j in range(n))


def _write_documents(spark, path: str) -> dict[int, list[int]]:
    """One documents table whose doc_id%3 classes are the job's batches.
    Returns expected kept ids per (1-based) batch."""
    rows = [(i, _doc(3 * i)) for i in range(24)]
    rows.append((24, _doc(3 * 1)))          # batch1; exact text of id 1
    rows.append((25, _doc(3 * 2) + " xx"))  # batch2; near-dup of id 2
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)
    return {
        # batch 1 = class 0: all distinct -> all kept (incl. 24)
        1: sorted([0, 3, 6, 9, 12, 15, 18, 21, 24]),
        # batch 2 = class 1: id 1 is an exact dup of 24's text (seen)
        2: sorted([4, 7, 10, 13, 16, 19, 22, 25]),
        # batch 3 = class 2: id 2 is a near-dup of 25 (J≈0.91)
        3: sorted([5, 8, 11, 14, 17, 20, 23]),
    }


def _cfg(**kw) -> IngestConfig:
    return IngestConfig(num_perm=NUM_PERM, bands=BANDS, shingle_n=3, **kw)


def _kept_ids(spark, root, i: int) -> list[int]:
    ckpt = StageCheckpointer(root, spark)
    mf = ckpt.manifest(f"kept_b{i}")
    df = ckpt.load(f"kept_b{i}", mf["config_hash"])
    return sorted(r["doc_id"] for r in df.collect())


def test_ingest_loop_module_semantics(spark, tmp_path):
    """run_ingest_loop drops exact dups and near-dups across batches and
    folds only survivors into state (the handwritten composition's
    invariants, through the production module)."""
    docs = str(tmp_path / "docs")
    expected = _write_documents(spark, docs)
    batches = split_batches(spark, docs, 3)
    res = run_ingest_loop(spark, tmp_path / "state", batches, _cfg())
    for i in (1, 2, 3):
        assert _kept_ids(spark, tmp_path / "state", i) == expected[i], i
    assert res.total_in == 26
    assert res.total_kept == 24
    # state hygiene: band rows == kept docs x bands; seen == kept docs
    ckpt = StageCheckpointer(tmp_path / "state", spark)
    bands = ckpt.load("bands_b3", ckpt.manifest("bands_b3")["config_hash"])
    seen = ckpt.load("seen_b3", ckpt.manifest("seen_b3")["config_hash"])
    assert bands.count() == 24 * BANDS
    assert seen.count() == 24


def test_ingest_loop_resume_is_idempotent(spark, tmp_path):
    """Kill after 2 batches (max_batches=2) then rerun the full loop over
    the same root: outputs identical to an uninterrupted run, and the
    completed stages are NOT rewritten (parquet mtimes unchanged)."""
    docs = str(tmp_path / "docs")
    expected = _write_documents(spark, docs)
    batches = split_batches(spark, docs, 3)

    run_ingest_loop(spark, tmp_path / "s", batches, _cfg(), max_batches=2)
    kept1 = tmp_path / "s" / "kept_b1"
    mtimes = {p.name: p.stat().st_mtime for p in kept1.glob("*.parquet")}
    res = run_ingest_loop(spark, tmp_path / "s", batches, _cfg())
    for i in (1, 2, 3):
        assert _kept_ids(spark, tmp_path / "s", i) == expected[i], i
    assert res.total_kept == 24
    assert {
        p.name: p.stat().st_mtime for p in kept1.glob("*.parquet")
    } == mtimes, "resume rewrote a completed stage"


def test_ingest_loop_probe_exchange_free_through_job_state(spark, tmp_path):
    """The production guidance, asserted THROUGH the composed loop: the
    band state the loop persists (bucketed on the probe key) lets the
    NEXT batch's band probe plan with exactly one Exchange — the small
    new-batch side; the ever-growing corpus side is read shuffle-free."""
    docs = str(tmp_path / "docs")
    _write_documents(spark, docs)
    run_ingest_loop(
        spark, tmp_path / "state", split_batches(spark, docs, 3),
        _cfg(band_buckets=8),
    )
    ckpt = StageCheckpointer(
        tmp_path / "state", spark,
        bucket_specs={"bands_b3": {
            "bucket_cols": ["band_id", "band_hash"], "n_buckets": 8}},
    )
    corpus_bands = ckpt.load(
        "bands_b3", ckpt.manifest("bands_b3")["config_hash"]
    )
    next_batch = spark.createDataFrame(
        [(100, _doc(0) + " zz"), (101, _doc(60))],
        "doc_id long, text string",
    )
    new_banded = band_keys(
        minhash_signatures(shingles(next_batch, n=3), num_perm=NUM_PERM),
        num_perm=NUM_PERM, bands=BANDS,
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = new_banded.join(corpus_bands, ["band_id", "band_hash"])
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning(band_") == 1, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def _spark_submit(argv: list[str], cwd: str) -> dict:
    exe = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.abspath(sys.executable)), "spark-submit"
    )
    out = subprocess.run(
        [exe, "--master", "local[8]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false", *argv],
        capture_output=True, text=True, cwd=cwd, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    for line in out.stdout.splitlines():
        if line.startswith('{"metric": "ingest_loop"'):
            return json.loads(line)
    raise AssertionError("no metric line:\n" + out.stdout[-3000:])


@pytest.mark.slow
def test_ingest_job_spark_submit_kill_and_resume(spark, tmp_path):
    """The documented production shape end-to-end: zip the package, run
    jobs/ingest_job.py under spark-submit --py-files, kill after batch 2
    (--max-batches 2), resume by RERUNNING THE SAME COMMAND, and compare
    against an uninterrupted run."""
    docs = str(tmp_path / "docs")
    _write_documents(spark, docs)
    zip_base = str(tmp_path / "soweego_spark")
    shutil.make_archive(zip_base, "zip", REPO, "soweego_spark")
    common = [
        "--py-files", zip_base + ".zip",
        os.path.join(REPO, "jobs", "ingest_job.py"),
        "--input", docs, "--n-batches", "3",
        "--num-perm", str(NUM_PERM), "--bands", str(BANDS),
    ]

    # uninterrupted reference run
    full = _spark_submit(
        common + ["--state", str(tmp_path / "sa"),
                  "--output", str(tmp_path / "outa")],
        cwd=str(tmp_path),
    )
    assert full["total_kept"] == 24

    # killed run + same-command resume
    part = _spark_submit(
        common + ["--state", str(tmp_path / "sb"), "--max-batches", "2"],
        cwd=str(tmp_path),
    )
    assert [b["batch"] for b in part["batches"]] == [1, 2]
    resumed = _spark_submit(
        common + ["--state", str(tmp_path / "sb"),
                  "--output", str(tmp_path / "outb")],
        cwd=str(tmp_path),
    )
    assert resumed["total_kept"] == full["total_kept"] == 24

    ids_a = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "outa")).collect()
    )
    ids_b = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "outb")).collect()
    )
    assert ids_a == ids_b and len(ids_a) == 24
