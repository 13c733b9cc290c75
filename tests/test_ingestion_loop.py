"""Continuous-ingestion composition: the production loop for a
training-data pipeline — per batch, exact dedup against the persisted
seen-key table, then MinHash near-dedup against the persisted corpus band
table, then fold ONLY the surviving docs back into both state tables —
chained across three batches with every state table going through
StageCheckpointer, and a mid-run restart proving the loop resumes its
state from parquet.

The incremental operators and checkpoint resume are each tested on their
own elsewhere; THIS file tests their composition, which is what actually
runs in production.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 — parity with siblings

from soweego_spark.operators.dedup import (
    band_keys,
    content_keys,
    incremental_exact_dedup,
    incremental_minhash_neardup,
    minhash_signatures,
    shingles,
)
from soweego_spark.plans.checkpoint import StageCheckpointer

NUM_PERM, BANDS = 32, 8
_WORDS = [f"w{i:03d}" for i in range(120)]


def _doc(start: int, n: int = 12) -> str:
    return " ".join(_WORDS[(start + j) % len(_WORDS)] for j in range(n))


def _batches(spark):
    """Three deterministic batches: 8 distinct docs each (12-word windows
    at stride 3 — adjacent windows share 9 words but only 7/13 shingles,
    J≈0.54 < 0.7, so no accidental near-dups), plus planted exact dups
    (within batch and across batches) and near-dups (same window + one
    word, 10/11 shared shingles, J≈0.91)."""

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b1 = df(
        [(100 + i, _doc(3 * i)) for i in range(8)]
        + [(180, _doc(0)), (181, _doc(0))]  # exact dups of 100
    )
    b2 = df(
        [(200 + i, _doc(3 * i + 40)) for i in range(8)]
        + [(280, _doc(3))]              # exact dup of batch-1 doc 101
        + [(281, _doc(6) + " extra")]   # near-dup of batch-1 doc 102
    )
    b3 = df(
        [(300 + i, _doc(3 * i + 80)) for i in range(8)]
        + [(380, _doc(43))]             # exact dup of batch-2 doc 201
        + [(381, _doc(46) + " tail")]   # near-dup of batch-2 doc 202
    )
    return [b1, b2, b3]


def _load_state(ckpt: StageCheckpointer, stage: str):
    """Reload a state stage from its manifest (the manifest's recorded
    config hash is authoritative for an append-log state table)."""
    mf = ckpt.manifest(stage)
    return None if mf is None else ckpt.load(stage, mf["config_hash"])


def _run_loop(spark, root, batches, restart_before=None):
    """The ingestion loop. ``restart_before`` simulates a kill+resume:
    before that (1-based) batch, the checkpointer object is discarded, a
    fresh one is built over the same directory, and all loop state is
    reloaded from the on-disk manifests."""
    ckpt = StageCheckpointer(root, spark)
    kept_ids: list[list[int]] = []
    seen_keys = None
    corpus_toks = None
    corpus_bands = None

    def state_cfg(i):
        return {"batch": i, "num_perm": NUM_PERM, "bands": BANDS}

    for i, batch in enumerate(batches, 1):
        if restart_before == i:
            spark.catalog.clearCache()
            ckpt = StageCheckpointer(root, spark)
            seen_keys = _load_state(ckpt, f"seen_b{i-1}")
            corpus_toks = _load_state(ckpt, f"toks_b{i-1}")
            corpus_bands = _load_state(ckpt, f"bands_b{i-1}")

        exact_kept, _ = incremental_exact_dedup(batch, seen_keys)
        toks = shingles(exact_kept, n=3)
        if corpus_toks is None:
            corpus_arg = spark.createDataFrame(
                [], "doc_id long, tokens array<string>"
            )
            kept = incremental_minhash_neardup(
                toks, corpus_arg, num_perm=NUM_PERM, bands=BANDS,
                within_batch="conservative",
            )
        else:
            kept = incremental_minhash_neardup(
                toks, corpus_toks, num_perm=NUM_PERM, bands=BANDS,
                corpus_banded=corpus_bands, within_batch="conservative",
            )
        kept_docs = exact_kept.join(
            kept.select("doc_id"), "doc_id", "left_semi"
        )
        kept_toks = toks.join(kept.select("doc_id"), "doc_id", "left_semi")
        new_bands = band_keys(
            minhash_signatures(kept_toks, num_perm=NUM_PERM),
            num_perm=NUM_PERM, bands=BANDS,
        )
        # fold ONLY the survivors' state forward, checkpointed per batch
        new_keys = content_keys(kept_docs)
        seen_keys = ckpt.stage(
            f"seen_b{i}", state_cfg(i),
            lambda sk=seen_keys, nk=new_keys: (
                nk if sk is None else sk.unionByName(nk).distinct()
            ),
        )
        corpus_toks = ckpt.stage(
            f"toks_b{i}", state_cfg(i),
            lambda ct=corpus_toks, kt=kept_toks: (
                kt if ct is None else ct.unionByName(kt)
            ),
        )
        corpus_bands = ckpt.stage(
            f"bands_b{i}", state_cfg(i),
            lambda cb=corpus_bands, nb=new_bands: (
                nb if cb is None else cb.unionByName(nb)
            ),
        )
        kept_ids.append(sorted(r["doc_id"] for r in kept_docs.collect()))
    return (
        kept_ids,
        corpus_bands.count(),
        corpus_toks.count(),
        seen_keys.count(),
    )


def test_ingestion_loop_three_batches(spark, tmp_path):
    kept, n_bands, n_docs, n_keys = _run_loop(
        spark, tmp_path / "a", _batches(spark)
    )
    # batch 1: the two exact dups of 100 collapse (first id wins)
    assert kept[0] == [100 + i for i in range(8)]
    # batch 2: cross-batch exact dup (280) and near-dup (281) both drop
    assert kept[1] == [200 + i for i in range(8)]
    # batch 3: same against batch-2 state
    assert kept[2] == [300 + i for i in range(8)]
    # state hygiene: the seen-key/token/band tables hold EXACTLY the
    # survivors — dropped docs never contaminate state; band-table
    # growth == kept docs x bands
    total_kept = sum(len(k) for k in kept)
    assert n_docs == total_kept == n_keys == 24
    assert n_bands == total_kept * BANDS


def test_ingestion_loop_resumes_identically(spark, tmp_path):
    """Kill-and-resume between batches 2 and 3: per-batch outputs and
    final state sizes identical with and without the restart."""
    batches = _batches(spark)
    out_a = _run_loop(spark, tmp_path / "x", batches)
    out_b = _run_loop(spark, tmp_path / "y", batches, restart_before=3)
    assert out_a == out_b
    # and the restarted root's manifests are complete: a THIRD pass over
    # the same root loads every stage without recomputing (stage() is
    # manifest-hit for all three batches -> same result)
    out_c = _run_loop(spark, tmp_path / "y", batches)
    assert out_c == out_b


def test_band_table_bucketed_probe_exchange_free(spark, tmp_path):
    """Production guidance made verifiable: persist the corpus band table
    BUCKETED on the probe key (band_id, band_hash) via StageCheckpointer
    — the incremental near-dup band probe then plans with exactly ONE
    Exchange (the small new-batch side); the corpus table, the big side
    that grows forever, is read shuffle-free. The operator consumes the
    bucketed table unchanged through ``corpus_banded``."""
    spec = {
        "bands": {
            "bucket_cols": ["band_id", "band_hash"], "n_buckets": 8,
        }
    }
    corpus_docs = spark.createDataFrame(
        [(i, _doc(3 * i)) for i in range(20)], "doc_id long, text string"
    )
    corpus_toks = shingles(corpus_docs, n=3)
    bands = band_keys(
        minhash_signatures(corpus_toks, num_perm=NUM_PERM),
        num_perm=NUM_PERM, bands=BANDS,
    )
    ckpt = StageCheckpointer(tmp_path / "b", spark, bucket_specs=spec)
    stored = ckpt.stage("bands", {"v": 1}, lambda: bands)

    new_docs = spark.createDataFrame(
        [(100, _doc(0) + " extra"), (101, _doc(60))],
        "doc_id long, text string",
    )
    new_toks = shingles(new_docs, n=3)
    new_banded = band_keys(
        minhash_signatures(new_toks, num_perm=NUM_PERM),
        num_perm=NUM_PERM, bands=BANDS,
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = new_banded.join(stored, ["band_id", "band_hash"])
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # exactly ONE band-key Exchange (the new-batch side; the batch's
        # own signature aggregation shuffles on doc_id and is unrelated),
        # and the corpus scan is bucketed
        assert plan.count("Exchange hashpartitioning(band_") == 1, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    kept = incremental_minhash_neardup(
        new_toks, corpus_toks, num_perm=NUM_PERM, bands=BANDS,
        corpus_banded=stored, within_batch="conservative",
    )
    # doc 100 is a near-dup of corpus doc 0; doc 101 is fresh
    assert sorted(r["doc_id"] for r in kept.collect()) == [101]
