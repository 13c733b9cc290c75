"""plans/curate.py + jobs/curate_job.py — the end-to-end curation
pipeline: per-stage drop semantics on a planted corpus (one doc engineered
to fall at each stage), checkpointed resume idempotence, and a real
spark-submit kill-and-resume of the job CLI.

The cross-engine evidence lives in the ``curate_pipeline`` driver gate
(__spark_entry__.py): the full six-stage line replayed in DuckDB down to
the final segment map. These tests carry the stage-attribution semantics
the gate's single output can't show.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from soweego_spark.operators.dedup import md5_60_py
from soweego_spark.plans.curate import CurateConfig, load_stage, run_curate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORDS = [f"w{i:03d}" for i in range(120)]


def _win(start: int, n: int = 12) -> str:
    # 12-word windows at stride 3 (the ingest-job corpus shape): stride
    # neighbors share 9 words but far fewer shingles -> no accidental
    # near-dups at J >= 0.7
    return " ".join(_WORDS[(start + j) % len(_WORDS)] for j in range(n))


# every main doc carries the " ka kb" anchor pair, so with the weak
# mean-count threshold (num=1, den=1000) the LM keep test reduces to
# "has at least one model gram" — deterministic as long as at least one
# main doc lands in the lmref slot-0 slice (asserted in _corpus)
_CFG_KW = dict(
    lm_min_avg_num=1,
    lm_min_avg_den=1000,
    lm_max_oov_pct=100,
    num_perm=32,
    bands=8,
    shingle_n=3,
    jaccard_threshold=0.7,
    within_batch="exact",
    tokenizer="whitespace",
    seq_len=16,
    n_shards=4,
)

MAIN_IDS = list(range(20))
ID_EXACT, ID_NEAR, ID_GOPHER, ID_LM, ID_CONTAM = 100, 101, 102, 103, 104


def _corpus(spark):
    """Planted corpus: 20 clean mains + one doc falling at each stage.

    Returns (docs_df, bench_df, expected_final_ids)."""
    rows = [(i, _win(3 * i) + " ka kb") for i in MAIN_IDS]
    rows.append((ID_EXACT, _win(3 * 1) + " ka kb"))        # == main 1's text
    rows.append((ID_NEAR, _win(3 * 2) + " ka kb xx"))      # J~0.86 vs main 2
    rows.append((ID_GOPHER, "x x x x x x"))                # distinct ratio
    rows.append((ID_LM, "qq ww ee rr tt yy"))              # zero model grams
    e_words = " ".join(f"e{j:02d}" for j in range(12))
    rows.append((ID_CONTAM, e_words + " ka kb"))           # bench 8-gram hit
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9000, " ".join(f"e{j:02d}" for j in range(10)))],
        "doc_id long, text string",
    )
    slot0 = [
        i for i in MAIN_IDS if md5_60_py(f"lmref:{i}") % 5 == 0
    ]
    assert slot0, "corpus must place at least one main doc in lm slot 0"
    return docs, bench, sorted(MAIN_IDS)


def test_stage_attribution(spark, tmp_path):
    """Each planted doc falls at exactly its intended stage."""
    docs, bench, finals = _corpus(spark)
    res = run_curate(
        spark, tmp_path / "s", lambda: docs, CurateConfig(**_CFG_KW),
        bench_thunk=lambda: bench,
    )
    stages = {s["stage"]: s["rows"] for s in res["stages"]}
    # quality: gopher drops ID_GOPHER, lm drops ID_LM -> 23 of 25 remain
    assert stages["quality"] == 23
    q_ids = sorted(
        r["doc_id"]
        for r in load_stage(spark, tmp_path / "s", "quality").collect()
    )
    assert ID_GOPHER not in q_ids and ID_LM not in q_ids
    # exact: ID_EXACT (same text as main 1, larger id) drops
    assert stages["exact"] == 22
    # neardup: ID_NEAR (J~0.86 vs main 2) drops; greedy keeps main 2
    assert stages["neardup"] == 21
    n_ids = sorted(
        r["doc_id"]
        for r in load_stage(spark, tmp_path / "s", "neardup").collect()
    )
    assert ID_NEAR not in n_ids and 2 in n_ids
    # decontam: ID_CONTAM shares 8-grams with the bench doc
    assert stages["decontam"] == 20
    d_ids = sorted(
        r["doc_id"]
        for r in load_stage(spark, tmp_path / "s", "decontam").collect()
    )
    assert d_ids == finals
    # counts: one row per survivor; pack: segment map conservation
    assert stages["counts"] == 20
    segs = load_stage(spark, tmp_path / "s", "pack").collect()
    total_tokens = sum(r["seg_len"] for r in segs)
    assert total_tokens == 20 * 14  # every survivor has 12 + 2 words
    by_seq: dict = {}
    for r in segs:
        key = (r["shard"], r["seq_no"])
        by_seq[key] = by_seq.get(key, 0) + r["seg_len"]
    assert all(v <= 16 for v in by_seq.values())
    # every shard's non-final sequences are exactly full
    shards = {r["shard"] for r in segs}
    for sh in shards:
        seqs = sorted(k[1] for k in by_seq if k[0] == sh)
        for s in seqs[:-1]:
            assert by_seq[(sh, s)] == 16, (sh, s)


def test_resume_is_idempotent(spark, tmp_path):
    """Kill after 2 stages, rerun the full pipeline over the same root:
    identical final output, completed stages not rewritten."""
    docs, bench, _ = _corpus(spark)
    cfg = CurateConfig(**_CFG_KW)
    part = run_curate(
        spark, tmp_path / "s", lambda: docs, cfg,
        bench_thunk=lambda: bench, max_stages=2,
    )
    assert part["completed_stages"] == 2
    qdir = tmp_path / "s" / "quality"
    mtimes = {p.name: p.stat().st_mtime for p in qdir.glob("*.parquet")}
    run_curate(
        spark, tmp_path / "s", lambda: docs, cfg, bench_thunk=lambda: bench
    )
    assert {
        p.name: p.stat().st_mtime for p in qdir.glob("*.parquet")
    } == mtimes, "resume rewrote a completed stage"
    # reference uninterrupted run in a fresh root
    run_curate(
        spark, tmp_path / "r", lambda: docs, cfg, bench_thunk=lambda: bench
    )
    a = sorted(map(tuple, load_stage(spark, tmp_path / "s", "pack").collect()))
    b = sorted(map(tuple, load_stage(spark, tmp_path / "r", "pack").collect()))
    assert a == b and len(a) > 0


def test_config_change_recomputes(spark, tmp_path):
    """A changed parameter changes the stage config hash chain — the
    pipeline recomputes instead of resuming stale state."""
    docs, bench, _ = _corpus(spark)
    run_curate(
        spark, tmp_path / "s", lambda: docs, CurateConfig(**_CFG_KW),
        bench_thunk=lambda: bench,
    )
    res2 = run_curate(
        spark, tmp_path / "s", lambda: docs,
        CurateConfig(**{**_CFG_KW, "seq_len": 8}),
        bench_thunk=lambda: bench,
    )
    segs = load_stage(spark, tmp_path / "s", "pack").collect()
    assert max(r["seg_len"] for r in segs) <= 8
    assert res2["completed_stages"] == 6


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
        if line.startswith('{"metric": "curate_pipeline"'):
            return json.loads(line)
    raise AssertionError("no metric line:\n" + out.stdout[-3000:])


@pytest.mark.slow
def test_curate_job_spark_submit_kill_and_resume(spark, tmp_path):
    """The documented production shape end-to-end: zip the package, run
    jobs/curate_job.py under spark-submit --py-files, kill after 2 stages
    (--max-stages 2), resume by RERUNNING THE SAME COMMAND, compare the
    packed segment map against an uninterrupted run."""
    docs, bench, _ = _corpus(spark)
    docs_p, bench_p = str(tmp_path / "docs"), str(tmp_path / "bench")
    docs.write.mode("overwrite").parquet(docs_p)
    bench.write.mode("overwrite").parquet(bench_p)
    zip_base = str(tmp_path / "soweego_spark")
    shutil.make_archive(zip_base, "zip", REPO, "soweego_spark")
    common = [
        "--py-files", zip_base + ".zip",
        os.path.join(REPO, "jobs", "curate_job.py"),
        "--input", docs_p, "--bench", bench_p,
        "--no-lm", "--seq-len", "16", "--n-shards", "4",
        "--num-perm", "32", "--bands", "8",
    ]

    full = _spark_submit(
        common + ["--state", str(tmp_path / "sa"),
                  "--output", str(tmp_path / "outa")],
        cwd=str(tmp_path),
    )
    assert [s["stage"] for s in full["stages"]] == [
        "quality", "exact", "neardup", "decontam", "counts", "pack"
    ]
    # with --no-lm the all-OOV doc survives: 21 finals
    assert dict((s["stage"], s["rows"]) for s in full["stages"])[
        "decontam"
    ] == 21

    part = _spark_submit(
        common + ["--state", str(tmp_path / "sb"), "--max-stages", "2"],
        cwd=str(tmp_path),
    )
    assert part["completed_stages"] == 2
    resumed = _spark_submit(
        common + ["--state", str(tmp_path / "sb"),
                  "--output", str(tmp_path / "outb")],
        cwd=str(tmp_path),
    )
    assert resumed["completed_stages"] == 6
    a = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "outa")).collect())
    )
    b = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "outb")).collect())
    )
    assert a == b and len(a) > 0
