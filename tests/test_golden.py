"""Golden-sample parity: the reference's frozen IMDb fixtures through the
real linker path (plans/golden.py).

These tests read the read-only reference sample files directly — they are
the only inputs the reference itself shipped, so they double as the
quality-parity evidence the published scores (docs/evaluations.rst:78-87)
rest on. Skipped wholesale if the samples are absent.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from soweego_spark.plans import golden

pytestmark = pytest.mark.skipif(
    not os.path.isdir(golden.SAMPLES_DIR),
    reason="reference samples not available",
)


def test_repair_imdb_people(spark):
    people = golden.repair_imdb_people(spark, golden.SAMPLES_DIR)
    rows = people.collect()
    # every data row of the mangled TSV reassembles (2467 of 2467)
    assert len(rows) == 2467
    by_id = {r["nconst"]: r for r in rows}
    assert len(by_id) == 2467  # nconst unique
    # spot checks against the raw file: multi-token name, quoted alias,
    # null years, layout-B (profession column missing entirely)
    r = by_id["nm0000016"]
    assert r["primaryName"] == "Georges Delerue"
    assert r["birthYear"] == "1925" and r["deathYear"] == "1992"
    assert r["primaryProfession"] == "composer,soundtrack,music_department"
    r = by_id["nm0889764"]
    assert r["primaryName"] == "Enrique Vargas 'El Príncipe Gitano'"
    r = by_id["nm0590761"]  # layout B: no profession field
    assert r["primaryProfession"] is None
    assert r["birthYear"] is None and r["deathYear"] is None
    assert r["knownForTitles"].startswith("tt0317002")


def test_wikidata_preprocess_shapes(spark):
    wd = golden.preprocess_wikidata_golden(
        golden.read_wikidata_set(spark, golden.SAMPLES_DIR, "director")
    )
    rows = wd.collect()
    assert len(rows) == 500
    by_qid = {r["qid"]: r for r in rows}
    # Giacomo Cimini (first line of the file): single name value,
    # full-precision birth date, one occupation QID
    r = by_qid["Q5557873"]
    assert r["tid_positive"] == "nm1480867"
    assert r["name"] == ["giacomo cimini"]
    assert r["name_tokens"] == ["cimini", "giacomo"]
    assert [v.asDict() for v in r["born_p"]] == [
        {"y": 1977, "mo": 2, "d": 8, "h": 0, "mi": 0, "s": 0, "depth": 2}
    ]
    assert r["occupations"] == ["Q2526255"]
    assert r["name_bigrams"] is not None and r["name_bigram_norm"] > 0


@pytest.mark.slow
def test_golden_five_fold_parity(spark):
    """The round's parity claim: 5-fold NB on the reference's own frozen
    data. The sample target catalog is 2,467 people (vs full IMDb's
    ~10M), so the negative pool is much easier and scores land ABOVE the
    published full-data anchors (reference NB F1 .918-.935); the bound
    asserts we at least clear those anchors on identical inputs."""
    for prof in ["director", "musician"]:
        res = golden.evaluate_golden(
            spark, prof, classifiers=["naive_bayes", "logistic"]
        )
        # blocking keeps a meaningful candidate set and most positives
        assert 500 <= res["pairs"] <= 3000, res
        assert res["positives"] >= 300, res
        for c in ["naive_bayes", "logistic"]:
            assert res[c]["f1"] >= 0.95, (prof, c, res[c])
            assert res[c]["precision"] >= 0.95, (prof, c, res[c])
            assert res[c]["recall"] >= 0.90, (prof, c, res[c])


def test_golden_labels_join(spark):
    ds = golden.build_golden_training_set(spark, "director")
    agg = ds.agg(
        F.count("*").alias("n"),
        F.sum("label").alias("pos"),
        F.countDistinct("qid").alias("qids"),
    ).first()
    # every pair is labeled, positives are a strict, substantial subset
    assert agg["n"] > agg["pos"] > 300
    assert agg["qids"] <= 500
    # a pair is positive iff the target id is the wd-declared one
    pos_rows = ds.filter("label = 1").select("qid", "tid").collect()
    wd = {
        r["qid"]: r["tid_positive"]
        for r in golden.preprocess_wikidata_golden(
            golden.read_wikidata_set(spark, golden.SAMPLES_DIR, "director")
        ).collect()
    }
    assert all(wd[r["qid"]] == r["tid"] for r in pos_rows)


@pytest.mark.slow
def test_link_golden_flow(spark):
    """The link flow end to end on the golden fixtures.

    Training-goal run (the items whose true person IS in the sample
    target — an in-sample flow check): predictions recover the declared
    (qid, tid) links with high precision and recall. Classification-goal
    run (items genuinely lacking the IMDb PID, whose people are mostly
    ABSENT from the 2,467-person sample target): the classifier + name
    rule reject nearly every blocked candidate — a near-empty,
    structurally valid prediction set is the correct output."""
    preds = golden.link_golden(spark, "director", goal="training").cache()
    rows = preds.collect()
    assert len({(r["qid"], r["tid"]) for r in rows}) == len(rows)
    assert all(0.5 <= r["score"] <= 1.0 for r in rows)
    truth = {
        r["qid"]: r["tid_positive"]
        for r in golden.preprocess_wikidata_golden(
            golden.read_wikidata_set(spark, golden.SAMPLES_DIR, "director")
        ).collect()
        if r["tid_positive"] is not None
    }
    hits = sum(1 for r in rows if truth.get(r["qid"]) == r["tid"])
    assert hits / len(rows) >= 0.9          # precision vs declared links
    assert hits >= 0.75 * len(truth)        # recall incl. blocking misses

    # the full-names rule holds on every emitted prediction
    wd = golden.preprocess_wikidata_golden(
        golden.read_wikidata_set(spark, golden.SAMPLES_DIR, "director")
    )
    tgt = golden.golden_target(spark, golden.SAMPLES_DIR, "director")
    joined = (
        preds.join(wd.select("qid", "all_names"), "qid")
        .join(tgt.select("tid", F.col("name").alias("t_names")), "tid")
        .select(F.arrays_overlap("all_names", "t_names").alias("ok"))
        .collect()
    )
    assert all(r["ok"] for r in joined)

    cls = golden.link_golden(spark, "director").collect()
    assert len(cls) <= 10  # counterparts absent from the sample target
    assert all(0.5 <= r["score"] <= 1.0 for r in cls)


def test_golden_blocking_no_rank_misses(spark):
    """Round-6 decomposition gate (PERF.md §26): among positives whose
    tid IS in the profession target table AND shares >=1 name token with
    its own target row, the IDF top-5 blocking must retrieve ALL of them
    (rank misses == 0) — i.e. recall losses are membership/script facts
    about the data, never ranking regressions. Two professions keep the
    runtime bounded; the full five-way table is in PERF.md §26."""
    for prof in ("director", "musician"):
        wd = golden.preprocess_wikidata_golden(
            golden.read_wikidata_set(spark, golden.SAMPLES_DIR, prof)
        ).cache()
        tgt = golden.golden_target(spark, golden.SAMPLES_DIR, prof).cache()
        try:
            pos = wd.filter(F.col("tid_positive").isNotNull()).select(
                "qid", F.col("tid_positive").alias("tid")
            )
            present = pos.join(
                tgt.select("tid").distinct(), "tid", "left_semi"
            )
            wtoks = wd.select("qid", F.explode("name_tokens").alias("token"))
            ttoks = tgt.select("tid", F.explode("name_tokens").alias("token"))
            achievable = (
                present.join(wtoks, "qid")
                .join(ttoks, ["tid", "token"], "left_semi")
                .select("qid", "tid")
                .distinct()
            )
            pairs = golden.block_golden(wd, tgt, top_k=5)
            rank_misses = achievable.join(
                pairs, ["qid", "tid"], "left_anti"
            ).count()
            assert rank_misses == 0, prof
            n_present = present.count()
            retrieved = present.join(
                pairs, ["qid", "tid"], "left_semi"
            ).count()
            assert retrieved / n_present >= 0.98, (prof, retrieved, n_present)
        finally:
            wd.unpersist()
            tgt.unpersist()
