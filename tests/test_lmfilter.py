"""N-gram LM quality filter semantics (operators/lmfilter.py): model
counting, per-doc sufficient statistics, winsorization, the rational
keep decision's edge cases, the float log-prob convenience vs a Python
replay, and partitioning invariance / plan shape.

The driver gates (`lm_doc_stats` / `lm_filter`) hash-check the integer
statistics and decision against DuckDB on the synthetic documents table;
these tests carry the semantics on planted shapes the gate data can't
pin: exact hand-computed counts, cap boundaries, and threshold equalities.
"""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from soweego_spark.operators.lmfilter import (
    gram_prefix_occurrences,
    lm_counts,
    lm_doc_stats,
    lm_filter,
    lm_log_prob,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stats(spark, ref_rows, score_rows, **kw):
    ref = _mk(spark, ref_rows)
    model = lm_counts(ref, n=2)
    return {
        r["doc_id"]: r
        for r in lm_doc_stats(_mk(spark, score_rows), model, n=2, **kw).collect()
    }


def test_model_counts_both_orders(spark):
    """lm_counts holds order-n and order-(n-1) counts in one table; a
    Python recount of bigrams + unigrams matches exactly."""
    ref = _mk(spark, [(1, "a b a b"), (2, "b c")])
    got_total = {r["c"] for r in lm_counts(ref, n=2).collect()}
    rows = lm_counts(ref, n=2).collect()
    # unigrams: a x2, b x3, c x1; bigrams: 'a b' x2, 'b a' x1, 'b c' x1
    assert sorted(r["c"] for r in rows) == [1, 1, 1, 2, 2, 3]
    assert got_total == {1, 2, 3}


def test_doc_stats_hand_computed(spark):
    """Exact integer stats on a corpus small enough to verify by hand."""
    out = _stats(
        spark,
        [(1, "the cat sat"), (2, "the cat ran")],
        [(10, "the cat sat"), (11, "the dog sat"), (12, "zz")],
    )
    # model: unigrams the:2 cat:2 sat:1 ran:1; bigrams 'the cat':2,
    # 'cat sat':1, 'cat ran':1
    r = out[10]  # grams: 'the cat' (c=2), 'cat sat' (c=1)
    assert (r["n_tokens"], r["n_grams"], r["n_oov"], r["n_ctx_oov"]) == (3, 2, 0, 0)
    assert (r["sum_c_gram"], r["sum_c_prefix"]) == (3, 4)  # prefixes the:2 cat:2
    r = out[11]  # 'the dog' OOV, 'dog sat' OOV; contexts the:2, dog OOV
    assert (r["n_grams"], r["n_oov"], r["n_ctx_oov"]) == (2, 2, 1)
    assert (r["sum_c_gram"], r["sum_c_prefix"]) == (0, 2)
    r = out[12]  # single word -> no bigram positions
    assert (r["n_tokens"], r["n_grams"], r["n_oov"], r["sum_c_gram"]) == (1, 0, 0, 0)


def test_every_scored_doc_gets_a_row(spark):
    out = _stats(spark, [(1, "a b")], [(10, ""), (11, "x"), (12, "a b")])
    assert set(out) == {10, 11, 12}
    assert out[10]["n_tokens"] == 0 and out[10]["n_grams"] == 0


def test_winsorization_cap(spark):
    """Model counts clamp at count_cap before summing, bounding every
    downstream int64 at n_grams * cap."""
    ref = [(i, "hot hot") for i in range(10)]  # 'hot' unigram count 20
    out = _stats(spark, ref, [(99, "hot hot")], count_cap=3)
    r = out[99]
    assert r["sum_c_gram"] == 3  # bigram 'hot hot' c=10 -> capped 3
    assert r["sum_c_prefix"] == 3  # unigram c=20 -> capped 3


def test_filter_thresholds_edge_exact(spark):
    """The keep decision is exact rational arithmetic: equality sits on
    the keep side for both the OOV-rate and mean-count tests."""
    ref = _mk(spark, [(1, "a b a b a b")])  # 'a b' c=3, 'b a' c=2
    model = lm_counts(ref, n=2)
    docs = _mk(
        spark,
        [
            (10, "a b"),  # 1 gram, 0 oov, sum 3 -> keep
            (11, "zz qq"),  # 1 gram, 1 oov (100% > 30%) -> drop
            (12, "zz"),  # 0 grams -> drop
        ],
    )
    got = {
        r["doc_id"]: r["keep"]
        for r in lm_filter(docs, model, n=2, max_oov_pct=30).collect()
    }
    assert got == {10: True, 11: False, 12: False}
    # oov-rate equality: 3 oov of 10 grams == 30% exactly -> keep side
    eleven = "a b a b a b a b z y x"  # grams: 'a b'x4 'b a'x3 + 'b z','z y','y x'
    got = {
        r["doc_id"]: (r["keep"], r["n_grams"], r["n_oov"])
        for r in lm_filter(
            _mk(spark, [(20, eleven)]),
            model,
            n=2,
            max_oov_pct=30,
            min_avg_count_num=1,
        ).collect()
    }
    keep, n_grams, n_oov = got[20]
    assert (n_grams, n_oov) == (10, 3)
    assert keep is True  # 3*100 <= 10*30 exactly; mean 18/10 >= 1
    # one more OOV tips it: 4 of 11 > 30% -> drop
    got = {
        r["doc_id"]: r["keep"]
        for r in lm_filter(
            _mk(spark, [(21, eleven + " ww")]),
            model,
            n=2,
            max_oov_pct=30,
            min_avg_count_num=1,
        ).collect()
    }
    assert got[21] is False
    # mean-count equality: num/den = 18/10 kept, 19/10 dropped
    for num, want in ((18, True), (19, False)):
        got = {
            r["doc_id"]: r["keep"]
            for r in lm_filter(
                _mk(spark, [(30, eleven)]),
                model,
                n=2,
                max_oov_pct=30,
                min_avg_count_num=num,
                min_avg_count_den=10,
            ).collect()
        }
        assert got[30] is want, num


def test_log_prob_matches_python_replay(spark):
    """Add-one smoothed log-prob equals the Python replay (approx — float
    convenience column, deliberately not hash-gated)."""
    rng = random.Random(3)
    vocab = ["a", "b", "c", "dd", "ee"]
    ref_rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8))))
        for i in range(12)
    ]
    score_rows = [
        (100 + i, " ".join(rng.choice(vocab + ["zz"]) for _ in range(rng.randint(2, 8))))
        for i in range(8)
    ]
    ref = _mk(spark, ref_rows)
    model = lm_counts(ref, n=2)
    # python model
    uni: dict = {}
    bi: dict = {}
    for _, t in ref_rows:
        ws = [w for w in t.lower().split(" ") if w]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    V = len(uni)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_prob"], r["ppl"])
        for r in lm_log_prob(_mk(spark, score_rows), model, vocab_size=V).collect()
    }
    for doc_id, t in score_rows:
        ws = [w for w in t.lower().split(" ") if w]
        lp = sum(
            math.log((bi.get((a, b), 0) + 1) / (uni.get(a, 0) + V))
            for a, b in zip(ws, ws[1:])
        )
        n = len(ws) - 1
        assert got[doc_id][0] == n
        assert got[doc_id][1] == pytest.approx(lp, rel=1e-12)
        assert got[doc_id][2] == pytest.approx(math.exp(-lp / n), rel=1e-12)


def test_per_group_models_are_isolated(spark):
    """group_col trains one independent model per group via hash
    namespacing: a phrase common in group A's reference contributes
    NOTHING to a group-B doc's statistics, and the same doc set scored
    without grouping sees the cross-group counts."""
    rows = [
        (1, "the cat sat", "en"),
        (2, "the cat sat", "en"),
        (10, "the cat sat", "de"),  # same words, different group
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = lm_counts(docs, n=2, group_col="lang")
    got = {
        r["doc_id"]: (r["n_oov"], r["sum_c_gram"])
        for r in lm_doc_stats(docs, model, n=2, group_col="lang").collect()
    }
    # en: each bigram counted twice (docs 1+2); de: its own model of one doc
    assert got[1] == (0, 4) and got[2] == (0, 4)
    assert got[10] == (0, 2)
    # ungrouped: all three docs share one model -> counts of 3 per bigram
    flat = lm_counts(docs, n=2)
    gotf = {
        r["doc_id"]: (r["n_oov"], r["sum_c_gram"])
        for r in lm_doc_stats(docs, flat, n=2).collect()
    }
    assert gotf[1] == (0, 6) and gotf[10] == (0, 6)
    # a de doc with en-only phrases is fully OOV under grouping
    probe = spark.createDataFrame(
        [(99, "the cat sat", "fr")], "doc_id long, text string, lang string"
    )
    gp = {
        r["doc_id"]: r["n_oov"]
        for r in lm_doc_stats(probe, model, n=2, group_col="lang").collect()
    }
    assert gp[99] == 2  # no fr reference -> everything OOV


def test_group_null_coalesces_to_empty(spark):
    """NULL group values namespace as '' (matching the oracle's
    coalesce(lang, ''))."""
    docs = spark.createDataFrame(
        [(1, "a b", None), (2, "a b", "")],
        "doc_id long, text string, lang string",
    )
    model = lm_counts(docs, n=2, group_col="lang")
    got = {
        r["doc_id"]: r["sum_c_gram"]
        for r in lm_doc_stats(docs, model, n=2, group_col="lang").collect()
    }
    # NULL and '' share one namespace: bigram 'a b' has count 2 for both
    assert got[1] == 2 and got[2] == 2


def test_partitioning_invariance(spark):
    rows = [(i, f"w{i % 4} common w{i % 3} common") for i in range(40)]
    ref = _mk(spark, rows[:15])
    docs = _mk(spark, rows[15:])
    model = lm_counts(ref, n=2)
    a = sorted(map(tuple, lm_doc_stats(docs, model).collect()))
    b = sorted(
        map(
            tuple,
            lm_doc_stats(docs.repartition(13), lm_counts(ref.repartition(7), n=2)).collect(),
        )
    )
    assert a == b


def test_plan_stays_jvm_side(spark):
    docs = _mk(spark, [(1, "a b c"), (2, "b c d")])
    model = lm_counts(docs, n=2)
    plan = (
        lm_filter(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
