"""K-fold evaluation harness (reference linker/evaluate.py as DataFrame math).

Folds are assigned by a deterministic hash of the pair key (no RNG state to
ship to executors; the reference uses seeded StratifiedKFold, seeds 610/1269
— a pinned hash split is the order-invariant Spark equivalent). Per fold:
train on the rest, predict the held-out fold, union predictions across folds
(evaluate.py:379-382), then P/R/F1 over the full labeled set.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soweego_spark.operators import classify as clf
from soweego_spark.operators.pairfeatures import FEATURE_COLUMNS


def pairwise_cluster_metrics(
    assign: DataFrame,
    truth: DataFrame,
    id_col: str = "url",
    labeled_only: bool = False,
) -> DataFrame:
    """Pairwise precision/recall/F1 of a clustering vs ground truth WITHOUT
    materializing pairs: with contingency counts n_ct = |cluster c ∩ truth
    t|, TP = Σ C(n_ct,2), predicted = Σ C(n_c,2), actual = Σ C(n_t,2) —
    three aggregations over the assignment join, O(rows) not O(pairs²).
    At 10^12 docs the pair sets are astronomically large; the sufficient
    statistics never are.

    Denominator contract — the two modes differ when the id sets of
    ``assign`` and ``truth`` only partially overlap:

    * ``labeled_only=False`` (default): predicted_pairs counts ALL
      assignment pairs and actual_pairs ALL truth pairs. Pairs involving
      an id absent from the other frame can never be TP, so precision and
      recall are penalized by unlabeled/unassigned ids. This is the
      full-assignment grading of the north rule's cluster output (an
      unassigned labeled doc IS a recall failure of the pipeline).
    * ``labeled_only=True``: both frames are first restricted to ids
      present in BOTH (a semi-join each way), so P/R/F1 are computed over
      the labeled index only — the reference's evaluation convention
      (linker/evaluate.py scores only indexed labeled pairs).

    Integer arithmetic throughout (C(n,2) = n*(n-1)/2 exact in int64 up
    to n ~ 4.3e9 members per cell), three final divisions — so the output
    is engine-exact. Returns ONE row: (tp_pairs, predicted_pairs,
    actual_pairs, precision, recall, f1).
    """
    a = assign.select(F.col(id_col).alias("id"), "cluster_id")
    t = truth.select(F.col(id_col).alias("id"), "entity_id")
    if labeled_only:
        a = a.join(t.select("id"), "id", "left_semi")
        t = t.join(assign.select(F.col(id_col).alias("id")), "id", "left_semi")
    j = a.join(t, "id")

    def pairs2(cnt):
        # C(n,2) without materializing n*(n-1): halve the EVEN factor
        # FIRST, because ANSI mode throws on int64 overflow and
        # n*(n-1) overflows at n ≈ 3.04e9 while C(n,2) itself is
        # representable to n ≈ 4.29e9 (CLAUDE.md: mask/split before
        # multiply). A double `/2` would also lose exactness past 2^53.
        return F.when(
            cnt % 2 == 0, F.shiftright(cnt, 1) * (cnt - F.lit(1))
        ).otherwise(cnt * F.shiftright(cnt - F.lit(1), 1))

    tp = (
        j.groupBy("cluster_id", "entity_id")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(pairs2(F.col("n"))), F.lit(0)).alias("tp"))
    )
    pred = (
        a.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(pairs2(F.col("n"))), F.lit(0)).alias("pred"))
    )
    act = (
        t.groupBy("entity_id")
        .agg(F.count("*").alias("n"))
        .agg(F.coalesce(F.sum(pairs2(F.col("n"))), F.lit(0)).alias("act"))
    )
    row = tp.crossJoin(pred).crossJoin(act)  # three 1-row frames
    p = F.when(F.col("pred") > 0, F.col("tp") / F.col("pred")).otherwise(
        F.lit(0.0)
    )
    r = F.when(F.col("act") > 0, F.col("tp") / F.col("act")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        F.lit(2.0)
        * F.col("precision")
        * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return (
        row.select(
            F.col("tp").alias("tp_pairs"),
            F.col("pred").alias("predicted_pairs"),
            F.col("act").alias("actual_pairs"),
            p.alias("precision"),
            r.alias("recall"),
        )
        .withColumn("f1", f1)
    )


def with_fold(labeled: DataFrame, k: int = 5) -> DataFrame:
    return labeled.withColumn(
        "fold", F.pmod(F.hash("url_a", "url_b"), F.lit(k))
    )


def kfold_scores(
    features: DataFrame,
    labeled: DataFrame,
    k: int = 5,
    trainer=clf.train_logistic,
    threshold: float = clf.CONFIDENCE_THRESHOLD,
) -> dict:
    """Cross-validated P/R/F1 on the labeled pairs.

    The labeled feature matrix is collected once (bounded by |labeled|);
    fold training happens in numpy on the driver, mirroring the reference's
    sklearn-on-one-node evaluation protocol (docs/evaluations.rst:5-14).
    """
    rows = (
        with_fold(labeled, k)
        .join(features, ["url_a", "url_b"])
        .select(*FEATURE_COLUMNS, "label", "fold")
        .collect()
    )
    X = np.array([[r[c] for c in FEATURE_COLUMNS] for r in rows])
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    folds = np.array([r["fold"] for r in rows])

    per_fold = []
    tp = fp = fn = 0
    for f in range(k):
        test = folds == f
        model = trainer(X[~test], y[~test])
        # _model_proba handles every model family in classify.py (linear
        # column models, forest, MLP, SVC, voting/super-learner ensembles).
        pred = clf._model_proba(model, X[test])
        hit = pred >= threshold
        ftp = int(((y[test] == 1) & hit).sum())
        ffp = int(((y[test] == 0) & hit).sum())
        ffn = int(((y[test] == 1) & ~hit).sum())
        tp, fp, fn = tp + ftp, fp + ffp, fn + ffn
        p = ftp / (ftp + ffp) if ftp + ffp else 0.0
        r = ftp / (ftp + ffn) if ftp + ffn else 0.0
        per_fold.append(2 * p * r / (p + r) if p + r else 0.0)

    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return dict(
        f1=f1,
        precision=precision,
        recall=recall,
        f1_mean=float(np.mean(per_fold)),
        f1_std=float(np.std(per_fold)),
        per_fold=per_fold,
    )


def collect_labeled_matrix(features: DataFrame, labeled: DataFrame, k: int = 5):
    """One bounded collect shared by kfold/grid search."""
    rows = (
        with_fold(labeled, k)
        .join(features, ["url_a", "url_b"])
        .select(*FEATURE_COLUMNS, "label", "fold")
        .collect()
    )
    X = np.array([[r[c] for c in FEATURE_COLUMNS] for r in rows])
    y = np.array([r["label"] for r in rows], dtype=np.float64)
    folds = np.array([r["fold"] for r in rows])
    return X, y, folds


def grid_search(
    features: DataFrame,
    labeled: DataFrame,
    param_grid: dict[str, list],
    trainer=clf.train_logistic,
    k: int = 5,
    threshold: float = clf.CONFIDENCE_THRESHOLD,
) -> dict:
    """M11 (train.py:232-253 GridSearchCV analogue): exhaustive grid over
    trainer kwargs, scored by k-fold F1; deterministic tie-break = first
    combination in sorted-key iteration order (the reference pins seeds 610
    and 1269 for the same reason). One collect, numpy folds on the driver.
    """
    import itertools

    X, y, folds = collect_labeled_matrix(features, labeled, k)
    keys = sorted(param_grid)
    best = None
    results = []
    for combo in itertools.product(*[param_grid[kk] for kk in keys]):
        params = dict(zip(keys, combo))

        tp = fp = fn = 0
        for f in range(k):
            test = folds == f
            model = trainer(X[~test], y[~test], **params)
            pred = clf._model_proba(model, X[test])
            hit = pred >= threshold
            tp += int(((y[test] == 1) & hit).sum())
            fp += int(((y[test] == 0) & hit).sum())
            fn += int(((y[test] == 1) & ~hit).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        results.append({"params": params, "f1": f1})
        if best is None or f1 > best["f1"] + 1e-12:
            best = {"params": params, "f1": f1}
    return {"best": best, "results": results}
