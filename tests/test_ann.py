"""ANN operator oracles (operators/ann.py).

The brute-force operators are exact-checked against DuckDB by the driver
gate; here we pin (a) LSH candidate decisions replayed exactly in numpy
from the seeded hyperplanes, and (b) LSH precision == 1.0 relative to the
brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pytest

from soweego_spark.operators.ann import (
    brute_force_neardup,
    brute_force_topk,
    lsh_bucketed_neardup,
)

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.4


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def matrix(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _cosine_matrix(mat):
    n = np.sqrt((mat * mat).sum(axis=1))
    n[n == 0] = 1.0
    return np.round((mat @ mat.T) / np.outer(n, n), 4)


def test_brute_force_neardup_matches_numpy(emb, matrix):
    ids, mat = matrix
    sims = _cosine_matrix(mat)
    expected = {
        (int(ids[i]), int(ids[j])): sims[i, j]
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= THRESHOLD
    }
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in brute_force_neardup(emb, threshold=THRESHOLD).collect()
    }
    assert got == expected


def test_lsh_exact_decision_replay(emb, matrix):
    """Operator output == {same-bucket pairs} ∩ {cosine >= t}, with the
    bucketing replayed from the same seeded hyperplanes."""
    ids, mat = matrix
    n_planes, seed = 8, 61
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, mat.shape[1]))
    bits = (mat @ planes.T) > 0
    bucket = np.zeros(len(ids), dtype=np.int64)
    for i in range(n_planes):
        bucket |= bits[:, i].astype(np.int64) << i
    sims = _cosine_matrix(mat)
    expected = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if bucket[i] == bucket[j] and sims[i, j] >= THRESHOLD
    }
    got = {
        (r["vec_a"], r["vec_b"])
        for r in lsh_bucketed_neardup(
            emb, threshold=THRESHOLD, n_planes=n_planes, seed=seed
        ).collect()
    }
    assert got == expected


def test_lsh_precision_vs_brute_force(emb):
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in brute_force_neardup(emb, threshold=THRESHOLD).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in lsh_bucketed_neardup(
            emb, threshold=THRESHOLD, n_planes=8
        ).collect()
    }
    assert lsh <= brute  # exact confirmation -> no false positives


def test_topk_ranks_and_ties(emb, matrix):
    ids, mat = matrix
    sims = _cosine_matrix(mat)
    got = brute_force_topk(emb, emb.filter("vec_id < 5"), k=3).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(
            (r["rn"], r["neighbor_id"], r["cosine"])
        )
    for qid, rows in by_query.items():
        qi = int(np.where(ids == qid)[0][0])
        row = sims[qi].copy()
        mask = ids != qid
        order = np.lexsort((ids[mask], -row[mask]))[:3]
        expected = [
            (rank, int(ids[mask][j]), row[mask][j])
            for rank, j in enumerate(order, 1)
        ]
        assert sorted(rows) == expected


def test_ivf_full_probe_equals_brute_force(emb):
    from soweego_spark.operators.ann import ivf_topk

    brute = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_topk(emb, emb.filter("vec_id < 10"), k=3).collect()
    }
    ivf = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_topk(
            emb, emb.filter("vec_id < 10"), k=3,
            n_centroids=8, n_probe=8,  # probe everything -> exact
        ).collect()
    }
    assert ivf == brute


def test_ivf_partial_probe_recall(emb):
    from soweego_spark.operators.ann import ivf_topk

    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, emb.filter("vec_id < 30"), k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, emb.filter("vec_id < 30"), k=5, n_centroids=8, n_probe=4
        ).collect()
    }
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.5, recall  # half the cells probed on random vectors


def test_ivf_fit_sample_is_bounded(emb):
    """The k-means fit must never see more rows than fit_cap — the
    scale guard against collecting a 10^9-row table to the driver."""
    from soweego_spark.operators.ann import _fit_sample, ivf_topk

    total = emb.count()
    cap = max(2, total // 4)
    sample = _fit_sample(emb, "vec_id", "embedding", cap)
    assert sample.count() == cap
    # deterministic: same cap -> same ids
    ids1 = [r[0] for r in sample.select("vec_id").collect()]
    ids2 = [
        r[0]
        for r in _fit_sample(emb, "vec_id", "embedding", cap)
        .select("vec_id")
        .collect()
    ]
    assert ids1 == ids2
    # operator still works end-to-end with a tiny fit cap
    out = ivf_topk(
        emb, emb.filter("vec_id < 5"), k=3, n_centroids=4, n_probe=4,
        fit_cap=cap,
    )
    assert out.count() > 0


def test_distributed_kmeans_and_ivf(emb):
    """kmeans_distributed improves inertia over its init and ivf_topk with
    fit='distributed' keeps the full-probe == brute-force invariant."""
    import numpy as np

    from soweego_spark.operators.ann import (
        _collect_matrix,
        _fit_sample,
        _norm_rows,
        ivf_topk,
        kmeans_distributed,
    )

    cent = kmeans_distributed(emb, n_centroids=6, iters=5, init_sample=50)
    assert cent.shape[1] == 64
    np.testing.assert_allclose(_norm_rows(cent), 1.0, atol=1e-9)

    _, mat = _collect_matrix(emb, "vec_id", "embedding")
    normed = mat / _norm_rows(mat)[:, None]

    def inertia(c):
        return float((1.0 - (normed @ c.T).max(axis=1)).sum())

    # init = the same seeded sample pick the function starts from
    rng = np.random.RandomState(61)
    _, init_mat = _collect_matrix(
        _fit_sample(emb, "vec_id", "embedding", 50), "vec_id", "embedding"
    )
    init_n = init_mat / _norm_rows(init_mat)[:, None]
    idx = rng.choice(len(init_n), size=6, replace=False)
    assert inertia(cent) <= inertia(init_n[idx]) + 1e-9

    brute = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in brute_force_topk(emb, emb.filter("vec_id < 8"), k=3).collect()
    }
    ivf = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in ivf_topk(
            emb, emb.filter("vec_id < 8"), k=3,
            n_centroids=6, n_probe=6, fit="distributed", kmeans_iters=3,
        ).collect()
    }
    assert ivf == brute


def test_ivf_default_config_recall_at_10(spark):
    """ANN quality gate (round-4 contract): recall@10 of the DEFAULT IVF
    config (n_centroids=16, n_probe=12) vs exact brute force must be
    >= 0.9 at sf0.1 — on uniform-random synthetic embeddings, the
    no-cluster-structure WORST case for an inverted-file index (recall
    tracks the probed cell fraction: measured 0.53 at n_probe=4, 0.93 at
    n_probe=12, 1.0 at 16). Real corpora cluster, so this bounds
    production recall from below."""
    from soweego_spark.operators.ann import ivf_recall_at_k

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    recall = ivf_recall_at_k(emb, emb.filter("vec_id < 50"), k=10)
    assert recall >= 0.9, recall
