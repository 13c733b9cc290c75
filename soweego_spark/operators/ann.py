"""Similarity search over embedding columns.

Not in the reference (its similarity surface is string/date kernels,
linker/features.py) — required for a training-data pipeline at 100 TB:
near-duplicate detection and top-k retrieval over ``array<float>``
embeddings.

Design for scale:

* ``brute_force_*`` — the exact baseline. One side is collected and
  broadcast as a single contiguous numpy matrix (fine while that side is
  <= a few GB; 10M x 128 floats = 5 GB); the other side streams through
  ``mapInPandas`` and each Arrow batch does ONE BLAS matmul against the
  broadcast matrix. No per-pair Python, no per-pair JVM expression — the
  inner loop is C. For two large sides, tile: repartition the broadcast
  side into chunks and loop (grid of matmuls), or switch to the bucketed
  variant below.
* ``lsh_bucketed_neardup`` — the sub-quadratic path: random-hyperplane
  (SimHash-for-cosine) bucketing, exact cosine confirmation inside each
  bucket. Buckets are the shuffle key; the hot-bucket cap bounds skew
  exactly like operators/dedup.py.

Determinism: hyperplanes come from a seeded RandomState; numpy matmul is
deterministic for a fixed BLAS; scores are rounded before thresholding in
the caller when oracle comparison matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

PAIR_SCHEMA = StructType(
    [
        StructField("vec_a", LongType()),
        StructField("vec_b", LongType()),
        StructField("cosine", DoubleType()),
    ]
)

TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
        StructField("rn", LongType()),
    ]
)


def _collect_matrix(
    emb: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    n = np.sqrt((mat * mat).sum(axis=1))
    n[n == 0] = 1.0
    return n


def brute_force_neardup(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold; broadcast + BLAS."""
    spark = emb.sparkSession
    ids, mat = _collect_matrix(emb, id_col, vec_col)
    norms = _norm_rows(mat)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(q) == 0:
                continue
            sims = (q @ all_mat.T) / np.outer(_norm_rows(q), all_norms)
            if round_to is not None:
                sims = np.round(sims, round_to)
            rows_i, cols_j = np.where(sims >= threshold)
            a, b = q_ids[rows_i], all_ids[cols_j]
            keep = a < b  # canonical orientation, also drops self-pairs
            yield pd.DataFrame(
                {
                    "vec_a": a[keep],
                    "vec_b": b[keep],
                    "cosine": sims[rows_i[keep], cols_j[keep]],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(run, schema=PAIR_SCHEMA)


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query row (self excluded).

    Ties broken by ascending neighbor id — same ordering as a
    ``row_number() OVER (ORDER BY cosine DESC, neighbor_id ASC)`` window,
    so results are deterministic and SQL-oracle-comparable.
    """
    spark = emb.sparkSession
    ids, mat = _collect_matrix(emb, id_col, vec_col)
    norms = _norm_rows(mat)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy(dtype=np.int64)
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(q) == 0:
                continue
            sims = (q @ all_mat.T) / np.outer(_norm_rows(q), all_norms)
            if round_to is not None:
                sims = np.round(sims, round_to)
            out = []
            for qi in range(len(q_ids)):
                row = sims[qi]
                mask = all_ids != q_ids[qi]
                cand_ids = all_ids[mask]
                cand_sims = row[mask]
                # sort by (-cosine, id): lexsort keys are last-key-primary
                order = np.lexsort((cand_ids, -cand_sims))[:k]
                for rank, j in enumerate(order, 1):
                    out.append(
                        (q_ids[qi], cand_ids[j], cand_sims[j], rank)
                    )
            yield pd.DataFrame(
                out, columns=["query_id", "neighbor_id", "cosine", "rn"]
            )

    return queries.select(id_col, vec_col).mapInPandas(run, schema=TOPK_SCHEMA)


def lsh_bucketed_neardup(
    emb: DataFrame,
    threshold: float,
    n_planes: int = 16,
    seed: int = 61,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 10_000,
    round_to: int | None = 4,
) -> DataFrame:
    """Random-hyperplane LSH bucketing + exact cosine confirmation.

    Two vectors with cosine similarity s collide in one ``n_planes``-bit
    bucket with probability (1 - acos(s)/pi)^n_planes; several independent
    tables would raise recall — this single-table variant is the scale
    demonstrator (the brute-force operator is the exactness baseline).
    """
    spark = emb.sparkSession
    dim = len(emb.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    b_planes = spark.sparkContext.broadcast(planes)

    bucket_schema = StructType(
        [StructField(id_col, LongType()), StructField("bucket", LongType())]
    )

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = b_planes.value
        for pdf in batches:
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(v) == 0:
                continue
            bits = (v @ p.T) > 0
            bucket = np.zeros(len(v), dtype=np.int64)
            for i in range(p.shape[0]):
                bucket |= bits[:, i].astype(np.int64) << i
            yield pd.DataFrame({id_col: pdf[id_col].values, "bucket": bucket})

    buckets = emb.select(id_col, vec_col).mapInPandas(
        bucketize, schema=bucket_schema
    )
    sized = buckets.groupBy("bucket").agg(F.count("*").alias("n"))
    capped = buckets.join(
        F.broadcast(sized.filter(F.col("n") <= max_bucket_size)), "bucket"
    )
    withb = emb.join(capped, id_col)
    left = withb.select(
        "bucket", F.col(id_col).alias("ida"), F.col(vec_col).alias("va")
    )
    right = withb.select(
        "bucket", F.col(id_col).alias("idb"), F.col(vec_col).alias("vb")
    )
    cand = left.join(right, "bucket").filter(F.col("ida") < F.col("idb"))

    pair_schema = PAIR_SCHEMA

    def confirm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            va = np.array(list(pdf["va"]), dtype=np.float64)
            vb = np.array(list(pdf["vb"]), dtype=np.float64)
            sims = (va * vb).sum(axis=1) / (
                _norm_rows(va) * _norm_rows(vb)
            )
            if round_to is not None:
                sims = np.round(sims, round_to)
            keep = sims >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["ida"].values[keep],
                    "vec_b": pdf["idb"].values[keep],
                    "cosine": sims[keep],
                }
            )

    return cand.mapInPandas(confirm, schema=pair_schema).distinct()


def _fit_sample(
    emb: DataFrame, id_col: str, vec_col: str, cap: int
) -> DataFrame:
    """Deterministic bounded sample for driver-side centroid fitting.

    ``orderBy(xxhash64(id)).limit(cap)`` is a TakeOrdered (per-partition
    top-cap + driver merge), not a full sort — the driver never sees more
    than ``cap`` vectors regardless of table size. xxhash64 of the id is a
    seedless deterministic shuffle, so the sample is stable across runs
    and uniformly spread over the id space.
    """
    return (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(cap)
    )


def _kmeans_fit(
    mat: np.ndarray, n_centroids: int, seed: int, iters: int
) -> np.ndarray:
    """Deterministic Lloyd k-means on normalized vectors (driver-side;
    fitting data is a bounded sample at scale)."""
    rng = np.random.RandomState(seed)
    normed = mat / _norm_rows(mat)[:, None]
    idx = rng.choice(len(normed), size=min(n_centroids, len(normed)), replace=False)
    cent = normed[idx].copy()
    for _ in range(iters):
        assign = np.argmax(normed @ cent.T, axis=1)
        for c in range(len(cent)):
            members = normed[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def kmeans_distributed(
    emb: DataFrame,
    n_centroids: int,
    seed: int = 61,
    iters: int = 10,
    init_sample: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fully distributed Lloyd k-means on normalized vectors: the TABLE
    never leaves the executors. Per iteration: cell assignment streams
    through a broadcast-centroid mapInPandas (one BLAS matmul per Arrow
    batch), the centroid update is ``posexplode -> groupBy(cell, pos) ->
    avg`` (map-side combinable), and only the k x dim mean matrix is
    collected. Init centroids come from a bounded deterministic sample
    (``_fit_sample``).

    Returns the (<=k, dim) centroid matrix, rows L2-normalized.
    Deterministic: seeded init + deterministic float aggregation order is
    NOT guaranteed by Spark's avg (parallel sum), so round-trip stability
    is at the 1e-12 level — assignments are stable unless a vector sits
    exactly between centroids.
    """
    spark = emb.sparkSession
    _, init_mat = _collect_matrix(
        _fit_sample(emb, id_col, vec_col, init_sample), id_col, vec_col
    )
    rng = np.random.RandomState(seed)
    normed = init_mat / _norm_rows(init_mat)[:, None]
    idx = rng.choice(
        len(normed), size=min(n_centroids, len(normed)), replace=False
    )
    cent = normed[idx].copy()

    from pyspark.sql.types import ArrayType

    # Emit the NORMALIZED vector: the centroid is the mean of normalized
    # members (same semantics as the driver-side _kmeans_fit).
    cell_schema = StructType(
        [
            StructField("cell", IntegerType()),
            StructField(vec_col, ArrayType(DoubleType())),
        ]
    )
    for _ in range(iters):
        b_cent = spark.sparkContext.broadcast(cent)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = b_cent.value
            for pdf in batches:
                v = np.array(list(pdf[vec_col]), dtype=np.float64)
                if len(v) == 0:
                    continue
                vn = v / _norm_rows(v)[:, None]
                yield pd.DataFrame(
                    {
                        "cell": np.argmax(vn @ c.T, axis=1).astype(np.int32),
                        vec_col: list(vn),
                    }
                )

        assigned = emb.select(vec_col).mapInPandas(assign, schema=cell_schema)
        sums = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = cent.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for c_id, comps in by_cell.items():
            m = np.array([comps[p] for p in sorted(comps)])
            n = np.linalg.norm(m)
            if n > 0:
                new[c_id] = m / n
        cent = new
        b_cent.destroy()
    return cent


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    n_probe: int = 12,
    seed: int = 61,
    kmeans_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 4,
    fit_cap: int = 100_000,
    fit: str = "sample",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse k-means cells as the
    blocking key, exact cosine inside the ``n_probe`` nearest cells.

    The default ``n_probe=12`` of 16 cells is the QUALITY-FIRST setting:
    it holds recall@10 >= 0.9 even on uniform-random vectors (the
    no-cluster-structure worst case, measured 0.93 on the synthetic
    embeddings table at sf0.1 and gated in
    tests/test_ann.py::test_ivf_default_config_recall_at_10). Real
    embedding corpora have cluster structure, so production configs
    typically reach the same recall with far fewer probes — tune n_probe
    down against a measured recall curve, not by assumption.

    ``n_probe == n_centroids`` degrades to exact brute force (tested
    invariant). At 10^12 vectors the cell assignment is the partition key:
    each cell's members are co-located, a query touches n_probe partitions,
    and the centroid table is a tiny broadcast.

    ``fit="sample"`` (default) fits centroids driver-side on a
    ``fit_cap``-bounded deterministic sample (see ``_fit_sample``) — the
    driver never collects the full table. ``fit="distributed"`` runs
    :func:`kmeans_distributed` instead: every vector participates in the
    fit, only k x dim aggregates reach the driver (the full-lake option).
    """
    spark = emb.sparkSession
    if fit == "distributed":
        cent = kmeans_distributed(
            emb, n_centroids, seed=seed, iters=kmeans_iters,
            init_sample=fit_cap, id_col=id_col, vec_col=vec_col,
        )
    else:
        _, mat = _collect_matrix(
            _fit_sample(emb, id_col, vec_col, fit_cap), id_col, vec_col
        )
        cent = _kmeans_fit(mat, n_centroids, seed, kmeans_iters)
    b_cent = spark.sparkContext.broadcast(cent)

    cell_schema = StructType(
        [StructField(id_col, LongType()), StructField("cell", IntegerType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_cent.value
        for pdf in batches:
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(v) == 0:
                continue
            v = v / _norm_rows(v)[:, None]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "cell": np.argmax(v @ c.T, axis=1).astype(np.int32),
                }
            )

    cells = emb.select(id_col, vec_col).mapInPandas(assign, schema=cell_schema)
    members = emb.join(cells, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        "cell",
    )

    probe_schema = StructType(
        [StructField(id_col, LongType()), StructField("cell", IntegerType())]
    )

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_cent.value
        n = min(n_probe, len(c))
        for pdf in batches:
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(v) == 0:
                continue
            v = v / _norm_rows(v)[:, None]
            sims = v @ c.T
            top = np.argsort(-sims, axis=1)[:, :n]
            qid = np.repeat(pdf[id_col].values, n)
            yield pd.DataFrame(
                {id_col: qid, "cell": top.reshape(-1).astype(np.int32)}
            )

    q_probes = queries.select(id_col, vec_col).mapInPandas(
        probes, schema=probe_schema
    )
    q_full = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).join(q_probes.select(F.col(id_col).alias("query_id"), "cell"), "query_id")

    cand = q_full.join(members, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    def confirm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q = np.array(list(pdf["qv"]), dtype=np.float64)
            nvec = np.array(list(pdf["nv"]), dtype=np.float64)
            sims = (q * nvec).sum(axis=1) / (_norm_rows(q) * _norm_rows(nvec))
            if round_to is not None:
                sims = np.round(sims, round_to)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "neighbor_id": pdf["neighbor_id"].values,
                    "cosine": sims,
                }
            )

    scored = cand.mapInPandas(
        confirm,
        schema=StructType(
            [
                StructField("query_id", LongType()),
                StructField("neighbor_id", LongType()),
                StructField("cosine", DoubleType()),
            ]
        ),
    ).dropDuplicates(["query_id", "neighbor_id"])

    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def ivf_recall_at_k(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    **ivf_kwargs,
) -> float:
    """Measured recall@k of :func:`ivf_topk` against the exact
    :func:`brute_force_topk` baseline on the same queries: mean over
    queries of |approx top-k ∩ exact top-k| / |exact top-k|.

    This is the ANN QUALITY gate (the reference's doctrine is
    quality-first evaluation, docs/evaluations.rst:5-14): a fast index
    that silently returns the wrong neighbors is not done. Used by both
    tests/test_ann.py (recall@10 >= 0.9 contract for the default config)
    and bench.py (recall reported next to the wall time). Driver memory
    is bounded by |queries| * k rows — run it on a query SAMPLE, never
    the full lake.
    """
    exact: dict[int, set[int]] = {}
    for r in brute_force_topk(emb, queries, k=k).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx: dict[int, set[int]] = {}
    for r in ivf_topk(emb, queries, k=k, **ivf_kwargs).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    if not exact:
        return 1.0
    return sum(
        len(approx.get(q, set()) & nb) / len(nb) for q, nb in exact.items()
    ) / len(exact)
