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
        StructField("rn", IntegerType()),
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
