"""Explicit skew handling: salted joins and salted aggregations.

The north_star calls for "salted multi-key blocking ... with explicit
skew-aware repartitioning". Three layers of defense are used in this
engine, in order of preference:

1. **AQE** (`spark.sql.adaptive.skewJoin.enabled`, session.py) — splits
   skewed shuffle partitions at runtime; zero code. First line of defense
   for batch equi-joins.
2. **Hot-key caps** — blocking/dedup drop keys whose document frequency
   exceeds a cap (correctness-neutral for linking: a key shared by
   thousands of docs carries no signal). See blocking.py / dedup.py.
3. **Manual salting (this module)** — for the cases AQE cannot fix:
   aggregations whose single hot group lands on one reducer, joins inside
   stateful streaming (no AQE), or when the skewed side must NOT be
   dropped. The salt fans one hot key out to ``n_salts`` reducers; a
   second phase merges.

All salts are deterministic (xxhash64 of row content, not ``rand()``), so
results are reproducible across runs and retried tasks — a failed task
recomputes the same salt (``rand()`` salts break exactly-once semantics
under task retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Add a deterministic salt in [0, n_salts): xxhash64 over ``cols``
    (default: all columns). Rows of the SAME key spread across salts as
    long as any other column varies; fully identical rows co-locate,
    which is harmless (they are duplicates)."""
    cols = cols or df.columns
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast(
            "int"
        ),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a per-row salt, the small
    side is REPLICATED once per salt value, and the join key becomes
    (key, salt) — a hot key's rows now land on ``n_salts`` reducers
    instead of one. Cost: ``n_salts``x the small side's shuffle volume,
    which is the standard trade (use broadcast instead when the small
    side fits in memory; use this when it doesn't).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full outer would emit one null-padded copy of an unmatched
        # small-side row PER SALT (it is replicated n_salts times)
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_s = with_salt(big, n_salts)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias(SALT_COL)
    small_s = small.select("*", salts)
    out = big_s.join(small_s, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_collect_set(
    df: DataFrame,
    key: str | list[str],
    value: str,
    n_salts: int = 16,
    alias: str = "values",
) -> DataFrame:
    """Two-phase collect_set: phase 1 collects per (key, salt) — the hot
    key's set is built by ``n_salts`` reducers in parallel — phase 2
    merges the partial sets with array built-ins. Output order is pinned
    (sorted) so results are deterministic.

    Matches ``df.groupBy(key).agg(collect_set(value))`` exactly; use when
    one group holds a large share of all rows (e.g. the A1 collect_set of
    a Zipf-distributed attribute at 10^12 rows).
    """
    keys = [key] if isinstance(key, str) else list(key)
    partial = (
        with_salt(df, n_salts, cols=[*keys, value])
        .groupBy(*keys, SALT_COL)
        .agg(F.collect_set(value).alias("_partial"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_partial")))
            ).alias(alias)
        )
    )


def repartition_by_key_histogram(
    df: DataFrame,
    key: str,
    target_rows_per_partition: int = 1_000_000,
    sample_fraction: float = 0.001,
    seed: int = 61,
) -> DataFrame:
    """Skew-aware repartitioning: estimate the key histogram from a seeded
    sample, size the partition count to the estimated row count, and
    repartition by (key, salt) where the salt width grows with each key's
    estimated share — heavy keys get more partitions, light keys one.

    This is the explicit version of what AQE does after a shuffle; use it
    when writing bucketed/partitioned output whose layout must be decided
    BEFORE a shuffle (e.g. the signatures sink partitioned for blocking
    scans).
    """
    hist = (
        df.sample(False, sample_fraction, seed)
        .groupBy(key)
        .count()
        .collect()
    )
    total = sum(r["count"] for r in hist) or 1
    n_parts = max(1, int(total / sample_fraction / target_rows_per_partition))
    # only keys needing MORE than one slot go in the plan literal (width 1
    # is the coalesce default) — keeps the map to the few hot keys instead
    # of every sampled key; null keys can't be map keys and default to 1
    heavy = {
        r[key]: int(r["count"] / total * n_parts)
        for r in hist
        if r[key] is not None and int(r["count"] / total * n_parts) > 1
    }
    if heavy:
        salt_map = F.create_map(
            *[x for k, v in heavy.items() for x in (F.lit(k), F.lit(v))]
        )
        width = F.coalesce(salt_map.getItem(F.col(key)), F.lit(1))
    else:
        # empty sample (tiny table / tiny fraction): no observed hot keys,
        # every key gets one partition slot
        width = F.lit(1)
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), width).cast("int"),
    )
    return salted.repartition(n_parts, F.col(key), F.col(SALT_COL)).drop(
        SALT_COL
    )
