#!/usr/bin/env python
"""spark-submit entry point for the validator ("sync") side of the engine.

Reference analogue: ``python -m soweego sync links|dead_ids|bios``
(validator/checks.py) — the reconciliation pass that compares Wikidata-side
records against a target catalog and emits curation statements. Production
shape mirrors jobs/link_job.py:

    spark-submit --py-files soweego_spark.zip jobs/sync_job.py \
        --wd /lake/wd_side --target /lake/catalog_side \
        --output /lake/sync_out [--synthetic N]

Inputs (parquet; Iceberg in production):
  wd(tid, urls ARRAY<STRING>,
     dates   ARRAY<STRUCT<idx LONG, y INT, mo INT, d INT, depth INT>>,
     claims  ARRAY<STRUCT<idx LONG, pid STRING, qid STRING,
                          values ARRAY<STRING>>>)
  target(same tid key; urls; dates; statements ARRAY<STRUCT<idx LONG,
         pid STRING, value STRING>>)

Outputs, one directory each:
  links     SO1 set algebra per shared id (shared / wd_only / extra /
            deprecate flag)
  dead_ids  J6 anti join — wd identifiers missing from the catalog
  bio_dates SO2 greedy shared-precision date matches
  bio_claims SO2 greedy normalized-label claim matches

``--synthetic N`` builds a deterministic fixture instead of reading inputs
(smoke runs without data).
"""

from __future__ import annotations

import argparse
import json
import sys


def _synthetic_inputs(spark, n: int):
    """Deterministic wd/target fixture with planted overlaps and gaps."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").alias("tid"))
    wd = base.select(
        "tid",
        F.array(
            F.concat(F.lit("https://catalog-a.example/artist/a-"), F.col("tid")),
            F.concat(F.lit("https://site.example/p/"), F.col("tid")),
        ).alias("urls"),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("idx"),
                (F.lit(1900) + (F.col("tid") % 80)).cast("int").alias("y"),
                F.lit(3).cast("int").alias("mo"),
                F.lit(14).cast("int").alias("d"),
                F.lit(2).cast("int").alias("depth"),
            )
        ).alias("dates"),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("idx"),
                F.lit("occupation").alias("pid"),
                F.concat(F.lit("Q"), F.col("tid")).alias("qid"),
                F.array(F.lit("singer"), F.lit("composer")).alias("values"),
            )
        ).alias("claims"),
    )
    # target: 2/3 of ids exist; urls overlap on the catalog profile for
    # even ids only; dates agree at year precision; half the statements
    # match a wd label.
    tgt = base.filter(F.col("tid") % 3 != 0).select(
        "tid",
        F.when(
            F.col("tid") % 2 == 0,
            F.array(
                F.concat(
                    F.lit("https://catalog-a.example/artist/a-"), F.col("tid")
                )
            ),
        )
        .otherwise(F.array(F.concat(F.lit("https://other.example/"), F.col("tid"))))
        .alias("urls"),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("idx"),
                (F.lit(1900) + (F.col("tid") % 80)).cast("int").alias("y"),
                F.lit(7).cast("int").alias("mo"),
                F.lit(1).cast("int").alias("d"),
                F.lit(0).cast("int").alias("depth"),  # year precision
            )
        ).alias("dates"),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("idx"),
                F.lit("occupation").alias("pid"),
                F.when(F.col("tid") % 2 == 0, F.lit("Singer")).otherwise(
                    F.lit("pianist")
                ).alias("value"),
            )
        ).alias("statements"),
    )
    return wd, tgt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wd", help="parquet path of the Wikidata-side table")
    ap.add_argument("--target", help="parquet path of the catalog-side table")
    ap.add_argument("--output", required=True)
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("soweego-spark-sync")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from soweego_spark.functions.text import norm_lower
    from soweego_spark.operators.validator import (
        dead_ids,
        match_bio_claims,
        match_bio_dates,
        validate_links,
    )

    if args.synthetic:
        wd, tgt = _synthetic_inputs(spark, args.synthetic)
    else:
        if not (args.wd and args.target):
            ap.error("--wd and --target are required without --synthetic")
        wd = spark.read.parquet(args.wd)
        tgt = spark.read.parquet(args.target)

    links = validate_links(
        wd.select("tid", "urls"), tgt.select("tid", "urls")
    )
    dead = dead_ids(wd.select("tid"), tgt.select("tid"))

    wd_dates = wd.select(
        "tid", F.explode("dates").alias("d")
    ).select("tid", F.col("d.idx").alias("wd_idx"), "d.y", "d.mo", "d.d", "d.depth")
    t_dates = tgt.select(
        "tid", F.explode("dates").alias("d")
    ).select("tid", F.col("d.idx").alias("t_idx"), "d.y", "d.mo", "d.d", "d.depth")
    bio_dates = match_bio_dates(wd_dates, t_dates)

    wd_claims = wd.select("tid", F.explode("claims").alias("c")).select(
        "tid", F.col("c.idx").alias("wd_idx"), "c.pid", "c.qid", "c.values"
    )
    t_claims = (
        tgt.select("tid", F.explode("statements").alias("s"))
        .select(
            "tid",
            F.col("s.idx").alias("t_idx"),
            F.col("s.pid"),
            # reference _compare_other normalizes the target value
            # (checks.py:908) — same byte-parity kernel here.
            norm_lower(F.col("s.value")).alias("t_value"),
        )
    )
    bio_claims = match_bio_claims(wd_claims, t_claims)

    links.write.mode("overwrite").parquet(f"{args.output}/links")
    dead.write.mode("overwrite").parquet(f"{args.output}/dead_ids")
    bio_dates.write.mode("overwrite").parquet(f"{args.output}/bio_dates")
    bio_claims.write.mode("overwrite").parquet(f"{args.output}/bio_claims")

    stats = {
        "links": links.count(),
        "deprecate": links.filter("deprecate").count(),
        "dead_ids": dead.count(),
        "bio_date_matches": bio_dates.count(),
        "bio_claim_matches": bio_claims.count(),
    }
    print("STATS " + json.dumps(stats), file=sys.stderr)
    print(json.dumps({"status": "ok", "stats": stats}))
    spark.stop()


if __name__ == "__main__":
    main()
