"""Source/sink helpers (SURVEY.md §2.1).

Every reference dump reader collapses to a ``spark.read`` with the right
options; gzip is transparent to Spark's text-based sources.

  S1  gzipped TSV with ``\\N`` nulls (IMDb name/title basics;
      imdb_dump_extractor.py:261-328, null-norm 54-68)  -> read_tsv
  S3  tar'd pipe-separated dumps (MusicBrainz mbdump;
      musicbrainz_dump_extractor.py:458-530)            -> read_psv
  S6  gzipped JSON Lines, chunked pandas reader
      (linker/workflow.py:123)                          -> read_jsonl
  S10 gzipped JSONL sink (workflow.py:104-113)          -> write_jsonl
  S11 chunk-appended CSV predictions sink ``qid,tid,score``
      (linker/link.py:86-89)                            -> write_links_csv
  S12 pickle-cache resumability                         -> plans/checkpoint.py

The reference's 1000-row chunking disappears: partitions ARE the chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    null_value: str = "\\N",
    header: bool = True,
) -> DataFrame:
    """S1: (gzipped) tab-separated scan with IMDb-style ``\\N`` -> NULL."""
    reader = (
        spark.read.option("sep", "\t")
        .option("nullValue", null_value)
        .option("header", str(header).lower())
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_psv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = False
) -> DataFrame:
    """S3: pipe-separated dump scan with an explicit schema (the
    MusicBrainz mbdump files carry no header row)."""
    return (
        spark.read.option("sep", "|")
        .option("header", str(header).lower())
        .schema(schema)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """S6: (gzipped) JSON Lines scan — one object per line, exactly the
    shape the reference's Wikidata fetcher emits (api_requests.py:272-281)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compress: bool = True) -> None:
    """S10: JSONL sink; gzip codec mirrors the reference's gz output."""
    writer = df.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)


def write_links_csv(
    links: DataFrame,
    path: str,
    qid_col: str = "url_a",
    tid_col: str = "url_b",
    score_col: str = "score",
    compress: bool = True,
) -> None:
    """S11: the predictions sink — ``qid,tid,score`` rows, no header
    (linker/link.py:86-89 appends headerless chunks; partition files play
    the chunk role)."""
    out = links.select(
        F.col(qid_col).alias("qid"),
        F.col(tid_col).alias("tid"),
        F.col(score_col).cast("double").alias("score"),
    )
    writer = out.write.mode("overwrite").option("header", "false")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """S9 analogue: columnar sink partitioned for downstream pruning —
    at 100 TB the signatures table is written partitioned by e.g.
    crawl date / lang so blocking scans prune."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 256,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed sink for co-located joins: two tables bucketed on the same
    key with the same bucket count join with NO shuffle on either side —
    at 10^12 rows this is how the signatures table and the candidate-pair
    table are laid out so the repeated pair-assembly joins (url_a / url_b)
    never reshuffle the signatures.

    Bucketing requires the table catalog (``saveAsTable``); plain
    ``.parquet(path)`` cannot record bucket metadata. ``sort_cols``
    additionally sorts within buckets, upgrading the join to a
    merge-without-sort.
    """
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    predicates: list[str] | None = None,
    properties: dict[str, str] | None = None,
):
    """S5: streamed SQL scan (the reference's main ingestion path reads
    whole catalog tables through SQLAlchemy in 1000-row chunks,
    linker/workflow.py:164-179 + importer ORM).

    Spark-first shape: ``spark.read.jdbc`` with EITHER a numeric
    ``partition_column`` + bounds (each of ``num_partitions`` executors
    issues its own range-bounded query — the chunking the reference does
    serially happens in parallel) OR an explicit ``predicates`` list (one
    partition per predicate, for non-numeric splits e.g. by date). With
    neither, the scan is a single partition — fine for dimension tables,
    wrong for facts; callers at scale must pass one or the other.

    No JDBC driver ships in this sandbox, so this returns the configured
    ``DataFrameReader``-bound callable's plan lazily: we build and return
    the reader invocation arguments via ``jdbc_scan_options`` for testing,
    and the live path calls ``spark.read.jdbc`` directly.
    """
    props = dict(properties or {})
    props.setdefault("fetchsize", str(fetch_size))
    if predicates is not None:
        return spark.read.jdbc(
            url=url, table=table, predicates=predicates, properties=props
        )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions (parallel range scan)"
            )
        return spark.read.jdbc(
            url=url,
            table=table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    return spark.read.jdbc(url=url, table=table, properties=props)


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """The option dict ``read_jdbc`` plumbs into the DataSourceV1 JDBC
    relation — exposed separately so the partitioning contract is unit-
    testable without a JDBC driver on the classpath."""
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions (parallel range scan)"
            )
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return opts


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S2: streaming XML scan (Discogs ``<artist>``/``<master>`` nodes,
    discogs_dump_extractor.py:516-530) via Spark 4's built-in XML source —
    the reference's constant-memory ``lxml.iterparse`` becomes the
    source's own streaming row-tag splitter, parallel across file splits."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
