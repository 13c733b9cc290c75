"""Source/sink round trips (sources/readers.py) incl. the reference's
null-token and gz semantics."""

from __future__ import annotations

import glob
import gzip
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from soweego_spark.sources.readers import (
    read_jsonl,
    read_psv,
    read_tsv,
    write_jsonl,
    write_links_csv,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="soweego-src-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_tsv_gz_with_null_tokens(spark, tmpdir):
    p = f"{tmpdir}/name.basics.tsv.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("nconst\tprimaryName\tbirthYear\tdeathYear\n")
        fh.write("nm0000001\tFred Astaire\t1899\t1987\n")
        fh.write("nm0000002\tLauren Bacall\t1924\t\\N\n")
    df = read_tsv(
        spark, p,
        schema="nconst string, primaryName string, birthYear int, deathYear int",
    )
    rows = {r["nconst"]: r for r in df.collect()}
    assert rows["nm0000001"]["deathYear"] == 1987
    assert rows["nm0000002"]["deathYear"] is None  # \N -> NULL
    assert rows["nm0000002"]["primaryName"] == "Lauren Bacall"


def test_psv_with_schema(spark, tmpdir):
    p = f"{tmpdir}/artist"
    with open(p, "w") as fh:
        fh.write("1|ac1|Miles Davis|Davis, Miles\n")
        fh.write("2|ac2|Bill Evans|Evans, Bill\n")
    df = read_psv(spark, p, "id long, gid string, name string, sort_name string")
    assert df.count() == 2
    assert df.filter("id = 1").first()["name"] == "Miles Davis"


def test_jsonl_gz_roundtrip(spark, tmpdir):
    src = spark.createDataFrame(
        [("Q1", ["alice smith"], 1980), ("Q2", ["bob jones"], None)],
        "qid string, name array<string>, born int",
    )
    write_jsonl(src, f"{tmpdir}/out")
    files = glob.glob(f"{tmpdir}/out/part-*.json.gz")
    assert files, "expected gzipped jsonl parts"
    back = read_jsonl(spark, f"{tmpdir}/out", "qid string, name array<string>, born int")
    got = {
        (r["qid"], tuple(r["name"]), r["born"]) for r in back.collect()
    }
    assert got == {("Q1", ("alice smith",), 1980), ("Q2", ("bob jones",), None)}


def test_links_csv_sink_format(spark, tmpdir):
    links = spark.createDataFrame(
        [("u1", "u2", 0.91), ("u3", "u4", 0.72)],
        "url_a string, url_b string, score double",
    )
    write_links_csv(links, f"{tmpdir}/links", compress=False)
    lines = []
    for f in glob.glob(f"{tmpdir}/links/part-*.csv"):
        lines += [ln.strip() for ln in open(f) if ln.strip()]
    assert sorted(lines) == ["u1,u2,0.91", "u3,u4,0.72"]


def test_xml_row_tag_scan(spark, tmpdir):
    with open(f"{tmpdir}/artists.xml", "w") as fh:
        fh.write(
            "<artists>"
            "<artist><id>1</id><name>Miles Davis</name></artist>"
            "<artist><id>2</id><name>Bill Evans</name></artist>"
            "</artists>"
        )
    from soweego_spark.sources.readers import read_xml

    df = read_xml(spark, f"{tmpdir}/artists.xml", "artist")
    assert {(r["id"], r["name"]) for r in df.collect()} == {
        (1, "Miles Davis"),
        (2, "Bill Evans"),
    }


def test_jdbc_scan_options_partitioned():
    from soweego_spark.sources.readers import jdbc_scan_options

    opts = jdbc_scan_options(
        "jdbc:mysql://host/db",
        "musicbrainz_artist",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
        fetch_size=5000,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "64"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"
    assert opts["fetchsize"] == "5000"


def test_jdbc_scan_options_requires_full_bounds():
    import pytest

    from soweego_spark.sources.readers import jdbc_scan_options

    with pytest.raises(ValueError):
        jdbc_scan_options("jdbc:x", "t", partition_column="id")


def test_bucketed_join_avoids_shuffle(spark, tmpdir):
    """Two tables bucketed on the same key join with no shuffle exchange
    on either side (the co-located-join layout for the pair-assembly
    joins at scale)."""
    from pyspark.sql import functions as F

    from soweego_spark.sources.readers import write_bucketed_table

    left = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 2).alias("a"),
    )
    right = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 3).alias("b"),
    )
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    write_bucketed_table(
        left, "bt_left", ["url"], n_buckets=8, sort_cols=["url"],
        path=f"{tmpdir}/bt_left",
    )
    write_bucketed_table(
        right, "bt_right", ["url"], n_buckets=8, sort_cols=["url"],
        path=f"{tmpdir}/bt_right",
    )
    try:
        # merge hint: at test size the planner would broadcast (which also
        # avoids a shuffle but doesn't exercise the bucket layout); at
        # production size SMJ is what the planner picks on its own.
        j = spark.table("bt_left").hint("merge").join(
            spark.table("bt_right").hint("merge"), "url"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")


def test_refresh_dump_versioned_skip(spark, tmpdir):
    """S4: download happens once per last-modified stamp; a re-run with an
    unchanged source is a no-op, a touched source downloads again."""
    import os
    import time

    from soweego_spark.sources.remote import refresh_dump

    src = f"{tmpdir}/dump.tsv.gz"
    with open(src, "w") as fh:
        fh.write("data-v1")
    out = f"{tmpdir}/dumps"

    p1, dl1 = refresh_dump(src, out)
    p2, dl2 = refresh_dump(src, out)
    assert dl1 is True and dl2 is False and p1 == p2
    assert open(p1).read() == "data-v1"

    time.sleep(1.1)  # mtime resolution
    with open(src, "w") as fh:
        fh.write("data-v2!")
    os.utime(src)
    p3, dl3 = refresh_dump(src, out)
    assert dl3 is True and p3 != p1
    assert open(p3).read() == "data-v2!"


def test_bucketed_api_fetch_parallel_buckets(spark):
    """S8: every id fetched exactly once; fetch_fn sees bounded buckets."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from soweego_spark.sources.remote import bucketed_api_fetch

    ids = spark.range(0, 137).withColumnRenamed("id", "qid")
    schema = StructType(
        [StructField("qid", LongType()), StructField("label", StringType())]
    )

    def fetch(bucket):
        # the API's hard contract: never more than bucket_size ids per call
        if len(bucket) > 50:
            raise AssertionError(f"bucket too large: {len(bucket)}")
        return [{"qid": int(q), "label": f"L{q}"} for q in bucket]

    out = bucketed_api_fetch(ids, fetch, schema, id_col="qid", bucket_size=50)
    rows = {r["qid"]: r["label"] for r in out.collect()}
    assert rows == {q: f"L{q}" for q in range(137)}

    # skewed partitioning still respects the contract (one partition)
    out1 = bucketed_api_fetch(
        ids.coalesce(1), fetch, schema, id_col="qid", bucket_size=50
    )
    assert out1.count() == 137


def test_paged_scan_covers_all_pages(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from soweego_spark.sources.remote import paged_scan

    data = list(range(103))

    def page_fn(offset, limit):
        return [{"v": v} for v in data[offset : offset + limit]]

    schema = StructType([StructField("v", LongType())])
    out = paged_scan(spark, page_fn, n_pages=11, page_size=10, schema=schema)
    assert sorted(r["v"] for r in out.collect()) == data


def test_emit_statements_batched(spark, tmpdir):
    """S13/S14: every row reaches the emitter exactly once, in bounded
    batches, payload-file shaped."""
    import glob
    import json

    from soweego_spark.sources.remote import emit_statements, jsonl_dir_emitter

    df = spark.range(0, 57).selectExpr(
        "id AS qid", "concat('P', id % 3) AS pid", "concat('v', id) AS value"
    ).repartition(4)
    out = f"{tmpdir}/payloads"
    emit_statements(df, jsonl_dir_emitter(out), batch_size=10)
    rows = []
    for f in glob.glob(f"{out}/part-*.jsonl"):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["qid"] for r in rows) == list(range(57))
    assert all(set(r) == {"qid", "pid", "value"} for r in rows)


def test_jsonl_emitter_concurrent_attempts_dont_corrupt(tmpdir):
    """Two concurrent attempts of the same partition (speculative
    execution) each stream into an attempt-unique temp file; interleaved
    writes cannot corrupt the published file, and whichever attempt
    finalizes last wins whole-file."""
    import glob
    import json

    from soweego_spark.sources import remote as rm

    out = f"{tmpdir}/payloads"
    em = rm.jsonl_dir_emitter(out)
    rows_a = [{"qid": i, "v": f"a{i}"} for i in range(20)]
    rows_b = [{"qid": i, "v": f"a{i}"} for i in range(20)]  # same content

    # interleave two attempts of partition 0
    attempt = {"id": 1}
    em._attempt_id = lambda: attempt["id"]  # noqa: SLF001 — test seam
    em(0, rows_a[:10])
    attempt["id"] = 2
    em(0, rows_b[:10])
    attempt["id"] = 1
    em(0, rows_a[10:])
    attempt["id"] = 2
    em(0, rows_b[10:])
    em.finalize(0)  # attempt 2 publishes
    attempt["id"] = 1
    em.finalize(0)  # attempt 1 re-publishes (last writer, whole file)

    files = glob.glob(f"{out}/part-*.jsonl")
    assert len(files) == 1
    with open(files[0]) as fh:
        got = [json.loads(line) for line in fh]
    assert sorted(r["qid"] for r in got) == list(range(20))
    assert not glob.glob(f"{out}/*.tmp")
