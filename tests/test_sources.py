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
