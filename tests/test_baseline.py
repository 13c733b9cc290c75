"""Rule-based baseline linker (operators/baseline.py) vs hand oracles and
the planted fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soweego_spark.operators.baseline import (
    extract_qid_links,
    perfect_name_linker,
    similar_names_linker,
)
from soweego_spark.operators.extract import extract_signatures
from soweego_spark.sources.pages import generate_pages, pages_to_spark

SIG_SCHEMA = (
    "url string, name array<string>, name_tokens array<string>, "
    "born_p array<struct<y:int,mo:int,d:int,h:int,mi:int,s:int,depth:int>>, "
    "died_p array<struct<y:int,mo:int,d:int,h:int,mi:int,s:int,depth:int>>, "
    "urls array<string>"
)


def _d(y, mo=1, d=1, depth=0):
    return (y, mo, d, 0, 0, 0, depth)


@pytest.fixture(scope="module")
def sides(spark):
    wd = spark.createDataFrame(
        [
            ("w1", ["alice smith"], ["alice", "smith"], [_d(1950, 3, 7, 2)], None, None),
            ("w2", ["bob jones"], ["bob", "jones"], [_d(1960)], None, None),
            ("w3", ["carol ray king"], ["carol", "king", "ray"], None, [_d(2000, 1, 1, 0)], None),
        ],
        SIG_SCHEMA,
    )
    target = spark.createDataFrame(
        [
            # exact name, matching date at lower precision (year)
            ("t1", ["alice smith"], ["alice", "smith"], [_d(1950)], None, None),
            # exact name, WRONG year -> date filter must drop
            ("t2", ["alice smith"], ["alice", "smith"], [_d(1980)], None, None),
            # superset tokens of w2 (bob jones extra) + matching year
            ("t3", ["bob m jones"], ["bob", "jones", "extra"], [_d(1960)], None, None),
            # subset tokens of w3 (carol king) + matching died year
            ("t4", ["carol king"], ["carol", "king"], None, [_d(2000)], None),
            # subset of size 1 -> excluded
            ("t5", ["king"], ["king"], None, [_d(2000)], None),
            # qid-bearing URL
            ("t6", ["x"], ["zz", "yy"], None, None, ["https://www.wikidata.org/wiki/Q42"]),
        ],
        SIG_SCHEMA,
    )
    return wd, target


def test_perfect_name_with_date_filter(spark, sides):
    wd, target = sides
    got = {tuple(r) for r in perfect_name_linker(wd, target).collect()}
    assert got == {("w1", "t1")}  # t2 dropped by the date filter
    got_nodates = {
        tuple(r) for r in perfect_name_linker(wd, target, compare_dates=False).collect()
    }
    assert got_nodates == {("w1", "t1"), ("w1", "t2")}


def test_similar_names_both_directions(spark, sides):
    wd, target = sides
    got = {tuple(r) for r in similar_names_linker(wd, target).collect()}
    # w2 ⊆ t3 (superset direction), t4 ⊆ w3 (subset direction, size 2 > 1),
    # w1 == t1 tokens (both directions), t5 excluded (size 1),
    # t2 dropped by dates.
    assert got == {("w2", "t3"), ("w3", "t4"), ("w1", "t1")}


def test_extract_qid_links(spark, sides):
    _, target = sides
    got = {tuple(r) for r in extract_qid_links(target).collect()}
    assert got == {("Q42", "t6")}


def test_perfect_name_on_fixture_high_precision(spark):
    """Self-linking the fixture pages: the baseline's perfect-name + date
    rule should be high-precision against planted entity labels."""
    fx = generate_pages(150, seed=3)
    pages, truth, _, _ = pages_to_spark(spark, fx)
    sig = extract_signatures(pages).cache()
    pairs = perfect_name_linker(sig, sig).filter(F.col("url_a") < F.col("url_b"))
    ta = truth.select(F.col("url").alias("url_a"), F.col("entity_id").alias("ea"))
    tb = truth.select(F.col("url").alias("url_b"), F.col("entity_id").alias("eb"))
    j = pairs.join(ta, "url_a").join(tb, "url_b")
    same = j.filter(F.col("ea") == F.col("eb")).count()
    total = j.count()
    assert total > 50
    assert same / total >= 0.95, (same, total)
