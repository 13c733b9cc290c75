"""Validator/enricher semantics vs hand-computed oracles (reference:
validator/checks.py set algebra, enrichment.py joins)."""

from __future__ import annotations

import pytest

from soweego_spark.operators.validator import (
    dead_ids,
    enrich_relationships,
    match_bio_dates,
    url_blacklist_filter,
    validate_links,
)


def test_validate_links_set_algebra(spark):
    wd = spark.createDataFrame(
        [
            ("t1", ["http://a", "http://b"]),
            ("t2", ["http://x"]),
            ("t3", None),
        ],
        "tid string, urls array<string>",
    )
    target = spark.createDataFrame(
        [
            ("t1", ["http://b", "http://c"]),
            ("t2", ["http://y"]),
            ("t3", ["http://z"]),
            ("t9", ["http://only-target"]),  # no wd side -> not validated
        ],
        "tid string, urls array<string>",
    )
    got = {r["tid"]: r for r in validate_links(wd, target).collect()}
    assert set(got) == {"t1", "t2", "t3"}
    assert got["t1"]["shared"] == ["http://b"]
    assert got["t1"]["wd_only"] == ["http://a"]
    assert got["t1"]["extra"] == ["http://c"]
    assert got["t1"]["deprecate"] is False
    assert got["t2"]["deprecate"] is True  # disjoint sets
    assert got["t3"]["deprecate"] is True  # wd side empty
    assert got["t3"]["extra"] == ["http://z"]


def test_dead_ids_anti_join(spark):
    wd = spark.createDataFrame([("a",), ("b",), ("c",)], "tid string")
    catalog = spark.createDataFrame([("a",), ("c",), ("d",)], "tid string")
    assert {r["tid"] for r in dead_ids(wd, catalog).collect()} == {"b"}


def test_match_bio_dates_greedy_first_wins(spark):
    # wd has two day-precision dates; target has one year-precision value
    # that matches both years -> only the FIRST wd date consumes it.
    wd = spark.createDataFrame(
        [("t1", 0, 1950, 3, 7, 2), ("t1", 1, 1950, 5, 9, 2)],
        "tid string, wd_idx int, y int, mo int, d int, depth int",
    )
    target = spark.createDataFrame(
        [("t1", 0, 1950, 1, 1, 0)],
        "tid string, t_idx int, y int, mo int, d int, depth int",
    )
    got = [tuple(r) for r in match_bio_dates(wd, target).collect()]
    assert got == [("t1", 0, 0, 0)]  # shared depth 0 = year only


def test_match_bio_dates_precision_refusal(spark):
    # month mismatch at shared month precision -> no match
    wd = spark.createDataFrame(
        [("t1", 0, 1950, 3, 1, 1)],
        "tid string, wd_idx int, y int, mo int, d int, depth int",
    )
    target = spark.createDataFrame(
        [("t1", 0, 1950, 4, 1, 1)],
        "tid string, t_idx int, y int, mo int, d int, depth int",
    )
    assert match_bio_dates(wd, target).count() == 0


def test_enrich_relationships(spark):
    rel = spark.createDataFrame(
        [("w1", "p1"), ("w1", "p9"), ("w2", "p2"), ("w9", "p1")],
        "from_catalog_id string, to_catalog_id string",
    )
    works = spark.createDataFrame([("w1",), ("w2",)], "tid string")
    people = spark.createDataFrame([("p1",), ("p2",)], "tid string")
    got = {tuple(r) for r in enrich_relationships(rel, works, people).collect()}
    assert got == {("w1", "p1"), ("w2", "p2")}


def test_url_blacklist_filter(spark):
    stmts = spark.createDataFrame(
        [
            ("t1", "https://spam.example/x"),
            ("t2", "https://www.good.example/y"),
            ("t3", "http://good.example/z"),
        ],
        "tid string, url string",
    )
    got = {r["tid"] for r in url_blacklist_filter(stmts, ["spam.example"]).collect()}
    assert got == {"t2", "t3"}


def test_match_bio_claims_reference_semantics(spark):
    """SO2 non-date matching mirrors checks.py:860-917: pid must agree,
    normalized target value must be in the wd label set, greedy both-ways
    consumption in (wd_idx, t_idx) order."""
    from soweego_spark.operators.validator import match_bio_claims

    wd = spark.createDataFrame(
        [
            # tid 1: two 'occupation' claims; wd 0 can take t 0 or t 1
            (1, 0, "occupation", "Q100", ["singer", "composer"]),
            (1, 1, "occupation", "Q101", ["composer"]),
            # pid separation: same value under a different pid must not match
            (1, 2, "genre", "Q102", ["singer"]),
            # tid 2: no overlap
            (2, 0, "occupation", "Q200", ["drummer"]),
        ],
        "tid long, wd_idx long, pid string, qid string, values array<string>",
    )
    tgt = spark.createDataFrame(
        [
            (1, 0, "occupation", "singer"),
            (1, 1, "occupation", "composer"),
            (1, 2, "occupation", "pianist"),
            (2, 0, "occupation", "violinist"),
        ],
        "tid long, t_idx long, pid string, t_value string",
    )
    got = {
        (r["tid"], r["wd_idx"], r["t_idx"], r["qid"])
        for r in match_bio_claims(wd, tgt).collect()
    }
    # Greedy: wd 0 scans t in order -> takes t 0 ('singer'); wd 1 then
    # takes t 1 ('composer'). genre claim and tid 2 never match.
    assert got == {(1, 0, 0, "Q100"), (1, 1, 1, "Q101")}


def test_match_bio_claims_no_double_consumption(spark):
    """A target statement is consumed by at most one wd claim (the
    lowest-wd_idx claimant wins)."""
    from soweego_spark.operators.validator import match_bio_claims

    wd = spark.createDataFrame(
        [
            (1, 0, "p", "Q1", ["v"]),
            (1, 1, "p", "Q2", ["v"]),
        ],
        "tid long, wd_idx long, pid string, qid string, values array<string>",
    )
    tgt = spark.createDataFrame(
        [(1, 0, "p", "v")],
        "tid long, t_idx long, pid string, t_value string",
    )
    got = [
        (r["wd_idx"], r["t_idx"])
        for r in match_bio_claims(wd, tgt).collect()
    ]
    assert got == [(0, 0)]


def test_sync_job_synthetic_outputs(spark):
    """The sync job's four checks produce the planted counts on its
    deterministic synthetic fixture (same logic spark-submit runs)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from jobs.sync_job import _synthetic_inputs
    from soweego_spark.functions.text import norm_lower
    from soweego_spark.operators.validator import (
        dead_ids,
        match_bio_claims,
        match_bio_dates,
        validate_links,
    )

    wd, tgt = _synthetic_inputs(spark, 300)
    links = validate_links(wd.select("tid", "urls"), tgt.select("tid", "urls"))
    assert links.count() == 200            # 2/3 of ids exist in the target
    assert links.filter("deprecate").count() == 100   # odd ids share no URL

    assert dead_ids(wd.select("tid"), tgt.select("tid")).count() == 100

    wd_dates = wd.select("tid", F.explode("dates").alias("d")).select(
        "tid", F.col("d.idx").alias("wd_idx"), "d.y", "d.mo", "d.d", "d.depth"
    )
    t_dates = tgt.select("tid", F.explode("dates").alias("d")).select(
        "tid", F.col("d.idx").alias("t_idx"), "d.y", "d.mo", "d.d", "d.depth"
    )
    assert match_bio_dates(wd_dates, t_dates).count() == 200  # year agrees

    wd_claims = wd.select("tid", F.explode("claims").alias("c")).select(
        "tid", F.col("c.idx").alias("wd_idx"), "c.pid", "c.qid", "c.values"
    )
    t_claims = tgt.select("tid", F.explode("statements").alias("s")).select(
        "tid", F.col("s.idx").alias("t_idx"), F.col("s.pid"),
        norm_lower(F.col("s.value")).alias("t_value"),
    )
    # even ids carry 'Singer' -> normalized 'singer' ∈ wd label set
    assert match_bio_claims(wd_claims, t_claims).count() == 100


def test_rotten_url_check_stub_and_custom_prober(spark):
    """P8: liveness flag per statement; pluggable prober is honored."""
    from soweego_spark.operators.validator import rotten_url_check

    stmts = spark.createDataFrame(
        [
            (1, "https://ok.example/a"),
            (2, "https://dead.example/b"),
            (3, "https://fine.example/c"),
        ],
        "tid long, url string",
    )
    got = {r["tid"]: r["alive"] for r in rotten_url_check(stmts).collect()}
    assert got == {1: True, 2: False, 3: True}

    def prober(urls):
        return [u.endswith("/c") for u in urls]

    got2 = {
        r["tid"]: r["alive"]
        for r in rotten_url_check(stmts, prober=prober).collect()
    }
    assert got2 == {1: False, 2: False, 3: True}


def test_greedy_first_match_sequential_not_windowed(spark):
    """The case rank-filter windows get WRONG: wd 3 loses its first choice
    (u, taken by wd 2) and must still get its second choice (t); and a
    later wd must NOT steal t in the meantime. Reference semantics
    (checks.py used-index walk): {(2,u), (3,t)}."""
    from soweego_spark.operators.validator import greedy_first_match

    cands = spark.createDataFrame(
        [(1, 2, 100), (1, 3, 100), (1, 3, 200), (1, 5, 200)],
        "tid long, wd_idx long, t_idx long",
    )
    got = {
        (r["wd_idx"], r["t_idx"])
        for r in greedy_first_match(cands, []).collect()
    }
    assert got == {(2, 100), (3, 200)}


def test_greedy_first_match_random_vs_python_replay(spark):
    """Property: on random bipartite candidate sets the operator equals a
    literal Python replay of the reference's sequential used-index walk."""
    import random

    from soweego_spark.operators.validator import greedy_first_match

    rng = random.Random(61)
    rows = []
    for tid in range(30):
        n_w, n_t = rng.randint(1, 8), rng.randint(1, 8)
        for w in range(n_w):
            for t in range(n_t):
                if rng.random() < 0.4:
                    rows.append((tid, w, t))
    cands = spark.createDataFrame(rows, "tid long, wd_idx long, t_idx long")
    got = {
        (r["tid"], r["wd_idx"], r["t_idx"])
        for r in greedy_first_match(cands, []).collect()
    }
    expected = set()
    by_tid: dict[int, list] = {}
    for tid, w, t in rows:
        by_tid.setdefault(tid, []).append((w, t))
    for tid, cand in by_tid.items():
        uw, ut = set(), set()
        for w, t in sorted(cand):
            if w in uw or t in ut:
                continue
            uw.add(w)
            ut.add(t)
            expected.add((tid, w, t))
    assert got == expected


def test_resolve_unmatched_claims_fallback(spark):
    """SO2 fallback (checks.py:913-917): unmatched target values resolve
    through the injected resolver; resolvable ones surface as distinct
    (tid, pid, t_qid) extras, matched rows never reach the resolver."""
    from soweego_spark.operators.validator import (
        match_bio_claims,
        resolve_unmatched_claims,
    )

    wd = spark.createDataFrame(
        [(1, 0, "occupation", "Q100", ["singer"])],
        "tid long, wd_idx long, pid string, qid string, values array<string>",
    )
    tgt = spark.createDataFrame(
        [
            (1, 0, "occupation", "singer"),     # matches -> consumed
            (1, 1, "occupation", "q42"),        # unmatched, resolvable
            (1, 2, "occupation", "q42"),        # duplicate value -> one extra
            (1, 3, "occupation", "gibberish"),  # unmatched, unresolvable
            (2, 0, "genre", "q7"),              # no wd at all -> resolvable
        ],
        "tid long, t_idx long, pid string, t_value string",
    )
    matched = match_bio_claims(wd, tgt)
    extra = {
        (r["tid"], r["pid"], r["t_qid"])
        for r in resolve_unmatched_claims(tgt, matched).collect()
    }
    assert extra == {(1, "occupation", "Q42"), (2, "genre", "Q7")}


def test_resolve_unmatched_claims_custom_resolver_batched(spark):
    """The injected resolver sees value BATCHES (one call per Arrow batch
    over distinct values), mirroring the S7/S8 injected-I/O pattern."""
    from soweego_spark.operators.validator import resolve_unmatched_claims

    tgt = spark.createDataFrame(
        [(1, i, "p", f"v{i % 4}") for i in range(40)],
        "tid long, t_idx long, pid string, t_value string",
    )
    empty_matched = spark.createDataFrame(
        [], "tid long, t_idx long, pid string, qid string, wd_idx long"
    )

    def resolver(values):
        assert isinstance(values, list) and len(values) >= 1
        return [f"Q{v[1:]}" if v.startswith("v") else None for v in values]

    got = {
        (r["tid"], r["pid"], r["t_qid"])
        for r in resolve_unmatched_claims(
            tgt, empty_matched, resolver=resolver
        ).collect()
    }
    assert got == {(1, "p", f"Q{i}") for i in range(4)}


def test_url_blacklist_case_and_subdomain(spark):
    """Uppercase schemes and subdomain mirrors must not evade the
    blacklist (the reference's substring loop caught both)."""
    from soweego_spark.operators.validator import url_blacklist_filter

    stmts = spark.createDataFrame(
        [
            (1, "HTTP://SPAM.EXAMPLE/x"),
            (2, "https://m.spam.example/y"),
            (3, "https://www.spam.example/z"),
            (4, "https://deep.mirror.spam.example/w"),
            (5, "https://fine.example/ok"),
            (6, "https://notspam.example/ok"),
        ],
        "sid long, url string",
    )
    kept = {r["sid"] for r in
            url_blacklist_filter(stmts, ["spam.example"]).collect()}
    assert kept == {5, 6}


def test_url_blacklist_preserves_caller_domain_column(spark):
    from soweego_spark.operators.validator import url_blacklist_filter

    stmts = spark.createDataFrame(
        [(1, "https://ok.example/a", "precomputed")],
        "sid long, url string, domain string",
    )
    out = url_blacklist_filter(stmts, ["spam.example"]).collect()
    assert out[0]["domain"] == "precomputed"
