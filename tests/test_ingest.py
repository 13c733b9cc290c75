"""Statement-plan construction (operators/ingest.py) vs the reference's
wikidata_bot.py / mix_n_match_client.py decision matrices."""

from __future__ import annotations

from pyspark.sql import functions as F

from soweego_spark.operators import ingest as ig


def _existing(spark):
    return spark.createDataFrame(
        [
            ("Q1", "P1476", "some title"),
            ("Q1", ig.OFFICIAL_WEBSITE, "https://ex.org/a"),
            ("Q2", ig.TWITTER_USERNAME_PID, "JackDorsey"),
            ("Q4", "P345", "tt0000001"),
        ],
        "qid string, pid string, value string",
    )


def test_plan_claim_additions_decision_matrix(spark):
    proposed = spark.createDataFrame(
        [
            ("Q1", "P1476", "some title", "cat1"),       # exists -> reference
            ("Q1", "P973", "https://ex.org/a", "cat1"),  # OW same value
            ("Q2", ig.TWITTER_USERNAME_PID, "jackdorsey", "cat2"),  # ci match
            ("Q3", "P1476", "brand new", "cat3"),        # new -> add
            ("Q9", "P1476", "whatever", "cat9"),         # dead -> skip
        ],
        "qid string, pid string, value string, catalog_id string",
    )
    dead = spark.createDataFrame([("Q9",)], "qid string")
    plan = ig.plan_claim_additions(
        proposed,
        _existing(spark),
        heuristic="Q1266546",
        retrieved="2026-08-16",
        catalog_qid="Q14005",
        catalog_pid="P1953",
        dead_qids=dead,
    )
    got = {
        (r["qid"], r["pid"]): (r["action"], r["ref_target_pid"])
        for r in plan.collect()
    }
    assert got[("Q1", "P1476")] == ("add_reference", "P1476")
    assert got[("Q1", "P973")] == ("add_reference", ig.OFFICIAL_WEBSITE)
    assert got[("Q2", ig.TWITTER_USERNAME_PID)] == (
        "add_reference",
        ig.TWITTER_USERNAME_PID,
    )
    assert got[("Q3", "P1476")] == ("add_claim", "P1476")
    assert got[("Q9", "P1476")][0] == "skip_dead"

    # reference node shape: heuristic + stated-in + catalog id + retrieved
    row = plan.filter(F.col("qid") == "Q3").first()
    refs = [(x["pid"], x["value"]) for x in row["references"]]
    assert refs == [
        (ig.BASED_ON_HEURISTIC, "Q1266546"),
        (ig.STATED_IN, "Q14005"),
        ("P1953", "cat3"),
        (ig.RETRIEVED, "2026-08-16"),
    ]
    assert plan.filter(F.col("qid") == "Q9").first()["references"] is None


def test_case_sensitivity_only_for_social_pids(spark):
    """'jackdorsey' != 'JackDorsey' under a NON-social pid -> add_claim."""
    proposed = spark.createDataFrame(
        [("Q2", "P1476", "jackdorsey")], "qid string, pid string, value string"
    )
    existing = spark.createDataFrame(
        [("Q2", "P1476", "JackDorsey")], "qid string, pid string, value string"
    )
    plan = ig.plan_claim_additions(
        proposed, existing, heuristic="Q1", retrieved="2026-08-16"
    )
    assert plan.first()["action"] == "add_claim"


def test_redirect_chain_resolution(spark):
    proposed = spark.createDataFrame(
        [("Q10", "P1476", "t")], "qid string, pid string, value string"
    )
    redirects = spark.createDataFrame(
        [("Q10", "Q11"), ("Q11", "Q12")], "from_qid string, to_qid string"
    )
    existing = spark.createDataFrame(
        [("Q12", "P1476", "t")], "qid string, pid string, value string"
    )
    plan = ig.plan_claim_additions(
        proposed, existing, heuristic="Q1", retrieved="2026-08-16",
        redirects=redirects,
    )
    row = plan.first()
    # the subject followed the chain Q10 -> Q11 -> Q12 and found the claim
    assert (row["qid"], row["action"]) == ("Q12", "add_reference")


def test_parse_statement_value_typing(spark):
    df = spark.createDataFrame(
        [("Q42",), ("Q42abc",), ("1984-11-16/11",), ("1984-13-99/11",),
         ("plain text",)],
        "value string",
    ).select("value", ig.parse_statement_value(F.col("value")).alias("p"))
    got = {r["value"]: r["p"].asDict() for r in df.collect()}
    assert got["Q42"]["value_type"] == "item"
    # re.match takes the Q-prefix of 'Q42abc' — reference parity
    assert got["Q42abc"]["item_qid"] == "Q42"
    assert got["1984-11-16/11"]["value_type"] == "time"
    assert got["1984-11-16/11"]["time_precision"] == 11
    assert str(got["1984-11-16/11"]["time_value"]) == "1984-11-16"
    # invalid calendar date falls back to string, like date.fromisoformat
    assert got["1984-13-99/11"]["value_type"] == "string"
    assert got["plain text"]["value_type"] == "string"


def test_plan_identifier_actions(spark):
    invalid = spark.createDataFrame(
        [("Q4", "tt0000001"), ("Q4", "tt9999999")], "qid string, tid string"
    )
    plan = ig.plan_identifier_actions(
        invalid, _existing(spark), catalog_pid="P345", action="deprecate"
    )
    got = {(r["qid"], r["tid"]): r["action"] for r in plan.collect()}
    assert got[("Q4", "tt0000001")] == "deprecate"
    assert got[("Q4", "tt9999999")] == "error_missing_claim"


def test_plan_mnm_entries(spark):
    matches = spark.createDataFrame(
        [("Q1", "a1", 0.9), ("Q2", "a2", 0.4), ("Q3", "a3", 0.8)],
        "qid string, tid string, score double",
    )
    curated = spark.createDataFrame([("a3",)], "tid string")
    plan = ig.plan_mnm_entries(
        matches,
        catalog_id=77,
        class_qid="Q5",
        timestamp="20260816120000",
        curated=curated,
        url_prefix="https://cat.example/",
        confidence_range=(0.5, 1.0),
    )
    rows = {r["ext_id"]: r.asDict() for r in plan.collect()}
    # a2 below range, a3 curated -> only a1 remains
    assert set(rows) == {"a1"}
    e = rows["a1"]
    assert e["catalog"] == 77 and e["q"] == 1 and e["ext_name"] == "a1"
    assert e["ext_url"] == "https://cat.example/a1"
    assert e["ext_desc"] == "soweego confidence score: 0.9"
    assert e["user"] == 0 and e["timestamp"] == "20260816120000"
    assert e["type"] == "Q5"


def test_plan_feeds_payload_emitter(spark, tmpdir):
    """The plan rows ARE the upload payloads: compose with the S13 sink."""
    import glob
    import json

    from soweego_spark.sources.remote import emit_statements, jsonl_dir_emitter

    proposed = spark.createDataFrame(
        [("Q3", "P1476", "brand new")], "qid string, pid string, value string"
    )
    existing = spark.createDataFrame(
        [], "qid string, pid string, value string"
    )
    plan = ig.plan_claim_additions(
        proposed, existing, heuristic="Q1266546", retrieved="2026-08-16"
    )
    out = f"{tmpdir}/payloads"
    emit_statements(plan, jsonl_dir_emitter(out), batch_size=10)
    rows = []
    for f in glob.glob(f"{out}/part-*.jsonl"):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 1
    assert rows[0]["action"] == "add_claim"
    assert rows[0]["references"][0]["pid"] == ig.BASED_ON_HEURISTIC


def test_plan_works_statements_imdb_matrix(spark):
    """Works flavour (wikidata_bot.py:450-509): non-QID person skipped,
    IMDb same-object check references the FIRST movie pid in vocabulary
    order that already points at the person, plain matches reference
    their own pid, novel links become claims."""
    existing = spark.createDataFrame(
        [
            ("Q1", "P57", "Q77"),    # director already = person
            ("Q1", "P161", "Q77"),   # ALSO cast member (P161 wins: order)
            ("Q2", "P58", "Q88"),    # screenwriter claim, exact pid match
        ],
        "qid string, pid string, value string",
    )
    proposed = spark.createDataFrame(
        [
            ("Q1", "P162", "Q77", "tt1"),      # person under other pids
            ("Q2", "P58", "Q88", "tt2"),       # exact claim exists
            ("Q3", "P57", "Q99", "tt3"),       # novel
            ("Q4", "P57", "not-a-qid", "tt4"), # invalid person
        ],
        "qid string, pid string, value string, catalog_id string",
    )
    plan = ig.plan_works_statements(
        proposed, existing, heuristic="Q1266546", retrieved="2026-08-16",
        catalog_qid="Q14005", catalog_pid="P345", is_imdb=True,
    )
    got = {
        r["qid"]: (r["action"], r["ref_target_pid"], r["person_qid"])
        for r in plan.collect()
    }
    assert got["Q1"] == ("add_reference", "P161", "Q77")
    assert got["Q2"] == ("add_reference", "P58", "Q88")
    assert got["Q3"] == ("add_claim", "P57", "Q99")
    assert got["Q4"][0] == "skip_invalid_value"
    assert got["Q4"][2] is None


def test_plan_works_statements_non_imdb_skips_movie_sweep(spark):
    """Without is_imdb the cross-pid same-object check must NOT fire."""
    existing = spark.createDataFrame(
        [("Q1", "P57", "Q77")], "qid string, pid string, value string"
    )
    proposed = spark.createDataFrame(
        [("Q1", "P162", "Q77")], "qid string, pid string, value string"
    )
    plan = ig.plan_works_statements(
        proposed, existing, heuristic="Q1", retrieved="2026-08-16",
        is_imdb=False,
    )
    assert plan.first()["action"] == "add_claim"


def test_null_values_become_skips_not_uploads(spark):
    """NULL statement values can neither match nor upload: both planners
    must keep them auditable as skip_invalid_value, and mnm planning must
    drop malformed qids instead of throwing under ANSI."""
    existing = spark.createDataFrame(
        [], "qid string, pid string, value string"
    )
    proposed = spark.createDataFrame(
        [("Q1", "P1476", None)], "qid string, pid string, value string"
    )
    row = ig.plan_claim_additions(
        proposed, existing, heuristic="Q1", retrieved="2026-08-16"
    ).first()
    assert row["action"] == "skip_invalid_value"
    assert row["references"] is None

    works_row = ig.plan_works_statements(
        proposed, existing, heuristic="Q1", retrieved="2026-08-16"
    ).first()
    assert works_row["action"] == "skip_invalid_value"

    matches = spark.createDataFrame(
        [("Q1", "a", 0.9), ("q2", "b", 0.9), ("urn:x", "c", 0.9)],
        "qid string, tid string, score double",
    )
    plan = ig.plan_mnm_entries(
        matches, catalog_id=1, class_qid="Q5", timestamp="20260816000000"
    ).collect()
    # 'q2' strips no 'Q' prefix and try_casts to NULL; 'urn:x' likewise —
    # only the well-formed row survives, nothing throws
    assert [(r["ext_id"], r["q"]) for r in plan] == [("a", 1)]


def test_bounded_precision_is_string_not_crash(spark):
    df = spark.createDataFrame(
        [("2020-01-01/99999999999",), ("2020-01-01/9",)], "value string"
    ).select("value", ig.parse_statement_value(F.col("value")).alias("p"))
    got = {r["value"]: r["p"].asDict() for r in df.collect()}
    assert got["2020-01-01/99999999999"]["value_type"] == "string"
    assert got["2020-01-01/9"]["value_type"] == "time"
