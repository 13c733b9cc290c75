"""Statement-plan construction for the ingestion sinks (S13/S14 semantics).

The reference's ``ingester/wikidata_bot.py`` mutates live items one API
call at a time — redirect resolution, dead-item checks, existing-claim
lookups, claim + reference-node construction, delete/deprecate — and
``ingester/mix_n_match_client.py`` bulk-inserts curation DB entries. The
Spark-first mapping re-expresses ALL of that decision logic as set
operations over two tables: the proposed statements and the existing
claims (at production scale, the Wikidata JSON dump ingested as parquet).
The output is a deterministic ACTION-PLAN DataFrame whose rows are the
exact payloads an uploader writes (compose with ``emit_statements`` +
``jsonl_dir_emitter``, sources/remote.py); the only thing left at the API
boundary is replaying the plan row by row.

Reference parity map:
  resolve_redirects        wikidata_bot.py:655-668 (_handle_redirect_and_dead
                           redirect walk, as a bounded iterative join)
  parse_statement_value    wikidata_bot.py:750-771 (_parse_value: QID ->
                           item, 'YYYY-MM-DD/precision' -> time, else str)
  plan_claim_additions     wikidata_bot.py:509-661 (_add_or_reference +
                           _check_for_same_value + _handle_addition:
                           add_claim vs add_reference, official-website
                           same-value check, case-insensitive social IDs)
  reference_node           wikidata_bot.py:806-861 (_reference: based-on-
                           heuristic + stated-in + catalog-id + retrieved)
  plan_identifier_actions  wikidata_bot.py:865-908 (_delete_or_deprecate)
  plan_mnm_entries         mix_n_match_client.py:182-309,453-465
                           (curated-match exclusion, confidence range,
                           MnM entry field construction)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Public Wikidata vocabulary (reference wikidata/vocabulary.py:29-55)
BASED_ON_HEURISTIC = "P887"
STATED_IN = "P248"
RETRIEVED = "P813"
OFFICIAL_WEBSITE = "P856"
FACEBOOK_PID = "P2013"
TWITTER_USERNAME_PID = "P2002"
CASE_INSENSITIVE_PIDS = (FACEBOOK_PID, TWITTER_USERNAME_PID)

_QID_PREFIX = r"^Q\d+"
# precision bounded to 2 digits: Wikidata time precisions are 0-14, and
# an unbounded \d+ capture would overflow the int cast (ANSI throws)
_DATE_SLASH = r"^(\d{4}-\d{2}-\d{2})/(\d{1,2})$"


def parse_statement_value(value):
    """_parse_value as a typed struct column: ``value_type`` in
    ``('item', 'time', 'string')`` plus the typed fields.

    Mirrors the reference exactly: an anchored ``Q\\d+`` PREFIX wins (the
    reference's ``re.match(...).group()`` takes the matched prefix of e.g.
    'Q42abc'); otherwise a ``date/precision`` split parsed as an ISO date;
    anything else stays a plain string.
    """
    qid = F.regexp_extract(value, _QID_PREFIX, 0)
    date_str = F.regexp_extract(value, _DATE_SLASH, 1)
    precision = F.regexp_extract(value, _DATE_SLASH, 2)
    # try_to_date, not to_date: ANSI mode THROWS on the invalid calendar
    # dates the reference catches as ValueError (build note)
    parsed_date = F.try_to_date(date_str, "yyyy-MM-dd")
    is_item = qid != ""
    is_time = (date_str != "") & parsed_date.isNotNull()
    return F.struct(
        F.when(is_item, F.lit("item"))
        .when(is_time, F.lit("time"))
        .otherwise(F.lit("string"))
        .alias("value_type"),
        F.when(is_item, qid).alias("item_qid"),
        F.when(is_time, parsed_date).alias("time_value"),
        F.when(is_time, precision.cast("int")).alias("time_precision"),
        F.when(~is_item & ~is_time, value).alias("string_value"),
    )


def resolve_redirects(
    df: DataFrame,
    redirects: DataFrame | None,
    qid_col: str = "qid",
    max_hops: int = 5,
) -> DataFrame:
    """Follow item redirects to their target (the reference's
    ``while item.isRedirectPage()`` walk) as ``max_hops`` broadcast left
    joins — redirect chains on Wikidata are nearly always depth 1 and the
    redirect table is tiny relative to the lake, so each hop is a
    broadcast probe, never a shuffle of ``df``."""
    if redirects is None:
        return df
    # distinct: a duplicated redirect row must not multiply subjects
    r = redirects.select(
        F.col("from_qid").alias("__r_from"), F.col("to_qid").alias("__r_to")
    ).distinct()
    out = df
    for _ in range(max_hops):
        out = (
            out.join(
                F.broadcast(r), out[qid_col] == F.col("__r_from"), "left"
            )
            .withColumn(qid_col, F.coalesce("__r_to", qid_col))
            .drop("__r_from", "__r_to")
        )
    return out


def reference_node(
    heuristic: str,
    retrieved: str,
    catalog_qid: str | None = None,
    catalog_pid: str | None = None,
    catalog_id_col=None,
):
    """The reference node as ``array<struct<pid,value>>`` — (based on
    heuristic, h), optional (stated in, catalog), optional (catalog
    property, catalog id), (retrieved, date). ``retrieved`` is an explicit
    ISO date passed by the caller: plans must be deterministic, so wall
    clock never enters the engine."""
    parts = [
        F.struct(
            F.lit(BASED_ON_HEURISTIC).alias("pid"),
            F.lit(heuristic).alias("value"),
        )
    ]
    if catalog_qid is not None:
        parts.append(
            F.struct(
                F.lit(STATED_IN).alias("pid"), F.lit(catalog_qid).alias("value")
            )
        )
    if catalog_pid is not None and catalog_id_col is not None:
        parts.append(
            F.struct(
                F.lit(catalog_pid).alias("pid"),
                catalog_id_col.cast("string").alias("value"),
            )
        )
    parts.append(
        F.struct(F.lit(RETRIEVED).alias("pid"), F.lit(retrieved).alias("value"))
    )
    return F.array(*parts)


def _ci_norm(pid, value):
    """Case-insensitive comparison value for the social-ID PIDs
    (wikidata_bot.py:550-556)."""
    return F.when(
        pid.isin(*CASE_INSENSITIVE_PIDS), F.lower(value)
    ).otherwise(value)


def plan_claim_additions(
    proposed: DataFrame,
    existing: DataFrame,
    heuristic: str,
    retrieved: str,
    catalog_qid: str | None = None,
    catalog_pid: str | None = None,
    dead_qids: DataFrame | None = None,
    redirects: DataFrame | None = None,
) -> DataFrame:
    """The _add_or_reference decision matrix over whole tables.

    ``proposed(qid, pid, value[, catalog_id])`` vs
    ``existing(qid, pid, value)`` ->
    ``(qid, pid, value, parsed_value, action, ref_target_pid, references)``
    with action:

    * ``skip_dead``      — subject in ``dead_qids`` (after redirect
                           resolution), nothing to upload
                           (wikidata_bot.py:655-668)
    * ``add_reference``  — the claim already exists: same (qid, pid,
                           value) — case-insensitive for the social PIDs —
                           OR the official-website property already holds
                           the value (the Jura1 check, checked FIRST like
                           the reference); ``ref_target_pid`` names the
                           claim that receives the reference node
    * ``add_claim``      — no such claim anywhere: upload claim +
                           reference node

    Every comparison is an equi-join: existing claims are aggregated per
    (qid, pid, normalized value) and (qid, official-website value), both
    probed with plain hash joins — Catalyst broadcasts whichever side is
    small, and at dump scale AQE handles the skewed heads.
    """
    p = resolve_redirects(proposed, redirects, "qid")
    if dead_qids is not None:
        # distinct: a duplicated dead-list row must not multiply proposals
        dead = dead_qids.select(
            F.col("qid").alias("__dead_qid"), F.lit(True).alias("__dead")
        ).distinct()
        p = p.join(
            F.broadcast(dead), p["qid"] == F.col("__dead_qid"), "left"
        ).drop("__dead_qid")
    else:
        p = p.withColumn("__dead", F.lit(None).cast("boolean"))

    p = p.withColumn("__norm", _ci_norm(F.col("pid"), F.col("value")))

    same_claim = (
        existing.select(
            "qid", "pid", _ci_norm(F.col("pid"), F.col("value")).alias("__norm")
        )
        .distinct()
        .withColumn("__has_claim", F.lit(True))
    )
    same_website = (
        existing.filter(F.col("pid") == OFFICIAL_WEBSITE)
        .select("qid", F.col("value").alias("__norm"))
        .distinct()
        .withColumn("__has_website", F.lit(True))
    )

    j = p.join(same_claim, ["qid", "pid", "__norm"], "left").join(
        same_website, ["qid", "__norm"], "left"
    )

    action = (
        F.when(F.col("__dead"), F.lit("skip_dead"))
        # a NULL value can neither match nor upload; keep it auditable
        .when(F.col("value").isNull(), F.lit("skip_invalid_value"))
        .when(F.col("__has_website"), F.lit("add_reference"))
        .when(F.col("__has_claim"), F.lit("add_reference"))
        .otherwise(F.lit("add_claim"))
    )
    ref_target = (
        F.when(
            F.col("__dead") | F.col("value").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col("__has_website"), F.lit(OFFICIAL_WEBSITE))
        .when(F.col("__has_claim"), F.col("pid"))
        .otherwise(F.col("pid"))
    )
    cat_col = (
        F.col("catalog_id") if "catalog_id" in proposed.columns else None
    )
    refs = reference_node(
        heuristic,
        retrieved,
        catalog_qid=catalog_qid,
        catalog_pid=catalog_pid,
        catalog_id_col=cat_col,
    )
    keep = [c for c in proposed.columns]
    return j.select(
        *keep,
        parse_statement_value(F.col("value")).alias("parsed_value"),
        action.alias("action"),
        ref_target.alias("ref_target_pid"),
        F.when(action.isin("add_claim", "add_reference"), refs).alias(
            "references"
        ),
    )


# Movie -> person properties, probed in THIS order by the IMDb
# same-object check (reference wikidata/vocabulary.py:223-228)
MOVIE_PIDS = ("P161", "P57", "P162", "P58", "P3092")


def plan_works_statements(
    proposed: DataFrame,
    existing: DataFrame,
    heuristic: str,
    retrieved: str,
    catalog_qid: str | None = None,
    catalog_pid: str | None = None,
    is_imdb: bool = False,
    dead_qids: DataFrame | None = None,
    redirects: DataFrame | None = None,
) -> DataFrame:
    """The works flavour of claim planning (_add_or_reference_works,
    wikidata_bot.py:450-509): ``proposed(qid, pid, value[, catalog_id])``
    where ``value`` must be a person QID — non-QID values are kept in the
    plan as ``skip_invalid_value`` (the reference logs and skips). With
    ``is_imdb`` the same-object check runs across ALL movie person
    properties first: a claim under any of MOVIE_PIDS already pointing at
    this person receives the reference instead (first matching pid in
    vocabulary order wins, like the reference's loop). No
    official-website check in this flavour — the works path doesn't do
    one.
    """
    p = resolve_redirects(proposed, redirects, "qid")
    if dead_qids is not None:
        dead = dead_qids.select(
            F.col("qid").alias("__dead_qid"), F.lit(True).alias("__dead")
        ).distinct()
        p = p.join(
            F.broadcast(dead), p["qid"] == F.col("__dead_qid"), "left"
        ).drop("__dead_qid")
    else:
        p = p.withColumn("__dead", F.lit(None).cast("boolean"))
    person_qid = F.regexp_extract(F.col("value"), _QID_PREFIX, 0)
    p = p.withColumn("__person", person_qid)

    same_claim = (
        existing.select("qid", "pid", F.col("value").alias("__person"))
        .distinct()
        .withColumn("__has_claim", F.lit(True))
    )
    j = p.join(same_claim, ["qid", "pid", "__person"], "left")
    if is_imdb:
        rank_expr = " ".join(
            f"WHEN pid = '{mp}' THEN {i}" for i, mp in enumerate(MOVIE_PIDS)
        )
        movie = (
            existing.filter(F.col("pid").isin(*MOVIE_PIDS))
            .select("qid", "pid", F.col("value").alias("__person"))
            .distinct()
            .withColumn("__rank", F.expr(f"CASE {rank_expr} END"))
            .groupBy("qid", "__person")
            .agg(F.min_by("pid", "__rank").alias("__movie_pid"))
        )
        j = j.join(movie, ["qid", "__person"], "left")
    else:
        j = j.withColumn("__movie_pid", F.lit(None).cast("string"))

    invalid_person = F.col("__person").isNull() | (F.col("__person") == "")
    action = (
        F.when(F.col("__dead"), F.lit("skip_dead"))
        .when(invalid_person, F.lit("skip_invalid_value"))
        .when(F.col("__movie_pid").isNotNull(), F.lit("add_reference"))
        .when(F.col("__has_claim"), F.lit("add_reference"))
        .otherwise(F.lit("add_claim"))
    )
    ref_target = (
        F.when(F.col("__dead") | invalid_person, F.lit(None))
        .when(F.col("__movie_pid").isNotNull(), F.col("__movie_pid"))
        .otherwise(F.col("pid"))
    )
    cat_col = (
        F.col("catalog_id") if "catalog_id" in proposed.columns else None
    )
    refs = reference_node(
        heuristic,
        retrieved,
        catalog_qid=catalog_qid,
        catalog_pid=catalog_pid,
        catalog_id_col=cat_col,
    )
    keep = [c for c in proposed.columns]
    return j.select(
        *keep,
        F.when(F.col("__person") != "", F.col("__person")).alias(
            "person_qid"
        ),
        action.alias("action"),
        ref_target.alias("ref_target_pid"),
        F.when(action.isin("add_claim", "add_reference"), refs).alias(
            "references"
        ),
    )


def plan_identifier_actions(
    invalid: DataFrame,
    existing: DataFrame,
    catalog_pid: str,
    action: str,
    redirects: DataFrame | None = None,
) -> DataFrame:
    """_delete_or_deprecate over whole tables: ``invalid(qid, tid)``
    rows whose identifier claim exists get the requested ``action``
    (``delete`` removes the claim, ``deprecate`` changes its rank);
    rows whose claim is missing surface as ``error_missing_claim`` —
    the reference logs these, a plan keeps them auditable."""
    assert action in ("delete", "deprecate"), action
    inv = resolve_redirects(invalid, redirects, "qid")
    ident = (
        existing.filter(F.col("pid") == catalog_pid)
        .select("qid", F.col("value").alias("tid"))
        .distinct()
        .withColumn("__has_ident", F.lit(True))
    )
    j = inv.join(ident, ["qid", "tid"], "left")
    return j.select(
        "qid",
        "tid",
        F.lit(catalog_pid).alias("catalog_pid"),
        F.when(F.col("__has_ident"), F.lit(action))
        .otherwise(F.lit("error_missing_claim"))
        .alias("action"),
    )


def plan_mnm_entries(
    matches: DataFrame,
    catalog_id: int,
    class_qid: str,
    timestamp: str,
    curated: DataFrame | None = None,
    url_prefix: str | None = None,
    confidence_range: tuple[float, float] = (0.0, 1.0),
) -> DataFrame:
    """Mix'n'match entry construction: ``matches(qid, tid, score)`` ->
    the MnM entry table rows (mix_n_match_client.py:453-465), keeping
    curated matches untouched (anti join on their tids — the reference's
    ``~matches.tid.isin(curated)``) and honouring the confidence range.
    ``timestamp`` ('YYYYmmddHHMMSS') is caller-supplied for determinism.
    """
    lo, hi = confidence_range
    # try_cast + filter: a malformed qid must drop the ROW, not throw
    # NumberFormatException under ANSI and kill the whole plan build
    q_num = F.regexp_replace(F.col("qid"), r"^Q", "").try_cast("long")
    m = matches.filter(
        (F.col("score") >= F.lit(lo))
        & (F.col("score") <= F.lit(hi))
        & q_num.isNotNull()
    )
    if curated is not None:
        m = m.join(
            curated.select(F.col("tid")).distinct(), "tid", "left_anti"
        )
    url = (
        F.concat(F.lit(url_prefix), F.col("tid"))
        if url_prefix is not None
        else F.lit("")
    )
    return m.select(
        F.lit(catalog_id).alias("catalog"),
        F.regexp_replace(F.col("qid"), r"^Q", "").try_cast("long").alias("q"),
        F.col("tid").alias("ext_id"),
        F.col("tid").alias("ext_name"),
        url.alias("ext_url"),
        F.lit(class_qid).alias("type"),
        F.concat(
            F.lit("soweego confidence score: "), F.col("score").cast("string")
        ).alias("ext_desc"),
        F.lit(0).alias("user"),
        F.lit(timestamp).alias("timestamp"),
    )
