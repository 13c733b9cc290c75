"""Rule-based baseline linker (reference linker/baseline.py:38-166,264-440).

Three strategies over two signature tables (SURVEY.md §3.3, operators
B2/B3/J3/J4 + the F7 date filter), all pure DataFrame algebra:

* ``perfect_name_linker``   — B3/J3: exact match on lowercased names; the
  reference's 100-item bucket loop + n^2 micro nested loop becomes ONE
  equi-join on the normalized name (baseline.py:264-299).
* ``similar_names_linker``  — B2/J4: token-set containment in either
  direction (target ⊇ wd via boolean-mode FTS semantics, target ⊆ wd via
  the pandas re-check, baseline.py:305-354); both become token equi-joins
  + matched-count aggregates. Wikidata token sets of size <= 1 are skipped
  (baseline.py:328-329), subset-direction target sets must be > 1
  (baseline.py:350).
* ``date_agreement_filter`` — F7 (baseline.py:366-440): keep a pair when
  ANY (born, born) or (died, died) combination agrees on every attribute
  down to the shared precision (year/month/day — the catalog side is a
  SQL DATE); refuse when either side lacks dates, like the reference's
  all-loops-empty -> False.

Inputs are signature DataFrames with ``url``, ``name`` (lowercased list),
``name_tokens``, ``born_p``/``died_p`` (parsed date structs) — the
extract_signatures schema on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prefix_date_eq(lv, rv):
    """All attributes equal down to min(depth), year/month/day only."""
    shared = F.least(lv["depth"], rv["depth"])
    return (
        (lv["y"] == rv["y"])
        & ((shared < 1) | (lv["mo"] == rv["mo"]))
        & ((shared < 2) | (lv["d"] == rv["d"]))
    )


def _any_date_match(a, b):
    """True when any cross-product combination of two date lists agrees."""
    return (
        a.isNotNull()
        & b.isNotNull()
        & F.exists(a, lambda lv: F.exists(b, lambda rv: _prefix_date_eq(lv, rv)))
    )


def date_agreement_filter(pairs: DataFrame) -> DataFrame:
    """Keep pairs where born OR died dates agree (baseline.py:402-419).
    Expects a_born_p/b_born_p/a_died_p/b_died_p columns on the pair rows."""
    born_ok = _any_date_match(F.col("a_born_p"), F.col("b_born_p"))
    died_ok = _any_date_match(F.col("a_died_p"), F.col("b_died_p"))
    return pairs.filter(born_ok | died_ok)


def _with_sides(pairs: DataFrame, wd: DataFrame, target: DataFrame) -> DataFrame:
    cols = ["born_p", "died_p"]
    a = wd.select(
        F.col("url").alias("url_a"), *[F.col(c).alias(f"a_{c}") for c in cols]
    )
    b = target.select(
        F.col("url").alias("url_b"), *[F.col(c).alias(f"b_{c}") for c in cols]
    )
    return pairs.join(a, "url_a").join(b, "url_b")


def perfect_name_linker(
    wd: DataFrame, target: DataFrame, compare_dates: bool = True
) -> DataFrame:
    """B3/J3: lowercased-name equality; names are already normalized lists
    in the signature schema, so explode + equi-join."""
    l_names = wd.select(
        F.col("url").alias("url_a"), F.explode("name").alias("lname")
    ).filter(F.col("lname") != "")
    r_names = target.select(
        F.col("url").alias("url_b"), F.explode("name").alias("lname")
    ).filter(F.col("lname") != "")
    pairs = (
        l_names.join(r_names, "lname")
        .filter(F.col("url_a") != F.col("url_b"))
        .select("url_a", "url_b")
        .distinct()
    )
    if not compare_dates:
        return pairs
    return date_agreement_filter(_with_sides(pairs, wd, target)).select(
        "url_a", "url_b"
    )


def similar_names_linker(
    wd: DataFrame,
    target: DataFrame,
    compare_dates: bool = True,
    token_df_cap: int = 10_000,
) -> DataFrame:
    """B2/J4: token containment in either direction.

    superset direction: every wd token appears in the target's token set
    (boolean-mode ``+tok1 +tok2 ...``); subset direction: the target's
    token set (size > 1) is contained in the wd token set. Both reduce to
    one token equi-join + a matched-count aggregate compared against the
    respective set size.
    """
    l = wd.filter(F.size("name_tokens") > 1).select(
        F.col("url").alias("url_a"),
        F.col("name_tokens").alias("l_tokens"),
        F.size("name_tokens").alias("l_size"),
    )
    r = target.filter(F.size("name_tokens") > 0).select(
        F.col("url").alias("url_b"),
        F.col("name_tokens").alias("r_tokens"),
        F.size("name_tokens").alias("r_size"),
    )
    l_tok = l.select("url_a", "l_size", F.explode("l_tokens").alias("token"))
    r_tok = r.select("url_b", "r_size", F.explode("r_tokens").alias("token"))

    df_counts = r_tok.groupBy("token").agg(F.count("*").alias("df"))
    keep = df_counts.filter(F.col("df") <= token_df_cap).select("token")
    r_tok = r_tok.join(F.broadcast(keep), "token")

    matched = (
        l_tok.join(r_tok, "token")
        .filter(F.col("url_a") != F.col("url_b"))
        .groupBy("url_a", "url_b", "l_size", "r_size")
        .agg(F.count("*").alias("n_matched"))
    )
    pairs = matched.filter(
        (F.col("n_matched") == F.col("l_size"))  # wd ⊆ target (boolean FTS)
        | (
            (F.col("n_matched") == F.col("r_size"))
            & (F.col("r_size") > 1)  # target ⊆ wd, size > 1
        )
    ).select("url_a", "url_b")
    if not compare_dates:
        return pairs
    return date_agreement_filter(_with_sides(pairs, wd, target)).select(
        "url_a", "url_b"
    )


def extract_qid_links(target: DataFrame) -> DataFrame:
    """B4 (baseline.py:221-236): harvest (qid, tid) from catalog rows whose
    outbound URLs embed a Wikidata QID."""
    exploded = target.select(
        F.col("url").alias("tid"), F.explode("urls").alias("out_url")
    )
    with_qid = exploded.withColumn(
        "qid", F.regexp_extract("out_url", r"Q\d+", 0)
    )
    return (
        with_qid.filter(F.col("qid") != "")
        .select("qid", "tid")
        .distinct()
    )
