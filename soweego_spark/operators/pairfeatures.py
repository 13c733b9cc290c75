"""Pair assembly + feature-vector computation (SURVEY.md §2.5, C1-C9).

``assemble_pairs``: the central 3-way equi-join — candidate pairs joined to
the signatures table twice (reference: Compare.compute's MultiIndex-aligned
lookup, workflow.py:422). Both sides are large at scale → sort-merge join;
AQE handles skewed keys.

``compute_features``: one column per feature.

JVM-native (whole-stage codegen, no Python):
  name_exact   C1 ExactMatch over normalized name lists  (features.py:76-128)
  url_exact    C1 over validated outbound URLs           (workflow.py:458-460)
  name_shared  C5 SharedTokens weighted Jaccard          (features.py:406-470)
  genre_shared C5 over genres                            (workflow.py:411-420)
  occ_shared   C6 SharedOccupations with the class closure precomputed as a
               broadcast map literal (no network in executors; the
               reference's Manager().dict() SPARQL cache, features.py:63-71)
  url_tok_shared C7 SharedTokensPlus over URL tokens with the URL stop-word
               list (features.py:568-665, workflow.py:462-470)

Arrow-batched pandas UDFs (Python kernels from functions.simkernels/dates):
  name_lev     C2 max Levenshtein similarity             (features.py:221-251)
  name_cos     C3 cosine over char_wb 2-grams            (workflow.py:485-494)
  desc_cos     C3 cosine with the soweego analyzer       (workflow.py:387-398)
  born_sim / died_sim  C4 SimilarDates                   (features.py:318-403)

Missing values fill with FEATURE_MISSING_VALUE = 0.0 (constants.py:359).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from soweego_spark.functions import dates as date_kernels
from soweego_spark.functions import simkernels
from soweego_spark.functions.textnorm import URL_STOPWORDS

FEATURE_MISSING_VALUE = 0.0

FEATURE_COLUMNS = [
    "name_exact",
    "name_lev",
    "name_cos",
    "name_shared",
    "url_exact",
    "url_tok_shared",
    "born_sim",
    "died_sim",
    "desc_cos",
    "occ_shared",
    "genre_shared",
]


def assemble_pairs(pairs: DataFrame, sig: DataFrame) -> DataFrame:
    """(url_a, url_b) -> wide pair rows with a_* / b_* signature columns."""
    feature_cols = [
        "name", "name_tokens", "urls", "url_tokens", "born_p", "died_p",
        "description", "description_tokens", "occupations", "genres",
    ]
    a = sig.select(
        F.col("url").alias("url_a"),
        *[F.col(c).alias(f"a_{c}") for c in feature_cols],
    )
    b = sig.select(
        F.col("url").alias("url_b"),
        *[F.col(c).alias(f"b_{c}") for c in feature_cols],
    )
    return pairs.join(a, "url_a").join(b, "url_b")


def _exact_list_match(a, b):
    """C1: max over cross-product equality == arrays_overlap; null/empty ->
    missing value."""
    return F.when(
        a.isNull() | b.isNull() | (F.size(a) == 0) | (F.size(b) == 0),
        F.lit(FEATURE_MISSING_VALUE),
    ).otherwise(F.arrays_overlap(a, b).cast("double"))


def _shared_tokens(a, b, band_words: list[str]):
    """C5: (|∩| - 0.9*|∩ ∩ band_words|) / |∪| with set semantics."""
    inter = F.array_intersect(a, b)
    union = F.array_union(a, b)
    penalty = (
        F.size(F.array_intersect(inter, F.array(*[F.lit(w) for w in band_words])))
        if band_words
        else F.lit(0)
    )
    score = (F.size(inter) - penalty * F.lit(0.9)) / F.size(union)
    return F.when(
        a.isNull() | b.isNull() | (F.size(F.array_union(a, b)) == 0),
        F.lit(FEATURE_MISSING_VALUE),
    ).otherwise(F.coalesce(score, F.lit(FEATURE_MISSING_VALUE)))


def _shared_ratio_min(a, b):
    """C6/C7 core: |∩| / min(|a|,|b|)."""
    smallest = F.least(F.size(a), F.size(b))
    return F.when(
        a.isNull() | b.isNull() | (smallest <= 0),
        F.lit(FEATURE_MISSING_VALUE),
    ).otherwise(F.size(F.array_intersect(a, b)) / smallest)


def _expand_with_closure(col, closure: dict[str, list[str]]):
    """Occupation class-closure expansion as a broadcast map literal."""
    if not closure:
        return col
    entries = []
    for code, related in closure.items():
        entries.append(
            F.struct(
                F.lit(code).alias("key"),
                F.array(*[F.lit(r) for r in related]).alias("value"),
            )
        )
    closure_map = F.map_from_entries(F.array(*entries))
    return F.when(col.isNull(), None).otherwise(
        F.array_distinct(
            F.flatten(
                F.filter(
                    F.transform(
                        col,
                        lambda c: F.coalesce(
                            closure_map.getItem(c), F.array(c)
                        ),
                    ),
                    lambda arr: arr.isNotNull(),
                )
            )
        )
    )


def _struct_rows_to_tuples(cell):
    if cell is None:
        return None
    out = []
    for item in cell:
        if item is None:
            continue
        if isinstance(item, dict):
            out.append(
                (item["y"], item["mo"], item["d"], item["h"], item["mi"],
                 item["s"], item["depth"])
            )
        else:
            out.append(tuple(item))
    return out or None


@F.pandas_udf(DoubleType())
def _lev_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            simkernels.levenshtein_max(
                list(x) if x is not None else None,
                list(y) if y is not None else None,
            )
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


@F.pandas_udf(DoubleType())
def _cos_charwb_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            simkernels.cosine_bow(
                list(x) if x is not None else None,
                list(y) if y is not None else None,
                analyzer="char_wb",
            )
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


@F.pandas_udf(DoubleType())
def _cos_soweego_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            simkernels.cosine_bow(
                [x] if x is not None else None,
                [y] if y is not None else None,
                analyzer="soweego",
            )
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


@F.pandas_udf(DoubleType())
def _date_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            date_kernels.date_pair_score(
                _struct_rows_to_tuples(x), _struct_rows_to_tuples(y)
            )
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


def compute_features(
    pair_rows: DataFrame,
    occupation_closure: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Wide pair rows -> (url_a, url_b, <FEATURE_COLUMNS...>), 0.0-filled."""
    band_words = sorted(simkernels.BAND_LOW_SCORE_WORDS)
    url_stop = sorted(URL_STOPWORDS)

    a_occ = _expand_with_closure(F.col("a_occupations"), occupation_closure or {})
    b_occ = _expand_with_closure(F.col("b_occupations"), occupation_closure or {})
    a_ut = F.array_except(
        F.col("a_url_tokens"), F.array(*[F.lit(w) for w in url_stop])
    )
    b_ut = F.array_except(
        F.col("b_url_tokens"), F.array(*[F.lit(w) for w in url_stop])
    )

    out = pair_rows.select(
        "url_a",
        "url_b",
        _exact_list_match(F.col("a_name"), F.col("b_name")).alias("name_exact"),
        _lev_udf("a_name_tokens", "b_name_tokens").alias("name_lev"),
        _cos_charwb_udf("a_name_tokens", "b_name_tokens").alias("name_cos"),
        _shared_tokens(
            F.col("a_name_tokens"), F.col("b_name_tokens"), band_words
        ).alias("name_shared"),
        _exact_list_match(F.col("a_urls"), F.col("b_urls")).alias("url_exact"),
        _shared_ratio_min(a_ut, b_ut).alias("url_tok_shared"),
        _date_sim_udf("a_born_p", "b_born_p").alias("born_sim"),
        _date_sim_udf("a_died_p", "b_died_p").alias("died_sim"),
        _cos_soweego_udf("a_description", "b_description").alias("desc_cos"),
        _shared_ratio_min(a_occ, b_occ).alias("occ_shared"),
        _shared_tokens(F.col("a_genres"), F.col("b_genres"), []).alias(
            "genre_shared"
        ),
    )
    return out.fillna(FEATURE_MISSING_VALUE, subset=FEATURE_COLUMNS)


def featurize(
    pairs: DataFrame,
    sig: DataFrame,
    occupation_closure: dict[str, list[str]] | None = None,
) -> DataFrame:
    return compute_features(
        assemble_pairs(pairs, sig), occupation_closure=occupation_closure
    )
