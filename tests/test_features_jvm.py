"""JVM feature expressions vs the Python kernels (the tested oracles).

compute_features is 100% JVM-side expressions; the Python kernels in
functions.simkernels / functions.dates carry the reference parity
(tests/test_parity_*). This closes the loop: expression == kernel on every
candidate pair of the synthetic fixture, to float exactness.
"""

from __future__ import annotations

import math

import pytest

from soweego_spark.functions import dates as date_kernels
from soweego_spark.functions import simkernels
from soweego_spark.operators import blocking as blk
from soweego_spark.operators import pairfeatures as pf
from soweego_spark.operators.extract import extract_signatures
from soweego_spark.sources.pages import generate_pages, pages_to_spark


@pytest.fixture(scope="module")
def pair_rows_and_features(spark):
    fx = generate_pages(n_entities=120, seed=7)
    pages, *_ = pages_to_spark(spark, fx)
    sig = extract_signatures(pages).cache()
    pairs = blk.block_candidates(sig)
    pair_rows = pf.assemble_pairs(pairs, sig).cache()
    feats = pf.compute_features(pair_rows)
    joined = pair_rows.join(feats, ["url_a", "url_b"]).collect()
    assert len(joined) > 300
    return joined


def _close(a, b):
    if a is None or b is None:
        return (a or 0.0) == (b or 0.0)
    return math.isclose(a, b, rel_tol=0, abs_tol=1e-12)


def test_name_lev_matches_kernel(pair_rows_and_features):
    for r in pair_rows_and_features:
        truth = simkernels.levenshtein_max(r["a_name_tokens"], r["b_name_tokens"])
        assert _close(r["name_lev"], truth), (
            r["url_a"], r["url_b"], r["name_lev"], truth)


def test_name_cos_matches_kernel(pair_rows_and_features):
    for r in pair_rows_and_features:
        truth = simkernels.cosine_bow(
            r["a_name_tokens"], r["b_name_tokens"], analyzer="char_wb"
        )
        assert _close(r["name_cos"], truth), (
            r["url_a"], r["url_b"], r["name_cos"], truth)


def test_desc_cos_matches_kernel(pair_rows_and_features, spark):
    # description is deliberately NOT shipped through the pair join (only
    # the precomputed count maps are); fetch it separately for the oracle.
    fx = generate_pages(n_entities=120, seed=7)
    pages, *_ = pages_to_spark(spark, fx)
    sig = extract_signatures(pages)
    desc = {r["url"]: r["description"] for r in sig.select("url", "description").collect()}
    for r in pair_rows_and_features:
        da, db = desc.get(r["url_a"]), desc.get(r["url_b"])
        truth = simkernels.cosine_bow(
            [da] if da is not None else None,
            [db] if db is not None else None,
            analyzer="soweego",
        )
        assert _close(r["desc_cos"], truth), (
            r["url_a"], r["url_b"], r["desc_cos"], truth)


def _rows_to_tuples(cell):
    if cell is None:
        return None
    return [
        (v["y"], v["mo"], v["d"], v["h"], v["mi"], v["s"], v["depth"])
        for v in cell
        if v is not None
    ] or None


def test_date_sim_matches_kernel(pair_rows_and_features):
    for r in pair_rows_and_features:
        for side in ("born", "died"):
            truth = date_kernels.date_pair_score(
                _rows_to_tuples(r[f"a_{side}_p"]), _rows_to_tuples(r[f"b_{side}_p"])
            )
            assert _close(r[f"{side}_sim"], truth), (
                r["url_a"], r["url_b"], side, r[f"{side}_sim"], truth)


def test_jaro_winkler_kernel_published_values():
    """Kernel pinned to the published Winkler examples."""
    from soweego_spark.functions.simkernels import jaro, jaro_winkler

    assert abs(jaro("MARTHA", "MARHTA") - 0.9444444444) < 1e-9
    assert abs(jaro_winkler("MARTHA", "MARHTA") - 0.9611111111) < 1e-9
    assert abs(jaro("DIXON", "DICKSONX") - 0.7666666667) < 1e-9
    assert abs(jaro_winkler("DIXON", "DICKSONX") - 0.8133333333) < 1e-9
    assert jaro_winkler("same", "same") == 1.0
    assert jaro("abc", "xyz") == 0.0


def test_name_jw_feature_matches_kernel(spark):
    """The opt-in name_jw feature (Arrow-batched UDF) equals the kernel's
    cross-product max on assembled pair rows."""
    from pyspark.sql import functions as F

    from soweego_spark.functions.simkernels import jaro_winkler_max
    from soweego_spark.operators.pairfeatures import (
        assemble_pairs,
        compute_features,
    )

    sig = spark.createDataFrame(
        [
            ("u1", ["martha", "stewart"]),
            ("u2", ["marhta", "stuart"]),
            ("u3", ["dixon"]),
            ("u4", None),
        ],
        "url string, name_tokens array<string>",
    ).select(
        "url", "name_tokens",
        F.col("name_tokens").alias("name"),
        F.lit(None).cast("array<string>").alias("urls"),
        F.lit(None).cast("array<string>").alias("url_tokens"),
        F.lit(None).cast("array<struct<y:int,mo:int,d:int,h:int,mi:int,s:int,depth:int>>").alias("born_p"),
        F.lit(None).cast("array<struct<y:int,mo:int,d:int,h:int,mi:int,s:int,depth:int>>").alias("died_p"),
        F.lit(None).cast("array<string>").alias("occupations"),
        F.lit(None).cast("array<string>").alias("genres"),
        F.lit(None).cast("map<string,int>").alias("name_bigrams"),
        F.lit(None).cast("double").alias("name_bigram_norm"),
        F.lit(None).cast("map<string,int>").alias("desc_terms"),
        F.lit(None).cast("double").alias("desc_norm"),
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u1", "u4")],
        "url_a string, url_b string",
    )
    rows = assemble_pairs(pairs, sig)
    got = {
        (r["url_a"], r["url_b"]): r["name_jw"]
        for r in compute_features(rows, include_jw=True).collect()
    }
    toks = {"u1": ["martha", "stewart"], "u2": ["marhta", "stuart"],
            "u3": ["dixon"], "u4": None}
    for (a, b), v in got.items():
        truth = jaro_winkler_max(toks[a], toks[b])
        if truth is None:
            assert v == 0.0  # missing-value fill
        else:
            assert abs(v - truth) < 1e-12, (a, b, v, truth)


def test_name_shared_band_hoist_matches_fallback(spark):
    """r7: the band penalty precomputed per DOCUMENT in assemble_pairs
    (name_tokens_band) must score identically to the per-pair fallback
    that intersects against the literal band-word array — including pairs
    whose intersection contains band words, empty sides, and nulls."""
    from pyspark.sql import functions as F

    from soweego_spark.operators.pairfeatures import (
        assemble_pairs,
        compute_features,
    )

    sig = spark.createDataFrame(
        [
            ("u1", ["band", "club", "martha"]),
            ("u2", ["band", "club", "marhta"]),
            ("u3", ["band", "dixon"]),
            ("u4", ["dixon", "zz"]),
            ("u5", []),
            ("u6", None),
        ],
        "url string, name_tokens array<string>",
    ).select(
        "url", "name_tokens",
        F.col("name_tokens").alias("name"),
        F.lit(None).cast("array<string>").alias("urls"),
        F.lit(None).cast("array<string>").alias("url_tokens"),
        F.lit(None).cast("array<string>").alias("occupations"),
        F.lit(None).cast("array<string>").alias("genres"),
        F.lit(None).cast(
            "array<struct<y:int,mo:int,d:int,h:int,mi:int,s:int,depth:int>>"
        ).alias("born_p"),
        F.lit(None).cast(
            "array<struct<y:int,mo:int,d:int,h:int,mi:int,s:int,depth:int>>"
        ).alias("died_p"),
        F.lit(None).cast("map<string,int>").alias("name_bigrams"),
        F.lit(None).cast("double").alias("name_bigram_norm"),
        F.lit(None).cast("map<string,int>").alias("desc_terms"),
        F.lit(None).cast("double").alias("desc_norm"),
    )
    pairs = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u3", "u4"), ("u4", "u5"),
         ("u5", "u6"), ("u1", "u6")],
        "url_a string, url_b string",
    )
    rows = assemble_pairs(pairs, sig)
    assert "a_name_tokens_band" in rows.columns
    hoisted = {
        (r["url_a"], r["url_b"]): r["name_shared"]
        for r in compute_features(rows).collect()
    }
    fallback = {
        (r["url_a"], r["url_b"]): r["name_shared"]
        for r in compute_features(
            rows.drop("a_name_tokens_band", "b_name_tokens_band")
        ).collect()
    }
    assert set(hoisted) == set(fallback)
    for k in hoisted:
        assert _close(hoisted[k], fallback[k]), (k, hoisted[k], fallback[k])
    # the penalty actually fires on this fixture (u1-u2 share 2 band
    # words: inter={band,club}, union size 4 -> (2 - 2*0.9)/4)
    assert _close(hoisted[("u1", "u2")], (2 - 2 * 0.9) / 4)
