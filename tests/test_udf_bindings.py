"""The public Arrow-batched UDF bindings (functions/text.py, urls.py)
agree with their pure kernels when applied as Spark columns."""

from __future__ import annotations

import pytest

from soweego_spark.functions import text as text_udfs
from soweego_spark.functions import textnorm, urlnorm
from soweego_spark.functions import urls as url_udfs

SAMPLES = [
    "José González — Veneer",
    "Dvořák, Antonín",
    "  padded   ",
    "Иванов Пётр",
    None,
    "the And of a",
]


def test_text_udf_bindings(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = df.select(
        "s",
        text_udfs.norm_lower("s").alias("lower"),
        text_udfs.norm_ascii("s").alias("ascii"),
        text_udfs.text_tokens("s").alias("toks"),
        text_udfs.name_tokens("s").alias("ntoks"),
    ).collect()
    for r in got:
        if r["s"] is None:
            assert r["lower"] is None and r["toks"] is None
            continue
        ascii_form, lower_form = textnorm.normalize(r["s"])
        assert r["lower"] == lower_form and r["ascii"] == ascii_form
        assert list(r["toks"]) == textnorm.tokenize(r["s"])
        assert list(r["ntoks"]) == textnorm.tokenize(
            r["s"], textnorm.NAME_STOPWORDS
        )


def test_value_list_udfs(spark):
    df = spark.createDataFrame(
        [(["José G.", "JOSE g.", None],), (None,), ([],)],
        "vals array<string>",
    )
    got = df.select(
        text_udfs.normalize_values("vals").alias("norm"),
        text_udfs.tokenize_values("vals").alias("toks"),
    ).collect()
    assert list(got[0]["norm"]) == sorted(
        {textnorm.normalize("José G.")[1], textnorm.normalize("JOSE g.")[1]}
    )
    assert got[1]["norm"] is None and got[2]["norm"] is None


def test_url_udf_bindings(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example/x   http://b.example/y zzz",),
            (None,),
        ],
        "cell string",
    )
    [r, r_null] = df.select(
        url_udfs.clean_and_validate("cell").alias("urls")
    ).collect()
    expected = []
    for cand in urlnorm.clean("https://a.example/x   http://b.example/y zzz"):
        ok = urlnorm.validate(cand)
        if ok:
            expected.append(ok)
    assert list(r["urls"]) == expected
    assert r_null["urls"] is None

    df2 = spark.createDataFrame(
        [(["https://music.site.example/artist/jo%C3%A9", None],)],
        "urls array<string>",
    )
    [row] = df2.select(
        url_udfs.url_tokens("urls").alias("t"),
        url_udfs.domain_tokens("urls").alias("d"),
    ).collect()
    truth = set(urlnorm.tokenize_url("https://music.site.example/artist/jo%C3%A9"))
    assert set(row["t"]) == truth
    assert set(row["d"]) == set(
        urlnorm.tokenize_url(
            "https://music.site.example/artist/jo%C3%A9", domain_only=True
        )
    )


def test_jvm_url_helpers(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("https://en.wikipedia.org/wiki/Q42",),
            ("https://example.com/page",),
        ],
        "url string",
    )
    got = df.select(
        url_udfs.host(F.col("url")).alias("h"),
        url_udfs.qid_in_url(F.col("url")).alias("q"),
        url_udfs.is_wiki_link(F.col("url")).alias("w"),
    ).collect()
    assert got[0]["h"] == "en.wikipedia.org"
    assert got[0]["q"] == "Q42" and got[0]["w"] is True
    assert got[1]["q"] == "" and got[1]["w"] is False


def test_extract_emits_ext_ids_and_url_rule_fires(spark):
    """extract_signatures resolves profile links to (ext_id, pid) structs
    (F5 wired path) and the M12 url rule treats a shared external id as
    ground truth even when the raw URLs differ in spelling."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from soweego_spark.operators.classify import apply_rules
    from soweego_spark.operators.extract import extract_signatures
    from soweego_spark.operators.pairfeatures import assemble_pairs

    def page(url, link):
        text = f"Ada Test. Born 1901. Links: {link}"
        html = f"<html><body><h1>Ada Test</h1><p>{text}</p></body></html>".encode()
        return (url, datetime(2020, 1, 1), html, text, "en")

    pages = spark.createDataFrame(
        [
            # same profile, different spellings: http scheme + trailing slash
            page("https://site1.example/a", "https://catalog-a.example/artist/ada-1"),
            page("https://site2.example/b", "http://catalog-a.example/artist/ada-1/"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    sig = extract_signatures(pages)
    rows = {r["url"]: r["ext_ids"] for r in sig.collect()}
    for v in rows.values():
        assert [(x["ext_id"], x["pid"]) for x in v] == [("ada-1", "P9001")]

    pairs = spark.createDataFrame(
        [("https://site1.example/a", "https://site2.example/b")],
        "url_a string, url_b string",
    )
    pair_rows = assemble_pairs(pairs, sig)
    scored = pair_rows.select("url_a", "url_b").withColumn(
        "score", F.lit(0.1)
    )
    # raw URLs differ (http vs https, trailing slash) -> the old raw-URL
    # rule would NOT fire; the external-id rule must.
    out = apply_rules(scored, pair_rows=pair_rows, name_rule=False).collect()
    assert out[0]["score"] == 1.0


def test_drop_all_null_columns(spark):
    """P1: columns that are entirely null disappear; others survive —
    including all-null ARRAY/STRUCT columns (one aggregate pass)."""
    from soweego_spark.operators.extract import drop_all_null_columns

    df = spark.createDataFrame(
        [(1, None, None, ["x"]), (2, None, "a", None)],
        "id long, dead string, alive string, arr array<string>",
    )
    out = drop_all_null_columns(df)
    assert out.columns == ["id", "alive", "arr"]
    assert out.count() == 2


def test_flatten_deep_any_depth(spark):
    """F12: plan-time recursion flattens any statically-nested array."""
    from soweego_spark.functions.text import flatten_deep

    df = spark.createDataFrame(
        [([[["a", "b"], ["c"]], [["d"]]],), ([[[]]],)],
        "nested array<array<array<string>>>",
    )
    [r1, r2] = df.select(flatten_deep(df, "nested").alias("flat")).collect()
    assert list(r1["flat"]) == ["a", "b", "c", "d"]
    assert list(r2["flat"]) == []

    flat_in = spark.createDataFrame([(["x"],)], "arr array<string>")
    [r] = flat_in.select(flatten_deep(flat_in, "arr").alias("f")).collect()
    assert list(r["f"]) == ["x"]

    import pytest

    with pytest.raises(TypeError):
        flatten_deep(spark.createDataFrame([(1,)], "i long"), "i")
