"""Spark bindings for URL cleaning/validation/tokenization.

JVM-native expressions where exact (QID regex, wiki-link predicate,
host extraction via ``parse_url``); Arrow-batched pandas UDFs for the
pieces whose reference semantics need Python's urllib (percent decoding,
scheme repair).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from soweego_spark.functions import urlnorm


@F.pandas_udf(ArrayType(StringType()))
def clean_and_validate(col: pd.Series) -> pd.Series:
    """STRING cell -> ARRAY<STRING> of validated URLs (clean + validate,
    url_utils.py:50-100); None when nothing validates."""

    def _one(cell):
        if cell is None:
            return None
        out = []
        for cand in urlnorm.clean(cell):
            ok = urlnorm.validate(cand)
            if ok is not None:
                out.append(ok)
        return out or None

    return col.map(_one)


@F.pandas_udf(ArrayType(StringType()))
def url_tokens(col: pd.Series) -> pd.Series:
    """ARRAY<STRING> of URLs -> union of URL token sets (url_utils.py:183-211)."""

    def _one(urls):
        if urls is None:
            return None
        out: set[str] = set()
        for u in urls:
            toks = urlnorm.tokenize_url(u) if u is not None else None
            if toks:
                out.update(toks)
        return sorted(out) or None

    return col.map(_one)


@F.pandas_udf(ArrayType(StringType()))
def domain_tokens(col: pd.Series) -> pd.Series:
    """ARRAY<STRING> of URLs -> union of domain-only token sets."""

    def _one(urls):
        if urls is None:
            return None
        out: set[str] = set()
        for u in urls:
            toks = urlnorm.tokenize_url(u, domain_only=True) if u else None
            if toks:
                out.update(toks)
        return sorted(out) or None

    return col.map(_one)


def host(url: Column) -> Column:
    """JVM-side host extraction (Catalyst ``parse_url``)."""
    return F.parse_url(url, F.lit("HOST"))


def qid_in_url(url: Column) -> Column:
    """First Q\\d+ occurrence, '' when absent (link.py:345-367 rule probe)."""
    return F.regexp_extract(url, r"(Q\d+)", 1)


def is_wiki_link(url: Column) -> Column:
    """Host contains any Wikimedia project marker (url_utils.py:331-335)."""
    markers = F.array(*[F.lit(m) for m in urlnorm.WIKI_PROJECT_MARKERS])
    h = host(url)
    return F.exists(markers, lambda m: h.contains(m))
