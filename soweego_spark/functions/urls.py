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
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from soweego_spark.functions import urlnorm

# F5 formatter catalog: {pid: {formatter_url: (id_regex, url_regex)}} — the
# shape the reference loads from Wikidata external-ID property formatters
# (url_utils.py:214-328). The engine is catalog-agnostic: callers pass their
# own dict; this default matches the synthetic fixture's profile hosts
# (sources/pages.py PROFILE_HOSTS) with synthetic PIDs. id-hub gets a full
# url_regex to exercise the optimal-case branch; the others use the
# head/tail formatter match.
# Regexes are pre-compiled — the exact shape the reference builds from the
# SPARQL formatter query (its failure-path logging assumes .pattern).
import re as _re

DEFAULT_FORMATTERS: dict[str, dict] = {
    "P9001": {
        "https://catalog-a.example/artist/$1": (_re.compile(r"[a-z0-9-]+"), None)
    },
    "P9002": {
        "https://catalog-b.example/artist/$1": (_re.compile(r"[a-z0-9-]+"), None)
    },
    "P9003": {
        "https://id-hub.example/artist/$1": (
            _re.compile(r"[a-z0-9-]+"),
            _re.compile(r"https?://id-hub\.example/artist/([a-z0-9-]+)/?$"),
        )
    },
}

EXT_IDS_TYPE = ArrayType(
    StructType(
        [StructField("ext_id", StringType()), StructField("pid", StringType())]
    )
)


def resolve_external_ids(urls, formatters) -> list[dict] | None:
    """Resolve a URL list to deduped [(ext_id, pid)] structs via the F5
    kernel — the ONE implementation shared by the extract stage and the
    pandas-UDF binding."""
    if urls is None:
        return None
    out, seen = [], set()
    for u in urls:
        if u is None:
            continue
        ext_id, pid = urlnorm.extract_external_id(u, formatters)
        if ext_id is not None and (ext_id, pid) not in seen:
            seen.add((ext_id, pid))
            out.append({"ext_id": ext_id, "pid": pid})
    return out or None


def make_external_ids_udf(formatters=None):
    """F5 Spark binding (reference url_utils.py:214-328 via the parity-tested
    kernel urlnorm.extract_external_id): ARRAY<STRING> of URLs ->
    ARRAY<STRUCT<ext_id, pid>> of resolved external identifiers, deduped,
    input order preserved; None when nothing resolves.

    The formatter dict rides the UDF closure — it is a few KB of templates
    (equivalent to a broadcast for this size; swap to an explicit
    ``sparkContext.broadcast`` if a catalog ships 10^5 formatters).
    """
    fmts = DEFAULT_FORMATTERS if formatters is None else formatters

    @F.pandas_udf(EXT_IDS_TYPE)
    def external_ids(col: pd.Series) -> pd.Series:
        return col.map(lambda urls: resolve_external_ids(urls, fmts))

    return external_ids


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
