"""pages -> signatures: the extraction stage.

One ``mapInPandas`` pass turns each raw page row into a structured entity
signature (SURVEY.md §1.2 Spark mapping; reference analogue: the dump-field
extraction in importer/*_dump_extractor.py + the linker's
``preprocess_wikidata``/``preprocess_target`` normalization chain,
linker/workflow.py:182-320).

Single-pass design: the whole derivation (HTML title, field regexes, the
normalize/tokenize chain, URL validation, date parsing) happens in one
Arrow-batched Python stage, so the scan feeds exactly one Python boundary
crossing. At 100 TB this stage is embarrassingly parallel: no shuffle, output
written partitioned by a stable hash of ``url``.

Output schema (SIGNATURE_SCHEMA):
  url STRING, domain STRING, lang STRING,
  name ARRAY<STRING>                      normalized (lowercase, folded)
  name_ascii ARRAY<STRING>                folded, case kept (display form)
  name_tokens ARRAY<STRING>               sorted set, name stop words removed
  born / died ARRAY<STRUCT<ts:STRING, precision:INT>>   raw, Wikidata-style
  born_p / died_p ARRAY<STRUCT<y,mo,d,h,mi,s,depth INT>> parsed (dates.py)
  urls ARRAY<STRING>                      cleaned + validated outbound links
  url_tokens ARRAY<STRING>                sorted set, TLD/prefix stop words out
  ext_ids ARRAY<STRUCT<ext_id,pid>>       external identifiers resolved from
                                          urls via the F5 formatter catalog
                                          (reference url_utils.py:214-328)
  description STRING                      free-text remainder
  description_tokens ARRAY<STRING>
  occupations ARRAY<STRING>, genres ARRAY<STRING>
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from soweego_spark.functions import dates, simkernels, textnorm, urlnorm

DATE_STRUCT = StructType(
    [StructField("ts", StringType()), StructField("precision", IntegerType())]
)
DATE_PARTS_STRUCT = StructType(
    [StructField(n, IntegerType()) for n in ["y", "mo", "d", "h", "mi", "s", "depth"]]
)

SIGNATURE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("domain", StringType()),
        StructField("lang", StringType()),
        StructField("name", ArrayType(StringType())),
        StructField("name_ascii", ArrayType(StringType())),
        StructField("name_tokens", ArrayType(StringType())),
        StructField("born", ArrayType(DATE_STRUCT)),
        StructField("died", ArrayType(DATE_STRUCT)),
        StructField("born_p", ArrayType(DATE_PARTS_STRUCT)),
        StructField("died_p", ArrayType(DATE_PARTS_STRUCT)),
        StructField("urls", ArrayType(StringType())),
        StructField("url_tokens", ArrayType(StringType())),
        StructField(
            "ext_ids",
            ArrayType(
                StructType(
                    [
                        StructField("ext_id", StringType()),
                        StructField("pid", StringType()),
                    ]
                )
            ),
        ),
        StructField("description", StringType()),
        StructField("description_tokens", ArrayType(StringType())),
        StructField("occupations", ArrayType(StringType())),
        StructField("genres", ArrayType(StringType())),
        # Cosine-feature precomputation (C3): per-side bag-of-words count
        # maps + L2 norms, built ONCE per document here so the per-pair
        # cosine downstream is pure JVM map arithmetic (no Python in the
        # pair loop — pairs outnumber documents ~30x).
        StructField("name_bigrams", MapType(StringType(), IntegerType())),
        StructField("name_bigram_norm", DoubleType()),
        StructField("desc_terms", MapType(StringType(), IntegerType())),
        StructField("desc_norm", DoubleType()),
    ]
)

_H1_RE = re.compile(rb"<h1>(.*?)</h1>", re.DOTALL)
_BORN_RE = re.compile(r"\bBorn (\d{4}(?:-\d{2}){0,2})\.")
_DIED_RE = re.compile(r"\bDied (\d{4}(?:-\d{2}){0,2})\.")
_OCC_RE = re.compile(r"Occupations: ([^.]*)\.")
_GEN_RE = re.compile(r"Genres: ([^.]*)\.")
_LINKS_RE = re.compile(r"Links: (.*)$")
_BIO_RE = re.compile(r"\. ([A-Z][^.]*worldwide\.)")

_PRECISION_BY_LEN = {4: 9, 7: 10, 10: 11}


def _date_cell(date_str: str | None):
    """One textual date -> ([(iso_ts, precision)], [parsed parts])."""
    if not date_str:
        return None, None
    precision = _PRECISION_BY_LEN.get(len(date_str))
    if precision is None:
        return None, None
    # Normalize to the Wikidata-style full timestamp the reference carries
    # around (api_requests.py:445-538 emits e.g. 1939-03-03T00:00:00Z).
    pad = {9: "-00-00", 10: "-00"}.get(precision, "")
    ts = f"{date_str}{pad}T00:00:00Z"
    parsed = dates.parse_date(ts, precision)
    raw = [{"ts": ts, "precision": precision}]
    if parsed is None:
        return raw, None
    keys = ["y", "mo", "d", "h", "mi", "s", "depth"]
    return raw, [dict(zip(keys, parsed))]


def _extract_one(url, html, text, formatters):
    m = _H1_RE.search(html) if html is not None else None
    display = m.group(1).decode("utf8", "replace").strip() if m else None
    if display is None and text:
        display = text.split(".", 1)[0].strip()

    names_lower, names_ascii, name_toks = None, None, None
    if display:
        ascii_form, lower_form = textnorm.normalize(display)
        names_lower, names_ascii = [lower_form], [ascii_form]
        name_toks = textnorm.tokenize(display, textnorm.NAME_STOPWORDS) or None

    born_m = _BORN_RE.search(text) if text else None
    died_m = _DIED_RE.search(text) if text else None
    born, born_p = _date_cell(born_m.group(1) if born_m else None)
    died, died_p = _date_cell(died_m.group(1) if died_m else None)

    occ_m = _OCC_RE.search(text) if text else None
    occs = (
        sorted({o.strip() for o in occ_m.group(1).split(",") if o.strip()})
        if occ_m
        else None
    )
    gen_m = _GEN_RE.search(text) if text else None
    gens = (
        sorted({g.strip() for g in gen_m.group(1).split(",") if g.strip()})
        if gen_m
        else None
    )

    links_m = _LINKS_RE.search(text) if text else None
    urls_out, url_toks, ext_ids = None, None, None
    if links_m:
        validated = []
        for cand in urlnorm.clean(links_m.group(1)):
            ok = urlnorm.validate(cand)
            if ok:
                validated.append(ok)
        urls_out = sorted(set(validated)) or None
        if urls_out:
            toks: set[str] = set()
            for u in urls_out:
                ut = urlnorm.tokenize_url(u)
                if ut:
                    toks.update(ut)
            url_toks = sorted(toks) or None
            # F5: resolve each outbound URL against the external-id
            # formatter catalog (shared kernel, functions/urls.py).
            from soweego_spark.functions.urls import resolve_external_ids

            ext_ids = resolve_external_ids(urls_out, formatters)

    bio_m = _BIO_RE.search(text) if text else None
    description = bio_m.group(1) if bio_m else None
    desc_toks = (
        textnorm.tokenize(description) or None if description else None
    )

    # C3 precomputation: char_wb 2-gram counts of the joined name tokens and
    # binary term counts of the description tokens (tokenize() returns a
    # set, so counts are 0/1), with their L2 norms.
    name_bg, name_bg_norm = None, None
    if name_toks:
        counts = simkernels._count(
            simkernels._char_wb_bigrams(" ".join(name_toks))
        )
        if counts:
            name_bg = counts
            name_bg_norm = sum(n * n for n in counts.values()) ** 0.5
    desc_terms, desc_norm = None, None
    if desc_toks:
        desc_terms = {t: 1 for t in desc_toks}
        desc_norm = len(desc_toks) ** 0.5

    return (
        url,
        urlnorm.domain_of(url),
        names_lower,
        names_ascii,
        name_toks,
        born,
        died,
        born_p,
        died_p,
        urls_out,
        url_toks,
        ext_ids,
        description,
        desc_toks,
        occs,
        gens,
        name_bg,
        name_bg_norm,
        desc_terms,
        desc_norm,
    )


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """P1 (reference workflow.py:630-632 ``dropna(axis=1, how='all')``):
    drop columns whose every value is null.

    Spark schemas are static, so this is a two-step plan: ONE aggregate
    pass counting non-nulls per column (a single map-side-combinable job —
    no per-column scans), then a projection of the surviving columns.
    Downstream feature guards stay null-safe either way; this operator is
    for sink hygiene, where the reference uses it.
    """
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in df.columns]
    ).first()
    keep = [c for c in df.columns if counts[c] > 0]
    return df.select(*keep)


def extract_signatures(pages: DataFrame, formatters=None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) -> signatures (SIGNATURE_SCHEMA).

    ``formatters``: the F5 external-id formatter catalog
    ({pid: {formatter_url: (id_regex, url_regex)}}); defaults to
    functions.urls.DEFAULT_FORMATTERS."""
    from soweego_spark.functions.urls import DEFAULT_FORMATTERS

    fmts = DEFAULT_FORMATTERS if formatters is None else formatters

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _extract_one(u, h, t, fmts)
                for u, h, t in zip(pdf["url"], pdf["html"], pdf["text"])
            ]
            cols = list(zip(*out)) if out else [[] for _ in range(20)]
            yield pd.DataFrame(
                {
                    "url": cols[0],
                    "domain": cols[1],
                    "lang": pdf["lang"].values,
                    "name": cols[2],
                    "name_ascii": cols[3],
                    "name_tokens": cols[4],
                    "born": cols[5],
                    "died": cols[6],
                    "born_p": cols[7],
                    "died_p": cols[8],
                    "urls": cols[9],
                    "url_tokens": cols[10],
                    "ext_ids": cols[11],
                    "description": cols[12],
                    "description_tokens": cols[13],
                    "occupations": cols[14],
                    "genres": cols[15],
                    "name_bigrams": cols[16],
                    "name_bigram_norm": cols[17],
                    "desc_terms": cols[18],
                    "desc_norm": cols[19],
                }
            )

    return pages.mapInPandas(_run, schema=SIGNATURE_SCHEMA)
