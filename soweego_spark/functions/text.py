"""Spark bindings for text normalization/tokenization.

Arrow-batched pandas UDFs over the pure kernels in :mod:`textnorm` — one
Python invocation per ~10k-row Arrow batch, never per row at the API level.
Where Spark built-ins can express the exact semantics we prefer them (JVM
side, whole-stage codegen), e.g. sorting/dedup of token arrays.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from soweego_spark.functions import textnorm


@F.pandas_udf(StringType())
def norm_lower(col: pd.Series) -> pd.Series:
    """strip -> ASCII-fold -> lowercase (reference normalize, lower half)."""
    return col.map(
        lambda s: None if s is None else textnorm.normalize(s)[1]
    )


@F.pandas_udf(StringType())
def norm_ascii(col: pd.Series) -> pd.Series:
    """strip -> ASCII-fold, case preserved (reference normalize, upper half)."""
    return col.map(
        lambda s: None if s is None else textnorm.normalize(s)[0]
    )


@F.pandas_udf(ArrayType(StringType()))
def text_tokens(col: pd.Series) -> pd.Series:
    """Sorted token set of a text (English stop words removed)."""
    return col.map(lambda s: None if s is None else textnorm.tokenize(s))


@F.pandas_udf(ArrayType(StringType()))
def name_tokens(col: pd.Series) -> pd.Series:
    """Sorted token set using the person/band-name stop-word list."""
    stop = textnorm.NAME_STOPWORDS
    return col.map(
        lambda s: None if s is None else textnorm.tokenize(s, stop)
    )


@F.pandas_udf(ArrayType(StringType()))
def normalize_values(col: pd.Series) -> pd.Series:
    """Element-wise normalize over an ARRAY<STRING> column, deduped + sorted
    (reference workflow.py:618-627 list-of-values normalization)."""

    def _one(values):
        if values is None:
            return None
        out = sorted({textnorm.normalize(v)[1] for v in values if v is not None})
        return out or None

    return col.map(_one)


@F.pandas_udf(ArrayType(StringType()))
def tokenize_values(col: pd.Series) -> pd.Series:
    """Union of token sets over an ARRAY<STRING> column
    (reference workflow.py:756-767)."""

    def _one(values):
        if values is None:
            return None
        out: set[str] = set()
        for v in values:
            if v is not None:
                out.update(textnorm.tokenize(v))
        return sorted(out) or None

    return col.map(_one)


def sorted_set(col):
    """JVM-side dedup+sort of an array column: deterministic set encoding."""
    return F.array_sort(F.array_distinct(col))


def flatten_deep(df, col: str):
    """F12 (reference features.py:611-625 ``SharedTokensPlus._flatten``):
    flatten an arbitrarily nested array column to a flat array.

    The reference flattens dynamically-typed Python lists with a stack;
    Spark array nesting depth is static in the schema, so "arbitrary
    depth" resolves at PLAN time: apply ``F.flatten`` once per nesting
    level read from the column's dataType — still zero Python at runtime
    for any depth.
    """
    from pyspark.sql.types import ArrayType

    dt = df.schema[col].dataType
    expr = F.col(col)
    if not isinstance(dt, ArrayType):
        raise TypeError(f"column {col!r} is {dt}, not an array")
    while isinstance(dt.elementType, ArrayType):
        expr = F.flatten(expr)
        dt = dt.elementType
    return expr
