"""Character-n-gram language identification (profile classifier).

The training-data-pipeline brief asks for "language-ID (n-gram heuristic)".
Two tiers ship in this engine:

* the cheap stop-word-ratio screen (``__spark_entry__.q_lang_id``) — one
  pass, no state;
* THIS operator — the classic Cavnar/Trenkle-style profile classifier:
  per-language character-trigram profiles learned from a labeled corpus
  (one groupBy), then documents scored against every profile and assigned
  the argmax language.

Scale shape: profiles are tiny (|langs| x top_k rows -> broadcast), so
classification is scan -> explode trigrams -> broadcast join -> partial
aggregate; the only wide shuffle is the per-document score aggregation.
All arithmetic is INTEGER (count dot products), so the result is
hash-exact reproducible and the driver's DuckDB oracle replays it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def char_trigrams(col, n: int = 3):
    """ARRAY<STRING> of lowercase character n-grams (JVM-side)."""
    t = F.lower(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(n)),
    )


def _doc_trigram_counts(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    ex = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_trigrams(F.col(text_col), n)).alias("tg"),
    )
    return ex.groupBy("doc_id", "tg").agg(F.count("*").alias("doc_cnt"))


def train_lang_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 100,
) -> DataFrame:
    """(lang, tg, prof_cnt): the ``top_k`` most frequent trigrams per
    language with their corpus counts; ties broken by trigram ascending so
    the profile set is deterministic."""
    ex = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_trigrams(F.col(text_col), n)).alias("tg"),
    )
    counts = ex.groupBy("lang", "tg").agg(F.count("*").alias("prof_cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("prof_cnt"), F.asc("tg"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("lang", "tg", "prof_cnt")
    )


def classify_languages(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, predicted_lang, score): argmax over integer profile dot
    products; ties broken by language ascending. Documents sharing no
    trigram with any profile are absent (callers left-join if they need
    an 'unknown' row)."""
    doc_counts = _doc_trigram_counts(docs, id_col, text_col, n)
    scored = (
        doc_counts.join(F.broadcast(profiles), "tg")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("doc_cnt") * F.col("prof_cnt")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("predicted_lang"), "score")
    )

