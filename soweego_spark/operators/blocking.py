"""Candidate-pair generation (blocking) — salted multi-key, skew-aware.

Reference analogue: MariaDB FULLTEXT blocking with a top-5 cap per item
(linker/blocking.py:44-166). Spark-first redesign (SURVEY.md §2.4 B1-B4):

1. **Name-token inverted index** — explode ``name_tokens``, drop tokens whose
   document frequency exceeds ``token_df_cap`` (the hot-token/skew guard:
   a Zipfian token would otherwise explode the self-join quadratically; the
   cap is correctness-neutral because a token shared by thousands of docs
   carries no linking signal — same spirit as the reference's FTS relevance
   ranking + LIMIT 5), self-join on token, score pairs by shared-token
   count, keep the top ``top_k`` per document (window over the pair list —
   the reference's only top-k, blocking.py:142).
2. **Exact outbound-URL key** — explode validated ``urls``; documents citing
   the same profile link are candidates (B4 analogue).
3. **MinHash-LSH bands** — ``num_hashes`` per-shingle xxhash64 minima computed
   entirely JVM-side with ``array_min(transform(...))`` (no explode, no
   Python), banded ``rows_per_band`` at a time; band buckets larger than
   ``band_cap`` are dropped (skew guard).

All three key families are unioned and deduped into ``(url_a, url_b)`` with
``url_a < url_b``. Every join here is an equi-join on a key column —
Catalyst picks shuffle-hash/SMJ and AQE splits skewed partitions at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canonical(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.least("url_a", "url_b").alias("url_a"),
        F.greatest("url_a", "url_b").alias("url_b"),
    ).filter(F.col("url_a") != F.col("url_b"))


def token_blocking(
    sig: DataFrame,
    top_k: int = 5,
    token_df_cap: int = 1000,
    token_col: str = "name_tokens",
    dedup: bool = True,
) -> DataFrame:
    """Inverted-index self-join on name tokens with per-doc top-k.

    Returns (url_a, url_b, shared_tokens) — ``shared_tokens`` is the rank
    score (reference: FTS relevance).
    """
    idx = sig.select("url", F.explode(token_col).alias("token"))

    # Hot-token guard: document frequency per token, computed once. The
    # filter is a broadcast ANTI join on the over-cap tokens — that list is
    # tiny BY CONSTRUCTION (Zipf head), whereas the under-cap keep-list is
    # the whole vocabulary, which at web scale is billions of rows and
    # not broadcastable.
    df_counts = idx.groupBy("token").agg(F.count("*").alias("df"))
    hot = df_counts.filter(F.col("df") > token_df_cap).select("token")
    idx = idx.join(F.broadcast(hot), "token", "left_anti")

    left = idx.select(F.col("token"), F.col("url").alias("url_a"))
    right = idx.select(F.col("token"), F.col("url").alias("url_b"))
    pairs = (
        left.join(right, "token")
        .filter(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.count("*").alias("shared_tokens"))
    )

    # Top-k per document on either side (the dedup-symmetric version of the
    # reference's per-item LIMIT 5). Implemented as ONE window over a
    # direction-tagged mirror of the pair list instead of two windows
    # unioned: partition (key, dir='gt') reproduces exactly the old
    # url_a-window partition and (key, dir='lt') the url_b one, so the
    # result set is identical, while the pair aggregate's lineage runs
    # ONCE (no cache to leak in a long-lived session — round-1 review
    # item), there is a single window shuffle on (key, dir) instead of
    # two, and the `row_number() <= k` filter directly after the window
    # keeps the WindowGroupLimit per-partition top-k pushdown.
    mirrored = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("url_a").alias("key"),
                    F.col("url_b").alias("other"),
                    F.lit("gt").alias("dir"),
                    F.col("shared_tokens"),
                ),
                F.struct(
                    F.col("url_b").alias("key"),
                    F.col("url_a").alias("other"),
                    F.lit("lt").alias("dir"),
                    F.col("shared_tokens"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    w = Window.partitionBy("key", "dir").orderBy(
        F.desc("shared_tokens"), F.asc("other")
    )
    kept = (
        mirrored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
    )
    out = kept.select(
        F.when(F.col("dir") == "gt", F.col("key"))
        .otherwise(F.col("other"))
        .alias("url_a"),
        F.when(F.col("dir") == "gt", F.col("other"))
        .otherwise(F.col("key"))
        .alias("url_b"),
        "shared_tokens",
    )
    # a pair kept from BOTH mirror directions appears twice; callers that
    # union several key families and dedup once at the end (see
    # block_candidates) skip this shuffle via dedup=False
    return out.distinct() if dedup else out


def url_blocking(
    sig: DataFrame, url_df_cap: int = 50, dedup: bool = True
) -> DataFrame:
    """Documents sharing an exact outbound URL."""
    idx = sig.filter(F.col("urls").isNotNull()).select(
        "url", F.explode("urls").alias("out_url")
    )
    counts = idx.groupBy("out_url").agg(F.count("*").alias("df"))
    hot = counts.filter(F.col("df") > url_df_cap).select("out_url")
    idx = idx.join(F.broadcast(hot), "out_url", "left_anti")
    left = idx.select("out_url", F.col("url").alias("url_a"))
    right = idx.select("out_url", F.col("url").alias("url_b"))
    out = _canonical(
        left.join(right, "out_url").filter(F.col("url_a") < F.col("url_b"))
    )
    return out.distinct() if dedup else out


def shingles(col, n: int = 3):
    """Char n-gram shingles of a (already normalized) string column —
    JVM-side: substring over a sequence, no UDF."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(n)),
        )
    )


def minhash_signature(shingle_col, num_hashes: int = 12):
    """ARRAY<BIGINT> of per-salt minima over shingle hashes, fully JVM-side.

    One nested-lambda expression (outer over the hash index, inner over the
    shingles) — building ``num_hashes`` sibling ``transform`` columns
    mis-binds same-named lambda variables in pyspark 4.1 and silently
    produced wrong (though stable) signatures; regression-tested in
    tests/test_dedup.py::test_blocking_minhash_signature_truth.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                shingle_col,
                lambda s: F.xxhash64(
                    F.concat(F.lit("m"), i.cast("string"), F.lit(":"), s)
                ),
            )
        ),
    )


def lsh_blocking(
    sig: DataFrame,
    text_expr=None,
    num_hashes: int = 12,
    rows_per_band: int = 2,
    band_cap: int = 200,
    shingle_size: int = 3,
    dedup: bool = True,
) -> DataFrame:
    """MinHash-LSH band blocking over a text expression.

    Defaults to the concatenated normalized name — near-duplicate names land
    in the same band with high probability even when token blocking misses
    (misspellings change tokens but only a few shingles).
    """
    if text_expr is None:
        text_expr = F.array_join(F.col("name"), " ")
    n_bands = num_hashes // rows_per_band

    with_sig = sig.select(
        "url",
        minhash_signature(
            shingles(text_expr, shingle_size), num_hashes
        ).alias("mh"),
    )
    bands = with_sig.select(
        "url",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.element_at("mh", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("url", "bk.band", "bk.sig")

    counts = bands.groupBy("band", "sig").agg(F.count("*").alias("df"))
    hot = counts.filter(F.col("df") > band_cap).select("band", "sig")
    bands = bands.join(F.broadcast(hot), ["band", "sig"], "left_anti")

    left = bands.select("band", "sig", F.col("url").alias("url_a"))
    right = bands.select("band", "sig", F.col("url").alias("url_b"))
    out = _canonical(
        left.join(right, ["band", "sig"]).filter(F.col("url_a") < F.col("url_b"))
    )
    return out.distinct() if dedup else out


def block_candidates(
    sig: DataFrame,
    top_k: int = 5,
    token_df_cap: int = 1000,
    use_lsh: bool = True,
    use_url_key: bool = True,
    lsh_rows_per_band: int = 3,
) -> DataFrame:
    """Union of all blocking keys -> distinct candidate pairs
    (url_a, url_b) with url_a < url_b.

    Each family skips its internal dedup shuffle (dedup=False): the single
    distinct AFTER the union dedups within and across families at once —
    one Exchange of the pair set instead of up to four.
    """
    pairs = token_blocking(
        sig, top_k=top_k, token_df_cap=token_df_cap, dedup=False
    ).select("url_a", "url_b")
    if use_url_key:
        pairs = pairs.unionByName(url_blocking(sig, dedup=False))
    if use_lsh:
        pairs = pairs.unionByName(
            lsh_blocking(sig, rows_per_band=lsh_rows_per_band, dedup=False)
        )
    return pairs.distinct()


def subset_token_pairs(
    wd: DataFrame,
    target: DataFrame,
    id_left: str = "url_a",
    id_right: str = "url_b",
    token_col: str = "name_tokens",
    token_df_cap: int = 10_000,
    target_df_cap: int | None = None,
) -> DataFrame:
    """B2/J4 (baseline.py:332-354 + data_gathering.py:78): pairs where the
    TARGET token set is a subset of the WD token set.

    The reference fires boolean-mode FULLTEXT queries (``+tok1 +tok2``
    requires every target token present) then re-checks ``target ⊆ wd`` in
    pandas; the theta join converts to equi-join + aggregate: join on
    token, count matched tokens per pair, keep pairs where the count equals
    the target's token-set size. Token sets of size <= 1 are excluded on
    both sides (baseline.py:344-347).

    Hot tokens are always capped on the wd side (``token_df_cap``), and
    OPTIONALLY on the target side: pass ``target_df_cap`` to also drop
    tokens whose TARGET-side document frequency exceeds it. The target cap
    is opt-in (default ``None`` = no target-side cap — the original
    semantics) because it changes recall: a target set containing any
    target-hot token is disqualified even when genuinely contained and
    held together by additional rare tokens, since ``n_matched`` can no
    longer reach ``_r_size``. When enabled it kills the df_l x df_r
    fan-out a boilerplate-hot target token would otherwise cause — a
    single such token can dominate the shuffle at 100x scale — which is
    usually the right trade for web-scale linking (a pair held together
    only by a boilerplate token carries no subset signal), but callers
    tuned to the uncapped recall must opt in explicitly.
    """
    l_tok = (
        wd.filter(F.size(token_col) > 1)
        .select(F.col("url").alias(id_left), F.explode(token_col).alias("token"))
    )
    r = target.filter(F.size(token_col) > 1).select(
        F.col("url").alias(id_right),
        F.col(token_col).alias("_r_tokens"),
        F.size(token_col).alias("_r_size"),
    )
    r_tok = r.select(
        id_right, "_r_size", F.explode("_r_tokens").alias("token")
    )

    # Over-cap token lists are tiny by construction (Zipf head) -> anti
    # join on the broadcast hot list, never a broadcast of the full vocab.
    hot_l = (
        l_tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > token_df_cap)
        .select("token")
    )
    hot = hot_l
    if target_df_cap is not None:
        hot_r = (
            r_tok.groupBy("token")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > target_df_cap)
            .select("token")
        )
        hot = hot_l.unionByName(hot_r).distinct()
    l_tok = l_tok.join(F.broadcast(hot), "token", "left_anti")

    matched = (
        l_tok.join(r_tok, "token")
        .filter(F.col(id_left) != F.col(id_right))
        .groupBy(id_left, id_right, "_r_size")
        .agg(F.count(F.col("token")).alias("n_matched"))
    )
    return matched.filter(F.col("n_matched") == F.col("_r_size")).select(
        id_left, id_right
    )
