"""Corpus-curation operator oracles (operators/corpus.py): substring-level
dedup spans, benchmark decontamination, deterministic stratified sampling.

The driver gate (`substring_dedup` / `decontaminate` / `mix_sample` in
__spark_entry__.py) hash-checks each against DuckDB on the synthetic
documents table; these tests carry the SEMANTICS on planted shapes — span
merging, within-doc repeats, short docs, the hot-gram cap, broadcast-side
correctness, and the hash-Bernoulli keep rule replayed in pure Python.
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from soweego_spark.operators.corpus import (
    cut_duplicated_spans,
    decontaminate,
    duplicated_spans,
    duplicated_spans_incremental,
    fold_gram_counts,
    gram_counts,
    gram_occurrences,
    stratified_sample,
    substring_dedup_stats,
)


def _doc(doc_id: int, words: list[str]):
    return (doc_id, " ".join(words))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_is_merged_maximal(spark):
    """Two docs sharing a 12-token run with k=10 produce 3 overlapping
    gram starts each — merged to ONE maximal span of exactly 12 tokens,
    placed at the right offsets in both docs."""
    shared = [f"s{i}" for i in range(12)]
    a = [f"a{i}" for i in range(5)] + shared + [f"a{i}" for i in range(5, 9)]
    b = [f"b{i}" for i in range(2)] + shared + [f"b{i}" for i in range(2, 10)]
    spans = duplicated_spans(
        _mk(spark, [_doc(1, a), _doc(2, b)]), k=10
    ).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans}
    assert got == {(1, 5, 17), (2, 2, 14)}


def test_within_doc_repeat_counts(spark):
    """A k-gram repeated INSIDE one doc is a duplicate (Lee et al.
    semantics: any second occurrence), even with no other doc."""
    g = [f"g{i}" for i in range(10)]
    words = g + ["mid1", "mid2"] + g
    st = substring_dedup_stats(_mk(spark, [_doc(7, words)]), k=10).collect()
    assert len(st) == 1
    r = st[0]
    assert (r["n_tokens"], r["dup_tokens"], r["n_spans"]) == (22, 20, 2)


def test_short_and_clean_docs_report_zero(spark):
    """Docs shorter than k and docs with unique text still get a stats
    row, with zero dup budget."""
    st = {
        r["doc_id"]: r
        for r in substring_dedup_stats(
            _mk(
                spark,
                [
                    _doc(1, ["only", "three", "words"]),
                    _doc(2, [f"u{i}" for i in range(30)]),
                ],
            ),
            k=10,
        ).collect()
    }
    assert st[1]["n_tokens"] == 3 and st[1]["dup_tokens"] == 0
    assert st[2]["n_tokens"] == 30 and st[2]["dup_tokens"] == 0
    assert st[2]["n_spans"] == 0


def test_hot_gram_cap_excludes_boilerplate(spark):
    """max_count drops grams above the cap (template boilerplate) from
    span detection while keeping ordinary duplicates."""
    boiler = [f"x{i}" for i in range(10)]
    pair = [f"p{i}" for i in range(10)]
    rows = [_doc(i, boiler) for i in range(5)]  # gram count 5
    rows += [_doc(10, pair), _doc(11, pair)]  # gram count 2
    uncapped = duplicated_spans(_mk(spark, rows), k=10).collect()
    assert {r["doc_id"] for r in uncapped} == {0, 1, 2, 3, 4, 10, 11}
    capped = duplicated_spans(_mk(spark, rows), k=10, max_count=4).collect()
    assert {r["doc_id"] for r in capped} == {10, 11}


def test_spans_match_python_oracle_random(spark):
    """On random small-vocab docs (dense collisions), the distributed
    span set equals a brute-force Python replay: positions covered by
    any corpus-repeated k-gram, merged into maximal runs."""
    rng = random.Random(606)
    k = 4
    docs = {
        i: [f"w{rng.randrange(6)}" for _ in range(rng.randrange(3, 40))]
        for i in range(25)
    }
    from collections import Counter

    cnt = Counter()
    for w in docs.values():
        for s in range(len(w) - k + 1):
            cnt[" ".join(w[s:s + k])] += 1
    expect = set()
    for i, w in docs.items():
        covered = sorted(
            {
                t
                for s in range(len(w) - k + 1)
                if cnt[" ".join(w[s:s + k])] >= 2
                for t in range(s, s + k)
            }
        )
        run_start = None
        prev = None
        for t in covered + [None]:
            if run_start is None:
                run_start = t
            elif t is None or t != prev + 1:
                expect.add((i, run_start, prev + 1))
                run_start = t
            prev = t
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(
            _mk(spark, [_doc(i, w) for i, w in docs.items()]), k=k
        ).collect()
    }
    assert got == expect


def test_cut_removes_exactly_the_spans(spark):
    """The cut pass removes exactly duplicated_spans' token positions,
    keeps order, and re-joins with single spaces; clean docs and docs
    losing everything both round-trip."""
    shared = [f"s{i}" for i in range(12)]
    a = ["a0", "a1"] + shared + ["a2"]
    b = shared  # whole doc duplicated -> text_clean ''
    c = [f"c{i}" for i in range(15)]  # clean
    got = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in cut_duplicated_spans(
            _mk(spark, [_doc(1, a), _doc(2, b), _doc(3, c)]), k=10
        ).collect()
    }
    assert got[1] == ("a0 a1 a2", 12)
    assert got[2] == ("", 12)
    assert got[3] == (" ".join(c), 0)


def test_cut_consistent_with_stats(spark):
    """n_removed == dup_tokens for every doc on random colliding docs."""
    rng = random.Random(99)
    rows = [
        _doc(i, [f"w{rng.randrange(5)}" for _ in range(rng.randrange(3, 30))])
        for i in range(30)
    ]
    df = _mk(spark, rows)
    stats = {
        r["doc_id"]: r["dup_tokens"]
        for r in substring_dedup_stats(df, k=4).collect()
    }
    cut = {
        r["doc_id"]: r["n_removed"]
        for r in cut_duplicated_spans(df, k=4).collect()
    }
    assert cut == stats


def test_decontaminate_planted_overlap(spark):
    """Only docs sharing a k-gram with the bench set are flagged;
    hit_grams counts DISTINCT contaminated grams."""
    leak = [f"l{i}" for i in range(9)]  # 9 words -> two 8-grams
    bench = _mk(spark, [_doc(100, leak)])
    train = _mk(
        spark,
        [
            _doc(1, ["pre"] + leak + ["post"]),  # both bench grams
            _doc(2, leak[:8]),                   # first bench gram only
            _doc(3, [f"c{i}" for i in range(20)]),  # clean
            _doc(4, ["tiny"]),                   # shorter than k
        ],
    )
    got = {
        r["doc_id"]: r["hit_grams"]
        for r in decontaminate(train, bench, k=8).collect()
    }
    assert got == {1: 2, 2: 1}


def test_decontaminate_plan_broadcasts_bench(spark):
    """The bench gram set must be the broadcast side — the corpus side
    must not shuffle for the semi join."""
    bench = _mk(spark, [_doc(100, [f"l{i}" for i in range(9)])])
    train = _mk(spark, [_doc(1, [f"t{i}" for i in range(9)])])
    plan = decontaminate(train, bench, k=8)._sc._jvm.PythonSQLUtils.explainString(
        decontaminate(train, bench, k=8)._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def _md5_60_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf8")).hexdigest()[:15], 16)


def test_stratified_sample_matches_python_rule(spark):
    """The exact kept set equals the pure-Python replay of
    u = md5_60('mix:'||id)/2^60 < cap/n_g, and small groups pass whole."""
    rows = [(i, "big") for i in range(200)] + [
        (1000 + i, "small") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    cap = 40
    kept = {
        r["doc_id"]
        for r in stratified_sample(
            df, ["grp"], cap=cap, salt="mix"
        ).collect()
    }
    expect = set()
    for doc_id, grp in rows:
        n_g = 200 if grp == "big" else 10
        u = float(_md5_60_py(f"mix:{doc_id}")) / float(1 << 60)
        if u < min(1.0, cap / n_g):
            expect.add(doc_id)
    assert kept == expect
    assert {i for i in kept if i >= 1000} == set(range(1000, 1010))
    big_kept = len([i for i in kept if i < 1000])
    assert 20 <= big_kept <= 60  # Bernoulli around 40 of 200


def test_stratified_sample_deterministic_across_runs(spark):
    """Same input, same salt -> identical kept rows, independent of
    partitioning."""
    rows = [(i, f"g{i % 3}") for i in range(120)]
    df1 = spark.createDataFrame(rows, "doc_id long, grp string")
    df2 = spark.createDataFrame(rows, "doc_id long, grp string").repartition(7)
    k1 = sorted(
        r["doc_id"] for r in stratified_sample(df1, ["grp"], 15).collect()
    )
    k2 = sorted(
        r["doc_id"] for r in stratified_sample(df2, ["grp"], 15).collect()
    )
    assert k1 == k2


def _span_set(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"]) for r in df.collect()
    }


def test_incremental_flags_corpus_seen_span(spark):
    """A new doc repeating a span the corpus saw ONCE is flagged even
    though it is unique within the batch; batch-unique unseen spans are
    not."""
    seen = [f"s{i}" for i in range(10)]
    corpus = _mk(spark, [_doc(1, seen + ["c0", "c1"])])
    batch = _mk(
        spark,
        [
            _doc(10, ["n0"] + seen),          # corpus-seen -> flagged
            _doc(11, [f"u{i}" for i in range(12)]),  # unseen, unique
        ],
    )
    got = _span_set(
        duplicated_spans_incremental(batch, gram_counts(corpus, k=10), k=10)
    )
    assert got == {(10, 1, 11)}


def test_incremental_equals_monolithic_over_batches(spark):
    """Fold batches through gram_counts state: each batch's incremental
    spans equal the monolithic duplicated_spans over ALL docs ingested
    so far, restricted to that batch — the operator's core claim."""
    rng = random.Random(77)
    k = 4
    batches = []
    next_id = 0
    for _ in range(3):
        rows = []
        for _ in range(12):
            rows.append(
                _doc(
                    next_id,
                    [f"w{rng.randrange(5)}"
                     for _ in range(rng.randrange(3, 25))],
                )
            )
            next_id += 1
        batches.append(rows)
    state = None
    seen_rows: list = []
    for rows in batches:
        batch = _mk(spark, rows)
        if state is None:
            empty = _mk(spark, [])
            state = gram_counts(empty, k=k)
        inc = _span_set(duplicated_spans_incremental(batch, state, k=k))
        seen_rows = seen_rows + rows
        ids = {d for d, _ in rows}
        mono = {
            t
            for t in _span_set(duplicated_spans(_mk(spark, seen_rows), k=k))
            if t[0] in ids
        }
        assert inc == mono
        state = fold_gram_counts(state, gram_counts(batch, k=k))


def test_fold_gram_counts_equals_monolithic(spark):
    """state fold over two batches == gram_counts over the union."""
    a = _mk(spark, [_doc(1, ["x", "y", "z", "x", "y"])])
    b = _mk(spark, [_doc(2, ["x", "y", "q", "r"])])
    folded = {
        (r["gh"], r["c"])
        for r in fold_gram_counts(
            gram_counts(a, k=2), gram_counts(b, k=2)
        ).collect()
    }
    mono = {
        (r["gh"], r["c"])
        for r in gram_counts(a.unionByName(b), k=2).collect()
    }
    assert folded == mono


def test_gram_occurrences_shapes(spark):
    """Gram frame basics: 0-based starts, one row per occurrence,
    nothing for docs shorter than k."""
    g = gram_occurrences(
        _mk(spark, [_doc(1, ["a", "b", "a", "b"]), _doc(2, ["a"])]), k=2
    )
    rows = g.collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert sorted(r["s"] for r in rows) == [0, 1, 2]
    by_start = {r["s"]: r["gh"] for r in rows}
    assert by_start[0] == by_start[2]  # "a b" twice
    assert by_start[0] != by_start[1]


# ---------------------------------------------------------------------------
# pack_sequences — GPT-style sequence packing (segment map)
# ---------------------------------------------------------------------------


def _pack_py(rows, seq_len, n_shards, salt="pack"):
    """Pure-Python replay of the packing rule: hash-shard, concatenate in
    doc_id order, chunk at seq_len — returns the expected segment set."""
    from soweego_spark.operators.dedup import md5_60_py

    segs = set()
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, text in rows:
        n = len([w for w in text.lower().split(" ") if w])
        if n < 1:
            continue
        sh = md5_60_py(f"{salt}:{doc_id}") % n_shards
        by_shard.setdefault(sh, []).append((doc_id, n))
    for sh, docs in by_shard.items():
        pos = 0
        for doc_id, n in sorted(docs):
            st, en = pos, pos + n
            for seq_no in range(st // seq_len, (en - 1) // seq_len + 1):
                lo = max(st, seq_no * seq_len)
                hi = min(en, (seq_no + 1) * seq_len)
                segs.add(
                    (sh, seq_no, doc_id, lo - st, lo - seq_no * seq_len,
                     hi - lo)
                )
            pos = en
    return segs


def test_pack_matches_python_replay(spark):
    """Random small corpus: the Spark segment map equals the pure-Python
    replay of the rule (shard → doc_id order → chunk), including docs
    that straddle several sequence boundaries and empty docs dropped."""
    from soweego_spark.operators.corpus import pack_sequences

    rng = random.Random(42)
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(0, 23))))
        for i in range(60)
    ]
    got = {
        tuple(r)
        for r in pack_sequences(
            _mk(spark, rows), seq_len=8, n_shards=3
        ).collect()
    }
    assert got == _pack_py(rows, seq_len=8, n_shards=3)


def test_pack_sequences_are_full_and_tiled(spark):
    """Every sequence except each shard's last holds exactly seq_len
    tokens, and its segments tile [0, seq_len) without gap or overlap;
    a doc longer than seq_len straddles with contiguous offsets."""
    from soweego_spark.operators.corpus import pack_sequences

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(5 + (i * 7) % 19)))
            for i in range(40)]
    out = pack_sequences(_mk(spark, rows), seq_len=16, n_shards=2).collect()
    by_seq: dict[tuple[int, int], list] = {}
    for r in out:
        by_seq.setdefault((r["shard"], r["seq_no"]), []).append(r)
    last = {}
    for (sh, sq) in by_seq:
        last[sh] = max(last.get(sh, -1), sq)
    for (sh, sq), segs in by_seq.items():
        segs.sort(key=lambda r: r["seg_start"])
        pos = 0
        for s in segs:
            assert s["seg_start"] == pos and s["seg_len"] >= 1
            pos += s["seg_len"]
        if sq != last[sh]:
            assert pos == 16, (sh, sq, pos)
        assert pos <= 16
    # straddling docs: tok_offset advances contiguously across seq_nos
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, segs in by_doc.items():
        segs.sort(key=lambda r: r["seq_no"])
        pos = 0
        for s in segs:
            assert s["tok_offset"] == pos
            pos += s["seg_len"]


def test_pack_invariant_under_partitioning(spark):
    """The segment map is a pure function of the data: identical under
    any input partitioning (the 100-TB determinism claim)."""
    from soweego_spark.operators.corpus import pack_sequences

    rows = [(i, " ".join(f"q{i}_{j}" for j in range(1 + i % 11)))
            for i in range(50)]
    base = _mk(spark, rows)
    a = {tuple(r) for r in
         pack_sequences(base.repartition(1), seq_len=8, n_shards=4).collect()}
    b = {tuple(r) for r in
         pack_sequences(base.repartition(17), seq_len=8, n_shards=4).collect()}
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# epoch_mix — weighted epoch up-sampling
# ---------------------------------------------------------------------------


def test_epoch_mix_matches_python_replay(spark):
    """Copies per doc = floor(w) + (u < frac(w)), replayed in pure Python;
    weight-0 and absent groups drop; epoch indices are 0..copies-1."""
    from soweego_spark.operators.corpus import epoch_mix
    from soweego_spark.operators.dedup import md5_60_py

    weights = {"a": 2.5, "b": 0.25, "c": 1.0, "z": 0.0}
    rows = [(i, f"t{i}", ["a", "b", "c", "z", "missing"][i % 5])
            for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {
        (r["doc_id"], r["source"], r["epoch"])
        for r in epoch_mix(docs, weights, group_col="source").collect()
    }
    expected = set()
    for doc_id, _, src in rows:
        w = weights.get(src)
        if w is None:
            continue
        u = md5_60_py(f"epochs:{doc_id}") / float(1 << 60)
        n = int(w) + (1 if u < w - int(w) else 0)
        for e in range(n):
            expected.add((doc_id, src, e))
    assert got == expected
    # group 'a' (w=2.5): every doc appears 2 or 3 times
    for doc_id, _, src in rows:
        if src == "a":
            copies = sum(1 for g in got if g[0] == doc_id)
            assert copies in (2, 3)
    # weight-0 ('z') and absent ('missing') groups emit nothing
    assert not any(g[1] in ("z", "missing") for g in got)


def test_epoch_mix_expected_multiplicity(spark):
    """Over many docs the realized multiplicity of a fractional-weight
    group approaches w (hash-Bernoulli, not truncation)."""
    from soweego_spark.operators.corpus import epoch_mix

    docs = spark.createDataFrame(
        [(i, "x", "g") for i in range(400)],
        "doc_id long, text string, source string",
    )
    n = epoch_mix(docs, {"g": 1.5}, group_col="source").count()
    assert 400 * 1.3 < n < 400 * 1.7


# ---------------------------------------------------------------------------
# deterministic_shuffle — two-phase global ranking
# ---------------------------------------------------------------------------


def test_shuffle_is_exact_permutation(spark):
    """pos is exactly 0..n-1 and equals the rank in Python's sort by
    (md5_60(seed:keys), keys)."""
    from soweego_spark.operators.corpus import deterministic_shuffle
    from soweego_spark.operators.dedup import md5_60_py

    rows = [(i, i * 11 % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r["a"], r["b"]): r["pos"] for r in
           deterministic_shuffle(df, ["a", "b"], seed="e1",
                                 bucket_bits=4).collect()}
    order = sorted(rows, key=lambda t: (md5_60_py(f"e1:{t[0]}:{t[1]}"), t))
    assert got == {k: i for i, k in enumerate(order)}
    assert sorted(got.values()) == list(range(300))


def test_shuffle_invariant_under_partitioning_and_buckets(spark):
    """The permutation is a pure function of (data, seed): identical for
    any input partitioning and any bucket_bits; a different seed gives a
    different permutation."""
    from soweego_spark.operators.corpus import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "k long")

    def run(frame, seed, bits):
        return {(r["k"], r["pos"]) for r in
                deterministic_shuffle(frame, ["k"], seed=seed,
                                      bucket_bits=bits).collect()}

    a = run(df.repartition(1), "s", 3)
    b = run(df.repartition(13), "s", 8)
    assert a == b
    assert run(df, "s2", 3) != a
