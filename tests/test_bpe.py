"""BPE tokenizer semantics (operators/bpe.py): trainer determinism, the
single-pass sentinel merge-application spec, cross-implementation trainer
agreement (string-based operator trainer vs the tuple-based oracle trainer
in __spark_entry__.py), Spark-vs-Python encode identity, and the
partitioning invariance / plan shape of the distributed encode.

The driver gates (`bpe_merges` / `bpe_encode` / `bpe_vocab`) hash-check
the whole algorithm against DuckDB on the synthetic documents table; these
tests carry the semantics on planted shapes the tiny gate vocabulary
can't reach: repeated-char runs, ties, early stop, unicode, newlines
inside words, and the classic Sennrich example.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from soweego_spark.operators.bpe import (
    SEP,
    bpe_encode,
    bpe_encode_docs,
    bpe_train,
    bpe_vocab,
    encode_word_py,
    learn_merges_from_counts,
    spaced_py,
    word_type_counts,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- trainer


def test_classic_sennrich_example():
    """The canonical low/lower/newest/widest corpus: first merges pick the
    most frequent adjacent pairs deterministically."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges_from_counts(counts, 4)
    # 'es' (9) then 'est' (9) dominate, then 'lo' (7), then 'low' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")
    assert encode_word_py("lowest", merges) == ["low", "est"]
    assert encode_word_py("newest", merges) == ["n", "e", "w", "est"]


def test_tie_breaks_lexicographic():
    """Equal-count pairs resolve to the lexicographically smallest, so
    training is a pure function of the counts."""
    merges = learn_merges_from_counts([("ba", 3), ("ab", 3)], 1)
    assert merges == [("a", "b")]


def test_min_count_stops_early():
    counts = [("ab", 1), ("cd", 1)]
    assert learn_merges_from_counts(counts, 10, min_count=2) == []
    assert len(learn_merges_from_counts(counts, 10, min_count=1)) > 0


def test_repeated_run_single_pass_semantics():
    """[a,a,a,a] under merge (a,a) becomes [aa,a,a] — the documented
    single-pass variant: the trailing separator of a match is consumed, so
    the immediately following pair is ineligible."""
    merges = [("a", "a")]
    assert encode_word_py("aaa", merges) == ["aa", "a"]
    assert encode_word_py("aaaa", merges) == ["aa", "a", "a"]
    assert encode_word_py("aaaaaa", merges) == ["aa", "a", "aa", "a"]


def test_trainer_sees_encode_symbolization():
    """Training applies merges with the same single-pass rule encoding
    uses, so learned pair counts always reflect the real symbol stream:
    after (a,a) on 'aaaa' -> [aa,a,a] the residual (a,a) pair survives and
    ties with (aa,a) at count 5 — the lexicographic rule re-learns (a,a),
    which then merges the residue. A repeated merge is valid and both
    trainers must produce it identically."""
    merges = learn_merges_from_counts([("aaaa", 5)], 2, min_count=2)
    assert merges == [("a", "a"), ("a", "a")]
    assert encode_word_py("aaaa", merges) == ["aa", "aa"]


def test_string_and_tuple_trainers_agree_randomized():
    """The operator's string-based trainer and the oracle's independent
    tuple-based trainer (__spark_entry__) implement the same spec — pinned
    on 200 random corpora including repeated-char runs and ties."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "entry_for_bpe_test", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    rng = random.Random(7)
    # tiny alphabet -> dense ties, runs, and repeated-merge cases
    for trial in range(200):
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 12))
        ]
        counts = [(w, rng.randint(1, 5)) for w in words]
        n = rng.randint(1, 8)
        got_s = learn_merges_from_counts(list(counts), n)
        got_t = entry._bpe_learn_tuple(list(counts), n, 2)
        assert got_s == got_t, (trial, counts, n, got_s, got_t)


# ------------------------------------------------------------- encoding


def test_spark_encode_matches_python_replay(spark):
    """Distributed encode == per-word Python replay on a randomized corpus
    with unicode, runs, and newline-bearing words."""
    rng = random.Random(13)
    vocab = ["björk", "aaaa", "ab", "banana", "résumé", "a\nb", "x"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
        for i in range(30)
    ]
    docs = _mk(spark, rows)
    merges = bpe_train(docs, n_merges=12, min_count=2)
    got = {
        (r["doc_id"], r["wpos"]): list(r["toks"])
        for r in bpe_encode(docs, merges).collect()
    }
    want = {}
    for doc_id, text in rows:
        words = [w for w in text.lower().split(" ") if w]
        for pos, w in enumerate(words):
            want[(doc_id, pos)] = encode_word_py(w, merges)
    assert got == want


def test_encode_docs_orders_and_counts(spark):
    docs = _mk(spark, [(1, "ab ab cd"), (2, ""), (3, "ab")])
    merges = [("a", "b")]
    out = {r["doc_id"]: r for r in bpe_encode_docs(docs, merges).collect()}
    assert list(out[1]["tokens"]) == ["ab", "ab", "c", "d"]
    assert out[1]["n_tokens"] == 4
    assert list(out[3]["tokens"]) == ["ab"]
    assert 2 not in out  # zero-word docs drop, like the whitespace split


def test_vocab_counts_types_and_occurrences(spark):
    docs = _mk(spark, [(1, "ab ab xa"), (2, "ab xb")])
    merges = [("a", "b")]
    got = {
        r["token"]: (r["n_occurrences"], r["n_types"])
        for r in bpe_vocab(docs, merges).collect()
    }
    # 'ab' x3 from type 'ab'; 'x' from types 'xa' and 'xb' (1 occ each)
    assert got["ab"] == (3, 1)
    assert got["x"] == (2, 2)
    assert got["a"] == (1, 1)  # the 'a' in 'xa' (not preceded by sep+a+b)
    assert got["b"] == (1, 1)


def test_separator_chars_are_stripped(spark):
    """\\x1f / \\x1e in input text are deleted up front, so no symbol can
    ever contain a sentinel and the fold stays unambiguous."""
    docs = _mk(spark, [(1, f"a{SEP}b a\x1eb")])
    counts = {
        r["word"]: r["cnt"] for r in word_type_counts(docs).collect()
    }
    assert counts == {"ab": 2}


def test_type_cap_bounds_training(spark):
    """type_cap truncates most-frequent-first (cnt desc, word asc) — the
    bounded driver transfer."""
    docs = _mk(spark, [(1, "zz zz zz yy yy xx")])
    # cap=1 -> trains on {'zz': 3} only; best pair is (z, z)
    merges = bpe_train(docs, n_merges=1, type_cap=1, min_count=2)
    assert merges == [("z", "z")]


def test_partitioning_invariance(spark):
    rows = [(i, f"w{i % 5} common common w{i % 3}") for i in range(40)]
    docs = _mk(spark, rows)
    merges = bpe_train(docs, n_merges=6)
    a = sorted(
        (r["doc_id"], r["wpos"], r["enc"])
        for r in bpe_encode(docs, merges).collect()
    )
    b = sorted(
        (r["doc_id"], r["wpos"], r["enc"])
        for r in bpe_encode(docs.repartition(13), merges).collect()
    )
    assert a == b
    assert merges == bpe_train(docs.repartition(17), n_merges=6)


def test_encode_plan_stays_jvm_side(spark):
    """The corpus-path encode is pure Catalyst: no Python UDFs (the fold
    is a native HOF over the broadcast merge column) and no cartesian
    product (the one-row merge frame broadcasts)."""
    docs = _mk(spark, [(1, "ab ab cd"), (2, "ab")])
    plan = (
        bpe_encode(docs, [("a", "b")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
