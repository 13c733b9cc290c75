"""Gopher-style quality metrics, PII scrubbing, deterministic sampling
(operators/textquality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from soweego_spark.operators.textquality import (
    deterministic_sample,
    gopher_quality,
    scrub_pii,
)


def test_gopher_metrics_and_verdict(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spam spam spam spam spam spam"),          # repetitive
            (3, "hi"),                                      # too short
            (4, "pneumonoultramicroscopicsilicovolcanoconiosis " * 4),
        ],
        "doc_id long, text string",
    )
    m = {r["id"]: r.asDict() for r in gopher_quality(docs).collect()}

    assert m[1]["word_count"] == 9
    assert m[1]["distinct_ratio"] == 8 / 9  # 'the' twice
    # 'the quick'..'lazy dog': every bigram unique -> top frac 1/8
    assert m[1]["top_bigram_frac"] == 1 / 8
    assert m[1]["quality_pass"] is True

    # 'spam spam' appears 5 times over 5 bigrams -> frac 1.0; distinct 1/6
    assert m[2]["top_bigram_frac"] == 1.0
    assert m[2]["distinct_ratio"] == 1 / 6
    assert m[2]["quality_pass"] is False

    assert m[3]["word_count"] == 1
    assert m[3]["top_bigram_frac"] == 0.0  # no bigrams at all
    assert m[3]["quality_pass"] is False   # min_words

    assert m[4]["mean_word_len"] > 12
    assert m[4]["quality_pass"] is False   # mean word length


def test_scrub_pii_patterns_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org or ADMIN@X.CO now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +1 (555) 010-7788 today"),
            (4, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in scrub_pii(docs).collect()}
    assert got[1]["n_emails"] == 2 and "<EMAIL>" in got[1]["text_scrubbed"]
    assert "a.b+c@ex-ample.org" not in got[1]["text_scrubbed"]
    assert got[2]["n_ips"] == 2
    assert got[2]["text_scrubbed"] == "server at <IP> and <IP> up"
    assert got[3]["n_phones"] == 1
    assert got[3]["text_scrubbed"] == "call <PHONE> today"
    assert got[4]["text_scrubbed"] == got[4]["text"]
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (
        0, 0, 0,
    )


def test_scrub_pii_order_email_before_phone(spark):
    """Digit-heavy email local parts must be consumed by the email pass,
    not shredded by the phone pass."""
    docs = spark.createDataFrame(
        [(1, "reach 5550107788@txt.example.net ok")],
        "doc_id long, text string",
    )
    row = scrub_pii(docs).first()
    assert row["text_scrubbed"] == "reach <EMAIL> ok"
    assert row["n_emails"] == 1 and row["n_phones"] == 0


def test_deterministic_sample_stable_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"row{i}") for i in range(500)], "k long, v string"
    )
    s1 = [r["k"] for r in deterministic_sample(df, 20, "k").collect()]
    s2 = [
        r["k"]
        for r in deterministic_sample(df.repartition(13), 20, "k").collect()
    ]
    assert len(s1) == 20
    assert s1 == s2  # partition-layout independent, unlike df.sample
    assert set(s1) <= set(range(500))


def test_gopher_empty_and_whitespace_docs_fail_not_throw(spark):
    """ANSI mode: zero-token docs must produce a failing verdict, not a
    DIVIDE_BY_ZERO (empty/junk docs are the filter's whole purpose)."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "ok words here enough")],
        "doc_id long, text string",
    )
    m = {r["id"]: r.asDict() for r in gopher_quality(docs).collect()}
    assert m[1]["word_count"] == 0 and m[1]["quality_pass"] is False
    assert m[2]["word_count"] == 0 and m[2]["quality_pass"] is False
    assert m[1]["mean_word_len"] == 0.0 and m[1]["distinct_ratio"] == 0.0
    assert m[3]["quality_pass"] is True


def test_gopher_bigram_mode_fold_matches_counter(spark):
    """r7: the in-row sorted-fold bigram mode (zero-exchange) equals a
    Python Counter mode on random repetitive texts — the integer the old
    explode -> groupBy(id, gram) -> max pipeline produced."""
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "spam", "egg"]
    rows = []
    for i in range(40):
        n = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r.asDict() for r in gopher_quality(docs).collect()
    }
    for i, text in rows:
        words = [w for w in text.lower().split() if w]
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        top = max(Counter(bigrams).values()) if bigrams else 0
        denom = max(len(words) - 1, 1)
        assert got[i]["top_bigram_frac"] == top / denom, (
            i, text, got[i]["top_bigram_frac"], top, denom,
        )
