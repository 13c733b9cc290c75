"""n-gram language-ID profile classifier (operators/langid.py)."""

from __future__ import annotations

from soweego_spark.operators.langid import (
    classify_languages,
    train_lang_profiles,
)


def _docs(spark):
    # Planted signal: each "language" has a distinct character inventory.
    rows = [
        (1, "aaa bbb aaa bbb aaa", "aa"),
        (2, "bbb aaa aaa aaa bbb", "aa"),
        (3, "zzz yyy zzz yyy zzz", "zz"),
        (4, "yyy zzz zzz yyy yyy", "zz"),
        (5, "mmm nnn mmm nnn mmm", "mm"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_profiles_deterministic_and_capped(spark):
    docs = _docs(spark)
    p1 = sorted(map(tuple, train_lang_profiles(docs, top_k=5).collect()))
    p2 = sorted(map(tuple, train_lang_profiles(docs, top_k=5).collect()))
    assert p1 == p2 and len(p1) > 0
    per_lang = {}
    for lang, tg, cnt in p1:
        per_lang[lang] = per_lang.get(lang, 0) + 1
        assert cnt > 0
    assert all(v <= 5 for v in per_lang.values())


def test_classifier_recovers_planted_languages(spark):
    docs = _docs(spark)
    profiles = train_lang_profiles(docs, top_k=20)
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in classify_languages(docs, profiles).collect()
    }
    truth = {r["doc_id"]: r["lang"] for r in docs.collect()}
    assert got == truth


def test_classifier_scores_unseen_doc(spark):
    train = _docs(spark)
    profiles = train_lang_profiles(train, top_k=20)
    new = spark.createDataFrame(
        [(99, "aaa aaa bbb"), (100, "qqq qqq qqq")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["predicted_lang"]
        for r in classify_languages(new, profiles).collect()
    }
    assert got.get(99) == "aa"
    # doc 100 shares NO trigram with any profile -> absent (documented)
    assert 100 not in got

