"""Pure-Python text-normalization kernels.

These define the engine's per-row invariant: byte-identical output versus the
reference's normalization chain (soweego/commons/text_utils.py:323-349).
They are plain functions over Python strings so that

* tests can compare them byte-for-byte against the reference, and
* the Spark layer (:mod:`soweego_spark.functions.text`) can vectorize them
  over Arrow batches without re-implementing the semantics.

Semantics (reference parity):

``normalize``: strip -> transliterate via the ascii_fold table -> lowercase.
``tokenize``:  normalize -> split on ``\\W+`` -> drop tokens of length <= 1
               -> drop stop words -> SET of tokens (we return a sorted list
               for determinism; the reference returns an unordered set).
"""

from __future__ import annotations

import re

from soweego_spark.resources import ascii_fold_table, wordlist

_WORD_SPLIT = re.compile(r"\W+")

STOPWORDS_ENG = wordlist("stopwords_eng")
NAME_STOPWORDS = wordlist("name_stopwords")
BAND_LOW_SCORE_WORDS = wordlist("band_low_score_words")
URL_STOPWORDS = wordlist("urls_stop_words")


def fold_ascii(text: str) -> str:
    """Transliterate diacritics/Cyrillic to ASCII (no strip, no lowering)."""
    return text.translate(ascii_fold_table())


def normalize(text: str) -> tuple[str, str]:
    """Return ``(ascii, ascii_lower)`` — reference text_utils.py:345-349."""
    folded = text.strip().translate(ascii_fold_table())
    return folded, folded.lower()


def tokenize(text: str, stopwords: frozenset[str] = STOPWORDS_ENG) -> list[str]:
    """Normalized token set as a *sorted list* (deterministic serialization).

    Reference parity: text_utils.py:323-342 (which returns a set; equality
    with ``set(tokenize(x))`` is the tested invariant).
    """
    _, lowered = normalize(text)
    out = {
        tok
        for tok in _WORD_SPLIT.split(lowered)
        if len(tok) > 1 and tok not in stopwords
    }
    return sorted(out)
