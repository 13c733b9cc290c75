"""Pure-Python pairwise-similarity kernels (reference: linker/features.py).

Each kernel takes the two sides of ONE candidate pair (lists of strings /
date structs) and returns a float score or None for "missing" — the Spark
layer fills None with FEATURE_MISSING_VALUE (0.0) exactly like the
reference's ``fillna`` (commons/constants.py:359).

Kernels (reference parity):

- ``exact_match``        features.py:108-128  max over cross product, 1/0
- ``levenshtein_max``    features.py:221-251  max of 1 - dist/maxlen
- ``cosine_bow``         features.py:253-315  bag-of-words cosine; we fix the
                         per-pair vocabulary semantics (the reference fits a
                         CountVectorizer per 1000-row chunk, which makes its
                         score depend on chunk boundaries for IDF-free counts
                         — counts are per-document, so per-pair == per-chunk)
- ``shared_tokens``      features.py:435-470  weighted Jaccard with the band
                         low-score-word penalty
- ``shared_tokens_plus`` features.py:627-665  |∩| / min(|L|,|R|) after
                         lowercase+space-split flatten and stop-word removal
"""

from __future__ import annotations

import unicodedata

from soweego_spark.functions.textnorm import BAND_LOW_SCORE_WORDS, tokenize


def exact_match(left: list | None, right: list | None) -> float | None:
    if not left or not right:
        return None
    scores = []
    for a in left:
        for b in right:
            if a is None or b is None:
                scores.append(0.0)
            else:
                scores.append(1.0 if a == b else 0.0)
    return max(scores) if scores else None


def levenshtein_distance(a: str, b: str) -> int:
    """Classic two-row DP edit distance."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(
                min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(a)]


def levenshtein_max(left: list | None, right: list | None) -> float | None:
    """Max over the cross product of ``1 - dist/max(len)``."""
    if not left or not right:
        return None
    best = None
    for a in left:
        for b in right:
            if a is None or b is None:
                score = 0.0
            else:
                longest = max(len(a), len(b))
                score = 1.0 - levenshtein_distance(a, b) / longest if longest else 1.0
            best = score if best is None else max(best, score)
    return best


def _strip_accents(text: str) -> str:
    return "".join(
        ch for ch in unicodedata.normalize("NFKD", text)
        if not unicodedata.combining(ch)
    )


def _char_wb_bigrams(text: str) -> list[str]:
    """sklearn CountVectorizer(analyzer='char_wb', ngram_range=(2,2))
    semantics: lowercase, unicode accent strip, then 2-grams inside
    whitespace-padded words."""
    out: list[str] = []
    for word in _strip_accents(text.lower()).split():
        padded = f" {word} "
        if len(padded) <= 2:
            out.append(padded)
        else:
            out.extend(padded[i : i + 2] for i in range(len(padded) - 1))
    return out


def _count(vals: list[str]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    return counts


def cosine_bow(
    left: list | None, right: list | None, analyzer: str = "split"
) -> float | None:
    """Bag-of-words cosine between the two sides joined with spaces.

    ``analyzer``: 'split' (whitespace terms), 'char_wb' (2-grams in words),
    'soweego' (the engine's tokenize chain).
    """
    if not left or not right:
        return None
    a_text = " ".join(v for v in left if v is not None)
    b_text = " ".join(v for v in right if v is not None)
    if analyzer == "char_wb":
        a_terms, b_terms = _char_wb_bigrams(a_text), _char_wb_bigrams(b_text)
    elif analyzer == "soweego":
        a_terms, b_terms = tokenize(a_text), tokenize(b_text)
    else:
        a_terms, b_terms = a_text.split(), b_text.split()
    ca, cb = _count(a_terms), _count(b_terms)
    if not ca or not cb:
        return None
    dot = sum(n * cb.get(t, 0) for t, n in ca.items())
    na = sum(n * n for n in ca.values()) ** 0.5
    nb = sum(n * n for n in cb.values()) ** 0.5
    return dot / (na * nb) if na and nb else None


def shared_tokens(left: list | None, right: list | None) -> float | None:
    """Weighted Jaccard: (|∩| - 0.9*|∩ ∩ band_stopwords|) / |∪|.

    The right side's values are space-split (the reference's target cells
    hold space-joined token strings, features.py:449-451)."""
    if not left or not right:
        return None
    lset = set(left)
    rset: set[str] = set()
    for value in right:
        if value:
            rset.update(t for t in value.split() if t)
    inter = lset & rset
    union = lset | rset
    if not union:
        return None
    penalty = len(BAND_LOW_SCORE_WORDS & inter)
    return (len(inter) - penalty * 0.9) / len(union)


def shared_tokens_plus(
    left: list | None,
    right: list | None,
    stop_words: frozenset[str] | None = None,
) -> float | None:
    """|∩| / min(|L|,|R|) after lowercasing + space-splitting every element."""
    if not left or not right:
        return None
    lset = {t for el in left if el is not None for t in el.lower().split()}
    rset = {t for el in right if el is not None for t in el.lower().split()}
    if stop_words:
        lset -= stop_words
        rset -= stop_words
    smallest = min(len(lset), len(rset))
    if smallest == 0:
        return None
    return len(lset & rset) / smallest


def shared_ratio_min(left: list | None, right: list | None) -> float | None:
    """|∩| / min(|L|,|R|) over plain sets (SharedOccupations core,
    features.py:540-563, with the class-closure expansion precomputed)."""
    if not left or not right:
        return None
    lset, rset = set(left), set(right)
    smallest = min(len(lset), len(rset))
    if smallest == 0:
        return None
    return len(lset & rset) / smallest


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity (public algorithm; the north_star pairs it with
    Levenshtein for name scoring). Match window = max(len)//2 - 1;
    transpositions counted over the matched subsequences."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if n1 == 0 or n2 == 0:
        return 0.0
    window = max(n1, n2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler: Jaro boosted by the common prefix (<= 4 chars,
    scaling factor 0.1 — Winkler's published constants)."""
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def jaro_winkler_max(left: list | None, right: list | None) -> float | None:
    """Best Jaro-Winkler over the token cross product (the C2 pattern
    with JW instead of Levenshtein)."""
    if not left or not right:
        return None
    best = 0.0
    for a in left:
        for b in right:
            if a is None or b is None:
                continue
            best = max(best, jaro_winkler(a, b))
    return best
