"""Static data resources.

- ``ascii_fold.tsv`` — transliteration map (Latin diacritics + Cyrillic
  romanization) defining the engine's ASCII folding. Same mapping as the
  reference's translation table (soweego/commons/text_utils.py:45-320) so
  extracted text is byte-identical; serialized as data, one
  ``char<TAB>replacement`` pair per line.
- ``stopwords_eng.txt`` — English stop words (snowball list,
  http://snowball.tartarus.org/algorithms/english/stop.txt).
- ``urls_stop_words.txt`` / ``name_stopwords.txt`` / ``common_words_eng.txt``
  / ``band_low_score_words.txt`` — public word lists used by the reference's
  feature scoring (soweego/commons/text_utils.py:19-42).
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources as _ilr


def _read(name: str) -> str:
    # importlib.resources works from plain directories AND from zip
    # archives (spark-submit --py-files ships the package as a zip).
    return (
        _ilr.files(__package__).joinpath(name).read_text(encoding="utf8")
    )


@lru_cache(maxsize=None)
def wordlist(name: str) -> frozenset[str]:
    """Load a one-word-per-line resource file as a frozenset."""
    return frozenset(_read(f"{name}.txt").splitlines())


@lru_cache(maxsize=None)
def ascii_fold_table() -> dict[int, str]:
    """The char->replacement transliteration table for str.translate."""
    table: dict[int, str] = {}
    for line in _read("ascii_fold.tsv").splitlines():
        src, _, repl = line.partition("\t")
        if src:
            table[ord(src)] = repl
    return table
