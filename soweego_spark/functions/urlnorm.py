"""Pure-Python URL kernels (parity with soweego/commons/url_utils.py).

``clean``        — url_utils.py:50-56: strip; whitespace splits one cell into
                   several candidate URLs.
``validate``     — url_utils.py:61-100: Django-style URL regex; prepends
                   ``https://`` when the scheme is missing; None if invalid.
``tokenize_url`` — url_utils.py:183-211: netloc tokens minus TLD/prefix
                   stop words; plus percent-decoded path segments split on
                   non-word chars keeping length>1; plus query tokens.
``is_wiki_link`` — url_utils.py:331-335.
``extract_qid``  — the ``Q\\d+`` probe used by the wikidata-url post rule
                   (commons/constants.py:45, linker/link.py:345-367).
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlsplit

TLD_STOPWORDS = frozenset({"com", "org", "net", "info", "fm"})
HOST_PREFIXES = frozenset({"www", "m", "mobile"})

WIKI_PROJECT_MARKERS = (
    "wikipedia",
    "wikibooks",
    "wiktionary",
    "wikiquote",
    "commons.wikimedia",
    "wikisource",
    "wikiversity",
    "wikidata",
    "mediawiki",
    "wikivoyage",
    "meta.wikimedia",
)

_WORD_SPLIT = re.compile(r"\W+")
QID_RE = re.compile(r"Q\d+")

# URL shape check in the spirit of Django's URLValidator (scheme optional).
_UL = "\u00a1-\uffff"
_IPV4 = r"(?:25[0-5]|2[0-4]\d|[0-1]?\d?\d)(?:\.(?:25[0-5]|2[0-4]\d|[0-1]?\d?\d)){3}"
_IPV6 = r"\[[0-9a-f:\.]+\]"
_HOSTNAME = rf"[a-z{_UL}0-9](?:[a-z{_UL}0-9-]{{0,61}}[a-z{_UL}0-9])?"
_DOMAIN = rf"(?:\.(?!-)[a-z{_UL}0-9-]{{1,63}}(?<!-))*"
_TLD = rf"\.(?!-)(?:[a-z{_UL}-]{{2,63}}|xn--[a-z0-9]{{1,59}})(?<!-)\.?"
_HOST = rf"({_HOSTNAME}{_DOMAIN}{_TLD}|localhost)"
URL_RE = re.compile(
    r"^((?:[a-z0-9\.\-\+]*)://)?"
    r"(?:[^\s:@/]+(?::[^\s:@/]*)?@)?"
    rf"(?:{_IPV4}|{_IPV6}|{_HOST})"
    r"(?::\d{2,5})?"
    r"(?:[/?#][^\s]*)?"
    r"\Z",
    re.IGNORECASE,
)


def clean(url: str) -> list[str]:
    stripped = url.strip()
    return stripped.split() if " " in stripped else [stripped]


def validate(url: str) -> str | None:
    match = re.search(URL_RE, url)
    if not match:
        return None
    if not match.group(1):
        return "https://" + match.group()
    return match.group()


def domain_of(url: str) -> str | None:
    try:
        return urlsplit(url).netloc or None
    except ValueError:
        return None


def tokenize_url(url: str, domain_only: bool = False) -> list[str] | None:
    """Sorted token set of a URL; None when the URL cannot be split."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    tokens = set(_WORD_SPLIT.split(parts.netloc))
    tokens -= TLD_STOPWORDS
    tokens -= HOST_PREFIXES
    if domain_only:
        return sorted(tokens)
    for segment in filter(None, parts.path.split("/")):
        tokens.update(
            tok for tok in _WORD_SPLIT.split(unquote(segment)) if len(tok) > 1
        )
    tokens.update(tok for tok in _WORD_SPLIT.split(unquote(parts.query)) if tok)
    return sorted(tokens)


def is_wiki_link(url: str) -> bool:
    host = urlsplit(url).netloc
    return any(marker in host for marker in WIKI_PROJECT_MARKERS)


def extract_qid(url: str) -> str | None:
    match = QID_RE.search(url)
    return match.group() if match else None


def extract_external_id(
    url: str, ext_id_pids_to_urls: dict
) -> tuple[str | None, str | None]:
    """F5 (reference url_utils.py:214-328): match a URL against per-PID
    external-identifier formatter templates; return ``(ext_id, pid)``.

    ``ext_id_pids_to_urls``: {pid: {formatter_url: (id_regex, url_regex)}}
    where ``$1`` in the formatter marks the id slot and the regexes may be
    None, strings, or compiled patterns. Reference quirks preserved exactly:
    HTTPS tidy-up + trailing-slash strip, full-URL regex tried first (first
    group wins), and the early ``(None, None)`` give-up when a candidate
    fragment fails its ID regex (url_utils.py:296-307 returns instead of
    continuing the loop).
    """
    tidy = url.rstrip("/")
    if not tidy.startswith("https"):
        tidy = tidy.replace("http", "https", 1)

    for pid, formatters in ext_id_pids_to_urls.items():
        for formatter_url, (id_regex, url_regex) in formatters.items():
            if url_regex is not None:
                match = re.match(url_regex, url)
                if match is not None:
                    return match.groups()[0], pid

            before, _, after = formatter_url.partition("$1")
            after = after.rstrip("/")
            if tidy.startswith(before) and tidy.endswith(after):
                url_fragment = (
                    tidy[len(before) : -len(after)]
                    if len(after)
                    else tidy[len(before) :]
                )
                if id_regex is None:
                    return url_fragment, pid
                match = re.match(id_regex, url_fragment)
                if match is None:
                    return None, None
                return match.group(), pid

    return None, None
