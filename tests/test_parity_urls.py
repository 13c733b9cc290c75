"""Byte-parity of URL kernels vs the reference (url_utils.py)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/reference")

from soweego.commons import url_utils as ref_url  # noqa: E402

from soweego_spark.functions import urlnorm  # noqa: E402

URLS = [
    "https://www.example.com/My%20Page/x?q=1&b=cd",
    "http://m.site.org/artist/john-doe",
    "example.com/no-scheme/path",
    "https://en.wikipedia.org/wiki/Q42",
    "https://www.discogs.com/artist/12345-Some-Name",
    "ftp://files.somewhere.net/a/b",
    "https://mobile.host.info/x%2Fy/z?key=val&k2",
    "https://sub.domain.co.uk/path_with_underscores/and-dashes",
    "not a url at all",
    "https://127.0.0.1:8080/admin",
    "https://www.wikidata.org/wiki/Q1339",
    "   https://padded.com/x   ",
]


@pytest.mark.parametrize("url", URLS)
def test_clean_matches_reference(url):
    assert urlnorm.clean(url) == ref_url.clean(url)


@pytest.mark.parametrize("url", URLS)
def test_validate_matches_reference(url):
    assert urlnorm.validate(url) == ref_url.validate(url)


@pytest.mark.parametrize("url", URLS)
def test_tokenize_matches_reference(url):
    ours = urlnorm.tokenize_url(url)
    theirs = ref_url.tokenize(url)
    assert (ours is None) == (theirs is None)
    if ours is not None:
        assert set(ours) == theirs


@pytest.mark.parametrize("url", URLS)
def test_tokenize_domain_only_matches_reference(url):
    ours = urlnorm.tokenize_url(url, domain_only=True)
    theirs = ref_url.tokenize(url, domain_only=True)
    assert set(ours) == theirs


@pytest.mark.parametrize("url", URLS)
def test_is_wiki_link_matches_reference(url):
    assert urlnorm.is_wiki_link(url) == ref_url.is_wiki_link(url)


def test_qid_extraction():
    assert urlnorm.extract_qid("https://www.wikidata.org/wiki/Q1339") == "Q1339"
    assert urlnorm.extract_qid("https://example.com/no-qid") is None


FORMATTERS = {
    "P1953": {  # Discogs artist ID
        "https://www.discogs.com/artist/$1": (
            __import__("re").compile(r"\d+"),
            __import__("re").compile(r"https?://(?:www\.)?discogs\.com/artist/(\d+)"),
        )
    },
    "P345": {  # IMDb ID, no URL regex
        "https://www.imdb.com/name/$1": (__import__("re").compile(r"nm\d+"), None)
    },
    "P434": {  # MusicBrainz artist, no id regex at all
        "https://musicbrainz.org/artist/$1": (None, None)
    },
}

EXT_ID_URLS = [
    "https://www.discogs.com/artist/12345-Some-Name",
    "http://www.discogs.com/artist/99",
    "https://www.imdb.com/name/nm0000123/",
    "https://www.imdb.com/name/badid/",
    "https://musicbrainz.org/artist/b10bbbfc-cf9e-42e0-be17-e2c3e1d2600d/",
    "https://unrelated.example/x/1",
    "http://musicbrainz.org/artist/abc",
]


@pytest.mark.parametrize("url", EXT_ID_URLS)
def test_extract_external_id_parity(url):
    assert urlnorm.extract_external_id(url, FORMATTERS) == \
        ref_url.get_external_id_from_url(url, FORMATTERS)
