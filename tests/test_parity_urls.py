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
