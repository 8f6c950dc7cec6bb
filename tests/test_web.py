"""Web-curation helpers: URL canonicalization, registrable domains,
HTML stripping (functions/web.py) — edge cases beyond what the catalog
oracles exercise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from forklift_spark.functions import web as W


def _one(spark, expr_col, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr_col.alias("out")).collect()[0].out


@pytest.mark.parametrize(
    "url,expected",
    [
        # tracking-only query disappears entirely, host lowercases, port drops
        ("https://WWW.Ex.COM:443/a/b?utm_source=x&sid=9", "https://www.ex.com/a/b"),
        # tracking params removed from the middle, real params survive in order
        ("https://ex.com/p?a=1&utm_campaign=c&b=2", "https://ex.com/p?a=1&b=2"),
        # tracking param last: no dangling separator
        ("https://ex.com/p?a=1&gclid=zz", "https://ex.com/p?a=1"),
        # fbclid first: '?' is preserved for the surviving param
        ("https://ex.com/p?fbclid=f&keep=1", "https://ex.com/p?keep=1"),
        # no query at all
        ("https://ex.com/p", "https://ex.com/p"),
    ],
)
def test_canonicalize_url_cases(spark, url, expected):
    assert _one(spark, W.canonicalize_url("u"), u=url) == expected


@pytest.mark.parametrize(
    "host,expected",
    [
        ("www.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),  # two-level public suffix
        ("CDN.Example.IO", "example.io"),  # case-insensitive
        ("example.org", "example.org"),  # bare registrable domain
        ("localhost", ""),  # no recognized suffix -> empty
    ],
)
def test_registered_domain_cases(spark, host, expected):
    assert _one(spark, W.registered_domain("h"), h=host) == expected


def test_strip_html_and_markup_accounting(spark):
    html = '<div class="x"><p>Hello  <b>world</b>!</p><img src="a.png"/></div>'
    clean = _one(spark, W.strip_html("h"), h=html)
    assert clean == "Hello world !"
    markup = _one(spark, W.markup_chars("h"), h=html)
    # every char except the visible 'Hello  world!' (13 chars) is markup
    assert markup == len(html) - len("Hello  world!")


def test_strip_html_leaves_plain_text_alone(spark):
    assert _one(spark, W.strip_html("h"), h="no tags here") == "no tags here"



def test_tracking_strip_is_param_boundary_anchored(spark):
    from forklift_spark.functions.web import canonicalize_url

    urls = [
        ("https://e.com/p?psid=9&ref=1",),     # psid is NOT sid
        ("https://e.com/p?classid=7",),        # classid is NOT sid
        ("https://e.com/p?sid=9&ref=1",),      # real sid at string start
        ("https://e.com/p?a=1&sid=9&ref=1",),  # real sid mid-query
    ]
    got = [
        r[0]
        for r in spark.createDataFrame(urls, "u string")
        .select(canonicalize_url("u"))
        .collect()
    ]
    assert got[0] == "https://e.com/p?psid=9&ref=1"
    assert got[1] == "https://e.com/p?classid=7"
    assert got[2] == "https://e.com/p?ref=1"
    assert got[3] == "https://e.com/p?a=1&ref=1"


def test_canonicalize_keeps_non_default_ports(spark):
    from forklift_spark.functions.web import canonicalize_url

    urls = [
        ("https://API.example.com:443/p/1",),  # default port -> dropped
        ("https://api.example.com:8080/p/1",), # explicit port -> kept
        ("http://api.example.com:80/x",),      # http default -> dropped
    ]
    got = [
        r[0]
        for r in spark.createDataFrame(urls, "u string")
        .select(canonicalize_url("u"))
        .collect()
    ]
    assert got[0] == "https://api.example.com/p/1"
    assert got[1] == "https://api.example.com:8080/p/1"
    assert got[2] == "http://api.example.com/x"
