"""Canonicalization + relevance unit tests.

The 10-URL corpus mirrors the reference's inline test
(core/url_manager.py:472-518) and its expected admit/reject outcomes.
"""

from crawler_seo_spark.functions.urlnorm import (
    base_domain_of,
    canonicalize_url,
    filter_reason,
    is_priority,
    is_relevant,
    url_md5,
)


def test_reference_corpus():
    bd = base_domain_of("https://example.com/")
    cases = {
        "https://example.com/page1": "https://example.com/page1",
        "https://example.com/page1/": "https://example.com/page1",
        "https://example.com/page1?utm_source=test": "https://example.com/page1",
        "https://example.com/page1#section": "https://example.com/page1",
        "https://example.com/page2": "https://example.com/page2",
        "https://example.com/page1/?ref=123": "https://example.com/page1",
        "https://other-domain.com/page": None,
    }
    for raw, want in cases.items():
        assert canonicalize_url(raw, None, bd) == want, raw
    # filtered (canonicalized fine, dropped by relevance)
    assert filter_reason(canonicalize_url(
        "https://example.com/checkout/cart/add/123", None, bd)) == "ECOMMERCE_ENDPOINT"
    assert filter_reason(canonicalize_url(
        "https://example.com/style.css", None, bd)) == "FILE_EXTENSION"
    assert filter_reason("https://example.com/wp-json/x") == "TECHNICAL_PATTERN"


def test_www_and_case():
    bd = base_domain_of("https://WWW.Example.COM/")
    assert bd == "example.com"
    # www-variant matches the domain; netloc spelling is preserved in output
    assert canonicalize_url("https://www.example.com/a", None, bd) \
        == "https://www.example.com/a"


def test_relative_resolution_and_params():
    bd = "example.com"
    out = canonicalize_url("page2?b=2&a=1&a=0", "https://example.com/sub/dir", bd)
    assert out == "https://example.com/sub/page2?a=0&a=1&b=2"
    # blank params dropped (keep_blank_values=False)
    assert canonicalize_url("https://example.com/x?a=&b=1", None, bd) \
        == "https://example.com/x?b=1"
    # all-tracking query collapses to none
    assert canonicalize_url("https://example.com/x?gclid=1&fbclid=2", None, bd) \
        == "https://example.com/x"


def test_path_normalization():
    bd = "example.com"
    assert canonicalize_url("https://example.com//a//b///c/", None, bd) \
        == "https://example.com/a/b/c"
    assert canonicalize_url("https://example.com", None, bd) \
        == "https://example.com/"


def test_schemes_and_junk():
    assert canonicalize_url("mailto:x@y.z", None, "example.com") is None
    assert canonicalize_url("javascript:void(0)", None, "example.com") is None
    assert canonicalize_url("", None, "example.com") is None
    assert canonicalize_url(None, None, "example.com") is None


def test_idempotent():
    bd = "example.com"
    raws = [
        "https://example.com/page1/?ref=1&z=2&a=3#frag",
        "  https://example.com//x//y/?utm_source=a&b=1  ",
        "https://example.com/p?a=b c&d=é",
    ]
    for raw in raws:
        once = canonicalize_url(raw, None, bd)
        assert once is not None
        assert canonicalize_url(once, None, bd) == once


def test_priority_patterns():
    assert is_priority("https://x.test/product/1")
    assert is_priority("https://x.test/categoria/2")
    assert not is_priority("https://x.test/blog/post")


def test_md5_matches_hashlib():
    import hashlib
    u = "https://example.com/page1"
    assert url_md5(u) == hashlib.md5(u.encode()).hexdigest()
    assert is_relevant(u)


def test_invalid_url_filtered_reason():
    """Normalization exceptions surface as INVALID_URL filtered entries
    (reference core/url_manager.py:64-66); out-of-scope urls stay silent."""
    from crawler_seo_spark.functions.analyzers import (
        extract_filtered,
        extract_links,
    )
    from crawler_seo_spark.functions.htmldoc import parse_html
    from crawler_seo_spark.functions.urlnorm import canonicalize_url_ex

    assert canonicalize_url_ex("http://[bad") == (None, True)
    assert canonicalize_url_ex("ftp://x.test/a") == (None, False)
    assert canonicalize_url_ex(
        "https://other.test/", None, "shop.example.test") == (None, False)

    doc = parse_html('<a href="http://[bad">x</a>'
                     '<a href="ftp://elsewhere/">y</a>'
                     '<a href="/fine">z</a>')
    filtered = extract_filtered(doc, "https://shop.example.test/",
                                "shop.example.test")
    assert ("http://[bad", "INVALID_URL") in filtered
    assert all(r != "INVALID_URL" for u, r in filtered if u != "http://[bad")
    assert extract_links(doc, "https://shop.example.test/",
                         "shop.example.test") == \
        ["https://shop.example.test/fine"]
