"""Property-based tests for the canonicalization kernel (hypothesis).

Invariants that must hold for ANY input, because the whole seen-set
construction depends on them:

* determinism — same input, same output;
* idempotence — canonicalize(canonicalize(x)) == canonicalize(x);
* totality — never raises;
* domain closure — output host (lowercased, www-stripped) equals the base
  domain whenever output is not None;
* dedup-variant collapse — fragments, tracking params and trailing slashes
  never produce distinct canonical forms.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_seo_spark.functions.urlnorm import (
    base_domain_of,
    canonicalize_url,
    filter_reason,
    url_md5,
)

BD = "example.com"

path_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~/%", max_size=30)
query_pairs = st.lists(
    st.tuples(st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8),
              st.text(alphabet=string.ascii_letters + string.digits,
                      max_size=8)),
    max_size=4)
any_text = st.text(max_size=60)


def _mk_url(path: str, pairs: list[tuple[str, str]], fragment: str) -> str:
    q = "&".join(f"{k}={v}" for k, v in pairs)
    url = f"https://example.com/{path.lstrip('/')}"
    if q:
        url += f"?{q}"
    if fragment:
        url += f"#{fragment}"
    return url


@settings(max_examples=300, deadline=None)
@given(path_chars, query_pairs, st.text(alphabet=string.ascii_letters,
                                        max_size=8))
def test_idempotent_and_deterministic(path, pairs, fragment):
    url = _mk_url(path, pairs, fragment)
    once = canonicalize_url(url, None, BD)
    again = canonicalize_url(url, None, BD)
    assert once == again
    if once is not None:
        assert canonicalize_url(once, None, BD) == once


@settings(max_examples=300, deadline=None)
@given(any_text)
def test_total_on_garbage(raw):
    # never raises; md5/filter_reason also total on any canonical output
    out = canonicalize_url(raw, "https://example.com/base", BD)
    if out is not None:
        assert out.startswith("http")
        url_md5(out)
        filter_reason(out)


@settings(max_examples=200, deadline=None)
@given(path_chars)
def test_domain_closure(path):
    out = canonicalize_url(_mk_url(path, [], ""), None, BD)
    if out is not None:
        assert base_domain_of(out) == BD


@settings(max_examples=200, deadline=None)
@given(path_chars, query_pairs)
def test_variant_collapse(path, pairs):
    """Fragment / tracking-param / trailing-slash variants must collapse."""
    base = _mk_url(path, pairs, "")
    c0 = canonicalize_url(base, None, BD)
    if c0 is None:
        return
    variants = [
        base + "#section",
        _mk_url(path, pairs + [("utm_source", "x"), ("gclid", "1")], ""),
    ]
    if not base.endswith("/") and "?" not in base:
        variants.append(base + "/")
    for v in variants:
        assert canonicalize_url(v, None, BD) == c0, v


@settings(max_examples=200, deadline=None)
@given(query_pairs)
def test_param_order_invariance(pairs):
    a = _mk_url("p", pairs, "")
    b = _mk_url("p", list(reversed(pairs)), "")
    assert canonicalize_url(a, None, BD) == canonicalize_url(b, None, BD)


# ---------------------------------------------------------------------------
# HTML parser robustness (the parse stage must never raise on crawl input)
# ---------------------------------------------------------------------------

@settings(max_examples=300, deadline=None)
@given(any_text)
def test_parser_total_on_garbage(raw):
    from crawler_seo_spark.functions.analyzers import (
        analyze_headings, analyze_metatags, analyze_mixed_content)
    from crawler_seo_spark.functions.htmldoc import parse_html
    doc = parse_html(raw)
    analyze_headings(doc)
    analyze_metatags(doc)
    analyze_mixed_content(doc, "https://x.test/")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["<h1>", "</h1>", "<h2 style='color:#fff'>", "</h2>", "text",
     "<a href='/x'>", "</a>", "<img src='http://a/b'>", "<title>", "</title>",
     "<!-- c -->", "<meta name='description' content='d'>", "<style>",
     "</style>", "url(http://e/f)", "&amp;", "<p", ">"]), max_size=30))
def test_parser_total_on_tag_soup(parts):
    from crawler_seo_spark.functions.parse import analyze_page
    out = analyze_page("".join(parts), "https://x.test/p", "x.test", True)
    assert isinstance(out["links"], list)
    assert out["h1_count"] >= 0


# ---------------------------------------------------------------------------
# Fast path == slow path (byte parity of the string-op canonicalizer)
# ---------------------------------------------------------------------------

fast_seg = st.text(alphabet=string.ascii_letters + string.digits + "._~-",
                   min_size=1, max_size=10)
fastish_path = st.lists(fast_seg, max_size=4).map(
    lambda segs: "/" + "/".join(segs) if segs else "")
messy = st.text(alphabet=string.ascii_letters + string.digits
                + "/?#%&=;:@ .~_-", max_size=40)


@settings(max_examples=500, deadline=None)
@given(fastish_path, st.booleans(), st.booleans(), st.booleans(),
       st.sampled_from(["example.com", "www.example.com", "EXAMPLE.com",
                        "other.test"]))
def test_fast_path_equals_slow_path_absolute(path, trailing, www, http, host):
    from crawler_seo_spark.functions.urlnorm import (
        _canonicalize_slow,
        canonicalize_url_ex,
    )
    scheme = "http" if http else "https"
    url = f"{scheme}://{host}{path}" + ("/" if trailing else "")
    assert canonicalize_url_ex(url, None, BD) == \
        _canonicalize_slow(url, None, BD)
    assert canonicalize_url_ex(url, None, None) == \
        _canonicalize_slow(url, None, None)


@settings(max_examples=500, deadline=None)
@given(fastish_path, st.booleans(),
       st.sampled_from(["https://example.com/", "https://example.com/a/b",
                        "http://www.example.com/x"]))
def test_fast_path_equals_slow_path_relative(path, trailing, base):
    from crawler_seo_spark.functions.urlnorm import (
        _canonicalize_slow,
        canonicalize_url_ex,
    )
    if not path:
        return
    url = path + ("/" if trailing else "")
    assert canonicalize_url_ex(url, base, BD) == \
        _canonicalize_slow(url, base, BD)


@settings(max_examples=1000, deadline=None)
@given(messy, st.sampled_from([None, "https://example.com/p"]))
def test_fast_path_never_diverges_on_arbitrary_input(u, base):
    """For ARBITRARY strings the public function must agree with the slow
    path — either the fast path declined (fell through) or it produced the
    identical bytes."""
    from crawler_seo_spark.functions.urlnorm import (
        _canonicalize_slow,
        canonicalize_url_ex,
    )
    if not u:
        return  # empty href is guarded out before normalization (C1 spec)
    assert canonicalize_url_ex(u, base, BD) == _canonicalize_slow(u, base, BD)
