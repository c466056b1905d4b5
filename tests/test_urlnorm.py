"""Unit + property tests for the equality-critical URL kernel
(SURVEY.md §5.2-5.3). No Spark needed — the kernel is shared between
the engine UDFs and the oracle by construction."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yacy_grid_crawler_spark.functions.urlnorm import (
    canonicalize_url,
    content_domain,
    smart_sld,
    url_ext,
    url_host,
    url_id,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("http://Example.ORG/a", "http://example.org/a"),
        ("HTTP://example.org", "http://example.org/"),
        ("http://example.org:80/a", "http://example.org/a"),
        ("https://example.org:443/a", "https://example.org/a"),
        ("http://example.org:8080/a", "http://example.org:8080/a"),
        ("http://example.org/a#frag", "http://example.org/a"),
        ("http://example.org/a/../b", "http://example.org/b"),
        ("http://example.org/a/./b", "http://example.org/a/b"),
        ("http://example.org//a//b", "http://example.org/a/b"),
        ("http://example.org/a/", "http://example.org/a/"),
        ("http://example.org/%7Euser", "http://example.org/~user"),
        ("http://example.org/a?q=1#f", "http://example.org/a?q=1"),
        ("http://example.org/a?", "http://example.org/a"),
        ("example.org/x", "http://example.org/x"),
        ("ftp://Host.example/file", "ftp://host.example/file"),
        ("http://user:pw@example.org/a", "http://user:pw@example.org/a"),
    ],
)
def test_canonical_forms(raw, expected):
    assert canonicalize_url(raw) == expected


@pytest.mark.parametrize(
    "raw",
    [
        "",
        "http://",
        "mailto:x@y.z",
        "javascript:void(0)",
        "http://bad host/with space",
        "gopher://old.example/x",
        "http://example.org:notaport/",
        "notaurl with space",
    ],
)
def test_malformed_dropped(raw):
    assert canonicalize_url(raw) is None


def test_url_id_is_md5_of_normal_form():
    import hashlib

    u = canonicalize_url("HTTP://Example.org/a#x")
    assert url_id(u) == hashlib.md5(b"http://example.org/a").hexdigest()


@pytest.mark.parametrize(
    "u,host",
    [
        ("http://example.org/a", "example.org"),
        ("http://example.org:8080/a", "example.org"),
        ("http://u:p@example.org/a", "example.org"),
    ],
)
def test_url_host(u, host):
    assert url_host(u) == host


@pytest.mark.parametrize(
    "u,dom",
    [
        ("http://x.org/a.html", "text"),
        ("http://x.org/a.jpg", "image"),
        ("http://x.org/a.mp3", "audio"),
        ("http://x.org/a.mp4", "video"),
        ("http://x.org/a.zip", "app"),
        ("http://x.org/a", "all"),
        ("http://x.org/a.unknownx", "all"),
        ("http://x.org/dir.zip/page", "all"),  # extension from LAST segment only
    ],
)
def test_content_domain(u, dom):
    assert content_domain(u) == dom


def test_url_ext_query_stripped():
    assert url_ext("http://x.org/a.jpg?size=2") == "jpg"


@pytest.mark.parametrize(
    "host,sld",
    [
        ("www.example.org", "example"),
        ("example.org", "example"),
        ("a.b.co.uk", "b"),
        ("localhost", "localhost"),
        ("192.168.0.1", "192.168.0.1"),
    ],
)
def test_smart_sld(host, sld):
    assert smart_sld(host) == sld


# --- property tests (SURVEY.md §5.2) ---

url_strategy = st.builds(
    lambda scheme, host, path, frag: f"{scheme}://{host}/{path}{frag}",
    st.sampled_from(["http", "HTTP", "https", "ftp"]),
    st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,20}[A-Za-z0-9]", fullmatch=True),
    st.from_regex(r"[A-Za-z0-9._~/%-]{0,30}", fullmatch=True),
    st.sampled_from(["", "#frag", "#"]),
)


@given(url_strategy)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    if c is not None:
        assert canonicalize_url(c) == c, f"not idempotent: {u!r} -> {c!r}"


@given(url_strategy)
@settings(max_examples=200, deadline=None)
def test_fragment_invariance(u):
    base = u.split("#")[0]
    assert canonicalize_url(u) == canonicalize_url(base)


# --- vectorized fast-path equality (the hot kernel must equal the spec) ---

vec_url_strategy = st.builds(
    lambda scheme, host, port, path, query, frag: f"{scheme}://{host}{port}/{path}{query}{frag}",
    st.sampled_from(["http", "HTTP", "https", "ftp", "Https"]),
    st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}[A-Za-z0-9]", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080", ":0", ":x"]),
    st.from_regex(r"[A-Za-z0-9._~/%!$&'()*+,;=:@-]{0,30}", fullmatch=True),
    st.sampled_from(["", "?a=1", "?", "?a=%20b"]),
    st.sampled_from(["", "#frag"]),
)


@given(st.lists(vec_url_strategy, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_vectorized_equals_spec(urls):
    import pandas as pd

    from yacy_grid_crawler_spark.functions.urlnorm import (
        canonicalize_series,
        content_domain,
        content_domain_series,
    )

    s = pd.Series(urls, dtype=object)
    vec = canonicalize_series(s)
    for raw, got in zip(urls, vec):
        want = canonicalize_url(raw)
        got = None if pd.isna(got) else got
        assert got == want, f"fast-path drift: {raw!r} spec={want!r} vec={got!r}"
    doms = content_domain_series(vec)
    for canon, got in zip(vec, doms):
        if pd.isna(canon):
            assert pd.isna(got)
        else:
            assert got == content_domain(canon), f"domain drift on {canon!r}"


def test_vectorized_fast_gate_is_identity_only():
    """Anything the fast gate accepts must be a fixed point of the
    scalar spec (the gate's one correctness obligation)."""
    import pandas as pd

    from yacy_grid_crawler_spark.functions.urlnorm import (
        _FAST_CANONICAL_RE,
        canonicalize_url,
    )

    accepted = [
        "http://a.com/",
        "https://sub.a-b.com/p/q/r.PDF",
        "http://a.com/.hidden",
        "http://a.com/a.b.c/d.e",
        "http://x.org/a/b/",
        "http://x.org/a~b/_c-d",
    ]
    for u in accepted:
        assert _FAST_CANONICAL_RE.match(u), u
        assert canonicalize_url(u) == u, u
    rejected_needing_work = [
        "http://a.com",        # missing path
        "HTTP://a.com/x",      # uppercase scheme
        "http://A.com/x",      # uppercase host
        "http://a.com:80/x",   # default port strip
        "http://a.com//x",     # empty segment
        "http://a.com/./x",    # dot segment
        "http://a.com/a/../b", # dotdot segment
        "http://a.com/%7Ex",   # pct decode
        "http://a.com/x?q=1",  # query (pct-normal pass required)
        "http://a.com/x#f",    # fragment strip
        "http://u@a.com/x",    # userinfo
        "http://a.com./x",     # trailing host dot
    ]
    for u in rejected_needing_work:
        assert not _FAST_CANONICAL_RE.match(u), f"gate must reject {u!r}"


def test_tier2_gate_subset_of_spec_identity():
    """Every tier-2 URL's python-side repair (lower head + strip
    fragment) must equal canonicalize_url exactly."""
    from yacy_grid_crawler_spark.functions.urlnorm import (
        _TIER2_CANONICAL_RE,
        canonicalize_url,
    )

    cases = [
        "HTTP://Host0.Example.ORG/page/1.html",
        "hTtPs://A.B/x/y/",
        "http://a.com/x.html#frag",
        "HTTP://A.COM/Path.CASE/kept#f#g",
        "http://a.com/#",
        "HTTPS://A-B.c0m/",
        "http://a.com/x#frag/with/slash?and=query",
    ]
    for u in cases:
        assert _TIER2_CANONICAL_RE.match(u), u
        base = u.split("#", 1)[0]
        head, _, rest = base.partition("//")
        hostpart, slash, path = rest.partition("/")
        fixed = head.lower() + "//" + hostpart.lower() + slash + path
        assert fixed == canonicalize_url(u), u
    # NOT tier-2: whitespace in fragment (spec: malformed), ports,
    # query, pct, dot segments, userinfo
    for u in [
        "http://a.com/x#f g",
        "http://a.com:80/x",
        "http://a.com/x?q=1",
        "http://a.com/p%20q",
        "http://a.com/a/../b",
        "http://u@a.com/x",
        "http://a.com./x",
        "http://a.com/x\n",
        # dot segments terminated by '#' (round-2 hypothesis counterexample:
        # the repair would keep '/.' where the spec resolves it to '/')
        "HTTP://Host.Example.org/.#",
        "http://a.com/a/..#frag",
        "http://a.com/..#",
        "http://a.com/a/.#x",
    ]:
        assert not _TIER2_CANONICAL_RE.match(u), u


@given(st.text(alphabet="abcXYZ09.-_~/#: \n%?", max_size=40))
def test_tier2_fix_equals_spec_on_gate(suffix):
    """Property: whenever the tier-2 gate accepts, the string repair
    equals the full spec canonicalization."""
    from yacy_grid_crawler_spark.functions.urlnorm import (
        _TIER2_CANONICAL_RE,
        canonicalize_url,
    )

    u = "HTTP://Host.Example.org/" + suffix
    if not _TIER2_CANONICAL_RE.match(u):
        return
    base = u.split("#", 1)[0]
    head, _, rest = base.partition("//")
    hostpart, slash, path = rest.partition("/")
    fixed = head.lower() + "//" + hostpart.lower() + slash + path
    assert fixed == canonicalize_url(u)


def test_pct_encoded_dot_segments_resolve():
    """WHATWG dot-segment mapping: '%2e'-shaped segments are dot
    segments BEFORE resolution (hypothesis-found idempotence break:
    'http://A0/%2E' -> 'http://a0/.' -> second pass 'http://a0/')."""
    from yacy_grid_crawler_spark.functions.urlnorm import canonicalize_url

    cases = {
        "http://A0/%2E": "http://a0/",
        "http://a.com/%2e": "http://a.com/",
        "http://a.com/a/%2E%2E": "http://a.com/",
        "http://a.com/a/%2e.": "http://a.com/",
        "http://a.com/a/.%2E/b": "http://a.com/b",
        "http://a.com/%2e/x": "http://a.com/x",
        # NOT dot segments: decode leaves a non-dot residue
        "http://a.com/a%2e": "http://a.com/a.",
        "http://a.com/%2ex": "http://a.com/.x",
    }
    for raw, want in cases.items():
        got = canonicalize_url(raw)
        assert got == want, f"{raw!r} -> {got!r}, want {want!r}"
        assert canonicalize_url(got) == got, f"not idempotent: {got!r}"


def test_pct_encoded_slash_stays_encoded():
    """'%2F' is data, not a separator: it must survive canonicalization
    ENCODED (whole-path decode produced 'http://a0//' which a second
    pass collapses — idempotence break)."""
    from yacy_grid_crawler_spark.functions.urlnorm import canonicalize_url

    cases = {
        "http://A0/%2F": "http://a0/%2F",
        "http://a.com/a%2Fb": "http://a.com/a%2Fb",
        "http://a.com/a%2fb/c": "http://a.com/a%2Fb/c",
    }
    for raw, want in cases.items():
        got = canonicalize_url(raw)
        assert got == want, f"{raw!r} -> {got!r}, want {want!r}"
        assert canonicalize_url(got) == got, f"not idempotent: {got!r}"


def test_multi_colon_authority_is_malformed():
    """'http://::' once parsed host=':' then round-tripped to None —
    multi-colon authorities (unbracketed IPv6, junk) are malformed."""
    from yacy_grid_crawler_spark.functions.urlnorm import canonicalize_url

    for u in ["http://::", "http://a:1:2/x", "http://:/", "http://:80/"]:
        assert canonicalize_url(u) is None, u
