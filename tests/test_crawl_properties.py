"""Property-based invariants for the crawl ops (hypothesis): URL
canonicalization idempotence + decoration invariance, and expr/arrow
HTML extraction agreement on generated well-formed markup."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opensmile_spark.htmlops import _parse_html_text
from opensmile_spark.urlops import normalize_url

label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                min_size=1, max_size=6)
seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1,
              max_size=8)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]))
    user = draw(st.sampled_from(["", "bob@", "a:b@"]))
    host = ".".join(draw(st.lists(label, min_size=1, max_size=3)))
    host = "".join(c.upper() if draw(st.booleans()) else c for c in host)
    port = draw(st.sampled_from(["", ":80", ":443", ":21", ":8080"]))
    nseg = draw(st.integers(0, 3))
    path = "".join(
        "/" * draw(st.integers(1, 2)) + draw(seg) for _ in range(nseg))
    trail = draw(st.sampled_from(["", "/"]))
    params = draw(st.lists(
        st.tuples(st.sampled_from(["a", "zz", "m", "utm_source", "gclid"]),
                  label),
        max_size=4))
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#top", "#a/b?c"]))
    return (f"{scheme}://{user}{host}{port}{path}{trail}"
            + (f"?{query}" if query else "") + frag)


def _norm_batch(spark, us):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(us)],
                               "i long, url string")
    return [r["url_norm"] for r in
            normalize_url(df).orderBy("i").collect()]


@settings(max_examples=8, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=24, unique=True))
def test_normalize_idempotent(spark, us):
    once = _norm_batch(spark, us)
    twice = _norm_batch(spark, once)
    assert twice == once


@settings(max_examples=8, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=16, unique=True))
def test_normalize_invariant_under_decoration(spark, us):
    # adding a tracking param + fragment never changes the key
    # (fragment-carrying inputs are left as-is: appending after '#'
    # would decorate the fragment, a no-op by construction)
    base = _norm_batch(spark, us)
    dec = [u if "#" in u else
           (u + ("&utm_source=zz" if "?" in u else "?utm_source=zz")
            + "#frag")
           for u in us]
    assert _norm_batch(spark, dec) == base


safe_text = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,!?'-", min_size=0,
    max_size=30)


@st.composite
def well_formed_html(draw):
    parts = []
    for _ in range(draw(st.integers(1, 6))):
        kind = draw(st.sampled_from(["p", "div", "li", "b", "i", "span",
                                     "text", "br", "comment", "script"]))
        body = draw(safe_text)
        if kind == "text":
            parts.append(body)
        elif kind == "br":
            parts.append("<br>")
        elif kind == "comment":
            parts.append(f"<!-- {body} -->")
        elif kind == "script":
            parts.append(f"<script>var x = '{body}';</script>")
        else:
            parts.append(f"<{kind}>{body}</{kind}>")
    return "".join(parts)


@settings(max_examples=8, deadline=None)
@given(st.lists(well_formed_html(), min_size=1, max_size=24))
def test_expr_equals_arrow_on_generated_markup(spark, pages):
    from opensmile_spark.htmlops import html_to_text

    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)],
                               "i long, html string")
    expr = [r["text"] for r in
            html_to_text(df, method="expr").orderBy("i").collect()]
    arrow = [r["text"] for r in
             html_to_text(df, method="arrow").orderBy("i").collect()]
    assert expr == arrow
    # and both match the reference python parser directly
    assert arrow == [_parse_html_text(p) for p in pages]


@pytest.mark.parametrize("u", ["", "not a url", "http://", "://x",
                               "https://h?#", "relative/only"])
def test_normalize_never_raises_on_junk(spark, u):
    df = spark.createDataFrame([(0, u)], "i long, url string")
    normalize_url(df).collect()  # must not raise
