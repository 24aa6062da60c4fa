"""htmlops: expr/arrow extraction parity, signals, synth determinism.

The expr path is the 100 TB map-only chain; the arrow path is the
robust streaming parser. On well-formed markup they must agree exactly;
on adversarial markup (attributes containing '>', numeric character
references, misnested tags) only the arrow path is contractual and the
tests pin its behavior directly.
"""

import pytest

from opensmile_spark.htmlops import (
    _parse_html_text, html_signals, html_to_text, synth_html)

WELL_FORMED = [
    (0, "<html><head><title>T</title><style>b{x:1}</style></head>"
        "<body><p>alpha beta</p><p>gamma</p></body></html>"),
    (1, "<div>one<br>two</div><script>var a = 1;</script>tail"),
    (2, "<ul><li>a</li><li>b</li></ul><!-- note --><p>c &amp; d</p>"),
    (3, "no markup at all"),
    (4, "&lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;sp &amp;lt;"),
    (5, "<P>UPPER</P><DIV>case tags</DIV>"),
    (6, ""),
    (7, "<noscript>hidden</noscript>visible"),
    (8, "  <p>  spaced   out  </p>  "),
    (9, "<table><tr><td>r1c1</td></tr><tr><td>r2c1</td></tr></table>"),
]


def _extract(spark, docs, method):
    df = spark.createDataFrame(docs, "doc_id long, html string")
    out = html_to_text(df, method=method).select("doc_id", "text")
    return {r["doc_id"]: r["text"] for r in out.collect()}


def test_expr_arrow_equivalence_wellformed(spark):
    expr = _extract(spark, WELL_FORMED, "expr")
    arrow = _extract(spark, WELL_FORMED, "arrow")
    assert expr == arrow


def test_expr_arrow_equivalence_synth(spark):
    docs = spark.createDataFrame(
        [(i, f"word{j} text sample number {i}".replace("j", str(i)))
         for i, j in zip(range(8), range(8))],
        "doc_id long, text string")
    pages = synth_html(docs).select("doc_id", "html")
    rows = pages.collect()
    raw = [(r["doc_id"], r["html"]) for r in rows]
    assert _extract(spark, raw, "expr") == _extract(spark, raw, "arrow")


def test_extraction_pins(spark):
    got = _extract(spark, WELL_FORMED, "expr")
    assert got[0] == "T\nalpha beta\ngamma"
    assert got[1] == "one\ntwo\ntail"          # script text dropped
    assert got[2] == "a\nb\nc & d"             # comment gone, amp last
    assert got[3] == "no markup at all"
    assert got[4] == '<tag> "q" \'s\' sp &lt;'  # &amp;lt; -> literal &lt;
    assert got[5] == "UPPER\ncase tags"        # case-insensitive tags
    assert got[6] == ""
    assert got[7] == "visible"                 # noscript subtree dropped
    assert got[8] == "spaced out"              # whitespace canonicalized
    assert got[9] == "r1c1\nr2c1"              # tr breaks lines


ADVERSARIAL = [
    # '>' inside an attribute value — regex chain would cut early
    ('<a href="/x" title="a > b">link</a> after', "link after"),
    # numeric character references (decimal + hex)
    ("&#65;&#x42; done", "AB done"),
    # misnested/unclosed tags
    ("<p>open <div>nested</p> stray</div> end", "open nested\nstray\nend"),
    # script with a '<' in code (real-world tokenizer hazard)
    ("<script>if (a<b) { x(); }</script>kept", "kept"),
]


@pytest.mark.parametrize("html,want", ADVERSARIAL)
def test_arrow_path_adversarial(html, want):
    assert _parse_html_text(html) == want


def test_signals(spark):
    page = ('<html><head><title>Hi &amp; bye</title>'
            '<style>abcde</style></head><body>'
            '<a href="/1">one</a><a href="/2">two 2</a>'
            '<p>body text here</p></body></html>')
    df = spark.createDataFrame([(0, page)], "doc_id long, html string")
    r = html_signals(df).collect()[0]
    assert r["n_links"] == 2
    assert r["link_text_chars"] == len("one") + len("two 2")
    assert r["title"] == "Hi & bye"
    assert r["script_style_chars"] == 5
    assert r["text_chars"] == len(_parse_html_text(page))
    assert 0.0 < r["link_density"] < 1.0
    assert 0.0 < r["markup_ratio"] < 1.0
    assert r["n_tags"] > 8


def test_signals_zero_text(spark):
    df = spark.createDataFrame([(0, "<p></p>")], "doc_id long, html string")
    r = html_signals(df).collect()[0]
    assert r["text_chars"] == 0 and r["link_density"] == 0.0


def test_synth_roundtrip_recovers_words(spark):
    """Extraction of the synthetic page must contain every source word —
    the property the oracle gate rides on."""
    docs = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    out = html_to_text(synth_html(docs), method="expr")
    text = out.collect()[0]["text"]
    assert "alpha beta" in text and "delta epsilon" in text
    assert "Doc 7" in text and "score < 1 & done" in text
    assert "var x" not in text and "color" not in text  # script/style gone
    assert "crawler" not in text                        # comment gone


def test_expr_path_is_pure_jvm(spark):
    df = spark.createDataFrame([(0, "<p>x</p>")], "doc_id long, html string")
    plan = html_signals(html_to_text(df))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
