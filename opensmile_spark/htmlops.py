"""HTML -> text extraction for web-crawl training-data pipelines.

A 100 TB pretraining corpus starts as crawled HTML; the first pipeline
stage is main-text extraction plus structure signals (link density,
script/style share) that downstream quality filters consume (the same
role CCNet/trafilatura play in public pipelines). Two execution paths:

  html_to_text(method='expr')   pure built-in regexp_replace chain —
      JVM codegen, zero Python, map-only. The 100 TB fast path, and the
      one mirrored ANSI-SQL-for-ANSI-SQL by the oracle gate (Java regex
      on the Spark side, RE2 on the DuckDB side — the gate doubles as a
      cross-engine regex-dialect parity check, so the chain deliberately
      uses only syntax both engines implement: inline (?is) flags, lazy
      quantifiers, no backreferences or lookaround).
  html_to_text(method='arrow')  stdlib html.parser inside mapInPandas —
      handles what no regex can (attribute values containing '>',
      numeric character references, CDATA, misnested tags). Arrow-batched,
      still distributed; for the adversarial tail of a real crawl.

html_signals emits the structure metrics; synth_html builds a
deterministic page per document row so tests and the oracle gate have
HTML inputs without external data (TESTDATA documents are plain text).

Reference analogy: the reference's source components normalize raw
container formats into the numeric data plane (SURVEY.md §2.1,
/root/reference/src/iocore/waveSource.cpp:1); htmlops is the same
normalization boundary for the text modality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Block-level elements whose close (or self-close) becomes a newline so
# extracted text keeps paragraph/list/row structure. Shared with the SQL
# twin via block_break_pattern().
_BLOCK_TAGS = ("p", "div", "li", "ul", "ol", "table", "tr", "h1", "h2",
               "h3", "h4", "h5", "h6", "section", "article", "header",
               "footer", "nav", "blockquote", "pre", "title", "head")

# Entity decode table for the expr path; '&amp;' MUST be last so
# '&amp;lt;' decodes to the literal '&lt;', not '<'. Numeric character
# references are arrow-path-only (documented above).
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]


def block_break_pattern() -> str:
    """Regex matching a block-element break (close tag, or <br>/<hr>)."""
    alts = "|".join(_BLOCK_TAGS)
    return rf"(?i)</(?:{alts})\s*>|<(?:br|hr)\s*/?>"


def strip_tags_exprs(html_col):
    """The shared regexp chain as a Column expression (expr path core).

    Order matters and is part of the contract:
      1. comments out first (a commented-out <script> must not arm step 2)
      2. script/style/noscript subtrees dropped WITH their text content
      3. block breaks -> newline, then every remaining tag -> ''
      4. entities decoded (amp last)
      5. whitespace canonicalized: runs containing a newline collapse to
         one '\\n', residual space/tab runs to one ' ', ends trimmed
    """
    c = F.regexp_replace(html_col, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(
        c, r"(?is)<(script|style|noscript)\b[^>]*>.*?</(script|style|noscript)\s*>", "")
    c = F.regexp_replace(c, block_break_pattern(), "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", "")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"[^\S\n]*\n\s*", "\n")
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    # regex trim, not F.trim: SQL trim strips spaces only, and the parser
    # path's str.strip() removes newlines too — keep the contracts equal
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def html_to_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text", method: str = "expr") -> DataFrame:
    """Extract visible text from an HTML column.

    method='expr' (default): the codegen'd regexp chain above — map-only,
    zero Python, the plan a 1000-executor scan wants. method='arrow': a
    real streaming parser (stdlib html.parser) in an Arrow-batched
    mapInPandas kernel for markup the regex chain cannot be correct on.
    Both produce identical text on well-formed pages
    (tests/test_htmlops.py pins the equivalence).
    """
    if method == "expr":
        return df.withColumn(out_col, strip_tags_exprs(F.col(html_col)))
    if method != "arrow":
        raise ValueError(f"unknown method {method!r}")

    keep = [f.name for f in df.schema.fields if f.name != out_col]
    fields = [f"`{f.name}` {f.dataType.simpleString()}"
              for f in df.schema.fields if f.name != out_col]
    schema = ", ".join(fields + [f"`{out_col}` string"])

    def run(batches):
        import pandas as pd
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                _parse_html_text(h) if isinstance(h, str) else None
                for h in pdf[html_col]]
            yield pd.DataFrame({c: pdf[c] for c in keep + [out_col]})

    return df.mapInPandas(run, schema=schema)


def _parse_html_text(html: str) -> str:
    """Visible-text extraction with the stdlib streaming parser.

    Same output contract as the expr chain (block tags break lines,
    script/style dropped, entities decoded, whitespace canonicalized) but
    robust to '>' inside attribute values, numeric character references,
    and unclosed/misnested tags.
    """
    import re
    from html.parser import HTMLParser

    class _Extract(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.parts: list[str] = []
            self.skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style", "noscript"):
                self.skip += 1
            elif tag in ("br", "hr"):
                self.parts.append("\n")

        def handle_endtag(self, tag):
            if tag in ("script", "style", "noscript"):
                self.skip = max(0, self.skip - 1)
            elif tag in _BLOCK_TAGS:
                self.parts.append("\n")

        def handle_data(self, data):
            if not self.skip:
                self.parts.append(data)

    p = _Extract()
    p.feed(html)
    p.close()
    text = "".join(p.parts)
    # convert_charrefs decodes &nbsp;/&#160; to U+00A0; the expr chain's
    # contract maps nbsp to a plain space — keep the two paths equal
    text = text.replace("\xa0", " ")
    text = re.sub(r"[^\S\n]*\n\s*", "\n", text)
    text = re.sub(r"[ \t\r\f]+", " ", text)
    return text.strip()


def html_signals(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Structure metrics a crawl-quality filter consumes, all built-in
    expressions (map-only, zero Python):

      n_tags          total markup tags
      n_links         <a ...> anchors
      link_text_chars visible chars inside anchors (after inner-tag strip)
      text_chars      visible chars of the whole page (expr chain)
      link_density    link_text_chars / text_chars  (boilerplate signal —
                      nav/footer-heavy pages score high and get dropped)
      script_style_chars  bytes inside script/style subtrees
      markup_ratio    1 - text_chars / html_chars
      title           <title> content, entity-decoded
    """
    h = F.col(html_col)
    text = strip_tags_exprs(h)
    anchor = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
    link_chars = F.aggregate(
        F.regexp_extract_all(h, F.lit(anchor), 1),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(
            F.trim(F.regexp_replace(x, r"(?s)<[^>]*>", ""))),
    )
    scr = r"(?is)<(?:script|style)\b[^>]*>(.*?)</(?:script|style)\s*>"
    scr_chars = F.aggregate(
        F.regexp_extract_all(h, F.lit(scr), 1),
        F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    title = F.regexp_extract(h, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    for ent, rep in _ENTITIES:
        title = F.regexp_replace(title, ent, rep)
    text_chars = F.length(text).cast("long")
    return (
        df.withColumn("n_tags", F.regexp_count(h, F.lit(r"(?s)<[^>]+>"))
          .cast("long"))
        .withColumn("n_links",
                    F.regexp_count(h, F.lit(r"(?i)<a\b")).cast("long"))
        .withColumn("link_text_chars", link_chars)
        .withColumn("text_chars", text_chars)
        .withColumn("link_density",
                    F.when(text_chars > 0,
                           F.col("link_text_chars").cast("double")
                           / text_chars.cast("double"))
                    .otherwise(F.lit(0.0)))
        .withColumn("script_style_chars", scr_chars)
        .withColumn("markup_ratio",
                    F.round(1.0 - text_chars.cast("double")
                            / F.greatest(F.length(h).cast("double"),
                                         F.lit(1.0)), 6))
        .withColumn("title", F.trim(title))
    )


def synth_html(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Deterministic HTML page per document row (column `html`).

    TESTDATA documents are plain text; tests and the oracle gate need
    HTML inputs with the structures the extractor must handle — nav/footer
    boilerplate anchors, a script and style subtree that must vanish, an
    HTML comment, entities, a per-doc title, and the body split into
    paragraphs. Everything derives from (doc_id, text) via built-in
    string expressions, so the DuckDB twin rebuilds the identical page.
    """
    did = F.col(id_col).cast("string")
    body = F.col(text_col)
    # paragraph split: first ~half / rest of the word array, so block
    # handling is exercised on every row
    words = F.split(body, " ")
    half = F.greatest((F.size(words) / 2).cast("int"), F.lit(1))
    p1 = F.concat_ws(" ", F.slice(words, F.lit(1), half))
    p2 = F.concat_ws(" ", F.slice(words, half + 1, F.size(words)))
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc &amp; page "), did,
        F.lit("</title><style>body { color: #000; }</style>"
              "<script>var x = 1 < 2;</script></head><body>"
              "<!-- crawler: ignore -->"
              "<nav><a href=\"/home\">Home</a> <a href=\"/about\">About"
              "</a></nav><h1>Doc "), did,
        F.lit("</h1><p>"), p1, F.lit("</p><p>"), p2,
        F.lit("</p><div>score &lt; 1 &amp; done</div>"
              "<footer><a href=\"/terms\">Terms</a></footer></body></html>"))
    return df.withColumn("html", html)
