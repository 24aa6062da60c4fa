"""line_dedup vs a brute-force python oracle + edge/invariance pins."""

import pytest

from opensmile_spark.linededup import line_dedup, line_stats

DOCS = [
    # boilerplate header shared by 3 docs; footer shared by 2
    (0, "SITE MENU\nalpha beta gamma\nunique zero line\nCopyright 2024"),
    (1, "SITE MENU\ndelta epsilon\nCopyright 2024"),
    (2, "SITE MENU\nalpha beta gamma\nown content two"),
    # doc that repeats ITS OWN line (1 distinct doc -> not boilerplate)
    (3, "self repeat\nself repeat\nself repeat"),
    # doc that is ALL boilerplate
    (4, "SITE MENU\nCopyright 2024"),
    # short / whitespace lines
    (5, "x\n   \nreal body here\nx"),
    (6, "x\nanother body"),
    (7, ""),
]


def brute(docs, min_docs=2, min_chars=1):
    from collections import defaultdict
    per_line_docs = defaultdict(set)
    for did, text in docs:
        for ln in text.split("\n"):
            if len(ln.strip()) >= min_chars:
                per_line_docs[ln].add(did)
    bad = {ln for ln, ds in per_line_docs.items() if len(ds) >= min_docs}
    out = {}
    for did, text in docs:
        lines = text.split("\n")
        keep = [ln for ln in lines if ln not in bad]
        nrem = len(lines) - len(keep)
        out[did] = (len(lines), nrem, round(nrem / len(lines), 6),
                    "\n".join(keep))
    return out


def run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = line_dedup(df, **kw).collect()
    return {r["doc_id"]: (r["n_lines"], r["n_removed"], r["dup_ratio"],
                          r["clean_text"]) for r in rows}


@pytest.mark.parametrize("min_docs,min_chars", [(2, 1), (3, 1), (2, 2)])
def test_vs_brute(spark, min_docs, min_chars):
    got = run(spark, DOCS, min_docs=min_docs, min_chars=min_chars)
    want = brute(DOCS, min_docs=min_docs, min_chars=min_chars)
    assert got == want


def test_semantics_pins(spark):
    got = run(spark, DOCS)
    # every occurrence of the 3-doc header is gone, everywhere
    assert all("SITE MENU" not in got[d][3] for d in (0, 1, 2, 4))
    # within-doc repetition alone is NOT boilerplate (1 distinct doc)
    assert got[3] == (3, 0, 0.0, "self repeat\nself repeat\nself repeat")
    # all-boilerplate doc -> empty clean_text, ratio 1.0
    assert got[4] == (2, 2, 1.0, "")
    # 'x' shared by docs 5 and 6 is removed at min_chars=1;
    # whitespace-only line is never eligible, hence kept
    assert got[5] == (4, 2, 0.5, "   \nreal body here")
    # empty document: one empty (ineligible) line, untouched
    assert got[7] == (1, 0, 0.0, "")


def test_min_chars_guard(spark):
    got = run(spark, DOCS, min_chars=2)
    # 'x' (1 char) now ineligible -> survives in both docs
    assert got[5][3] == "x\n   \nreal body here\nx"
    assert got[6][3] == "x\nanother body"


def test_line_stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    stats = {r["line"]: r["n_docs"] for r in line_stats(df).collect()}
    assert stats["SITE MENU"] == 4
    assert stats["Copyright 2024"] == 3
    assert stats["self repeat"] == 1
    assert "   " not in stats  # whitespace-only never counted


def test_repartition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = {r["doc_id"]: r["clean_text"]
         for r in line_dedup(df).collect()}
    b = {r["doc_id"]: r["clean_text"]
         for r in line_dedup(df.repartition(7)).collect()}
    assert a == b
