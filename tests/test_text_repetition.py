"""Gopher-style repetition metrics vs a brute-force Counter oracle.

Covers: tie-breaking (lexicographically smallest gram on equal counts),
documents shorter than the gram size, degenerate all-same-token documents
(ratio > 1 under overlap counting), and general parity on mixed docs.
"""

import collections
import re

import pytest


def _oracle(text, dup_k):
    toks = re.split(r"\s+", text.strip().lower())
    nch = len(text)
    out = {}
    for name, k in (("top_2gram_frac", 2), ("top_3gram_frac", 3)):
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if grams:
            cnt = collections.Counter(grams)
            mx = max(cnt.values())
            best = min(g for g, c in cnt.items() if c == mx)
            out[name] = cnt[best] * len(best) / nch
        else:
            out[name] = 0.0
    grams = [" ".join(toks[i:i + dup_k])
             for i in range(len(toks) - dup_k + 1)]
    cnt = collections.Counter(grams)
    out[f"dup_{dup_k}gram_ratio"] = sum(
        c * len(g) for g, c in cnt.items() if c >= 2) / nch
    return out


DOCS = [
    # tie-break: "a b" and "b a" both occur twice -> "a b" (lexic. smallest)
    "a b a b a",
    # shorter than 3 tokens: top_3gram_frac must be 0
    "x y",
    # single token: both top fracs 0
    "lonely",
    # degenerate repetition: dup ratio exceeds 1 (overlap counting)
    "spam spam spam spam spam spam spam spam",
    # mixed, with punctuation and uppercase (lowercased before tokenizing)
    "The cat sat. The cat sat. A dog ran away from the cat",
    # long-ish doc with partial repeats
    "alpha beta gamma alpha beta delta alpha beta gamma epsilon zeta",
]


@pytest.mark.parametrize("dup_k", [2, 5])
def test_repetition_matches_counter_oracle(spark, dup_k):
    from opensmile_spark.text import repetition_metrics

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in repetition_metrics(df, dup_k=dup_k).collect()}
    for i, text in enumerate(DOCS):
        exp = _oracle(text, dup_k)
        for col, want in exp.items():
            got = rows[i][col]
            assert got == pytest.approx(want, abs=1e-12), (i, col, text)


def test_repetition_edge_values(spark):
    from opensmile_spark.text import repetition_metrics

    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "spam spam spam spam spam spam spam spam")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in repetition_metrics(df, dup_k=2).collect()}
    # "a b" occurs 2x, len 3, doc len 9 -> 6/9
    assert rows[0]["top_2gram_frac"] == pytest.approx(6 / 9)
    # all seven 2-grams identical: 7 * len("spam spam")=9 over 39 chars
    assert rows[1]["top_2gram_frac"] == pytest.approx(63 / 39)
    assert rows[1]["dup_2gram_ratio"] == pytest.approx(63 / 39)


def test_corpus_stats_exact_and_hll(spark):
    """corpus_stats: exact vocabulary matches a Python set count; the
    HyperLogLog variant (the 100 TB path) lands within ~5x its configured
    relative standard deviation."""
    import re

    from pyspark.sql import functions as F

    from opensmile_spark.text import corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r["stratum"]: r.asDict()
             for r in corpus_stats(docs, strata_col=(F.col("doc_id") % 10))
             .collect()}
    # python oracle for one stratum
    rows = docs.filter(F.col("doc_id") % 10 == 3).collect()
    toks = [t for r in rows
            for t in re.split(r"\s+", r["text"].strip().lower())]
    assert exact[3]["n_docs"] == len(rows)
    assert exact[3]["n_tokens"] == len(toks)
    assert exact[3]["n_vocab"] == len(set(toks))

    approx = {r["stratum"]: r["n_vocab"]
              for r in corpus_stats(docs, strata_col=(F.col("doc_id") % 10),
                                    approx_rsd=0.02).collect()}
    for s, a in approx.items():
        rel = abs(a - exact[s]["n_vocab"]) / exact[s]["n_vocab"]
        assert rel < 0.10, (s, a, exact[s]["n_vocab"])


def test_redact_counts_and_tokens(spark):
    """PII scrub: multiple matches per doc, sequential pattern order
    (emails consumed before IP counting), clean docs pass through."""
    from opensmile_spark.text import redact

    df = spark.createDataFrame(
        [(0, "mail a@b.co and c@d.org from 1.2.3.4 call +44 123 456 789"),
         (1, "no pii here at all"),
         (2, "ip 10.0.0.1 twice 10.0.0.2")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in redact(df).collect()}
    assert rows[0]["n_email"] == 2
    assert rows[0]["n_ipv4"] == 1
    assert rows[0]["n_phone"] == 1
    assert rows[0]["text_redacted"] == \
        "mail [EMAIL] and [EMAIL] from [IPV4] call [PHONE]"
    assert rows[1]["text_redacted"] == "no pii here at all"
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) \
        == (0, 0, 0)
    assert rows[2]["n_ipv4"] == 2


def test_c4_signals_multiline(spark):
    """C4 structural signals on crafted multiline docs: terminal-punct
    line fraction, words per line, sentence count, boilerplate markers."""
    from opensmile_spark.text import c4_signals

    docs = spark.createDataFrame(
        [(0, 'First line.\nsecond has no punct\nThird ends!\n"Quoted."'),
         (1, 'function foo() { return 1; }'),
         (2, 'Lorem Ipsum dolor sit amet.'),
         (3, 'one two three')],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_signals(docs).collect()}
    r0 = got[0]
    assert r0["n_lines"] == 4
    assert abs(r0["frac_lines_term"] - 3 / 4) < 1e-12
    assert r0["n_sentences"] == 3  # '.', '!', '."' -> three [.!?]+ runs
    assert got[1]["has_brace"] == 1 and got[0]["has_brace"] == 0
    assert got[2]["has_lorem"] == 1 and got[3]["has_lorem"] == 0
    assert got[3]["n_lines"] == 1
    assert abs(got[3]["words_per_line"] - 3.0) < 1e-12
    assert got[3]["frac_lines_term"] == 0.0


def test_char_entropy_values(spark):
    """Entropy pins: uniform 2-symbol doc = 1 bit; single symbol = 0;
    empty = 0; 'aab' = 0.9183 (2/3,1/3 distribution)."""
    import math

    from opensmile_spark.text import char_entropy

    docs = spark.createDataFrame(
        [(0, "abab"), (1, "aaaa"), (2, ""), (3, "aab")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["char_entropy"]
           for r in char_entropy(docs).collect()}
    assert abs(got[0] - 1.0) < 1e-12
    assert got[1] == 0.0
    assert got[2] == 0.0
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[3] - want) < 1e-12


def test_bpe_ish_token_count(spark):
    """GPT-2-style pretokenizer count: contractions and punctuation runs
    are separate tokens (whitespace count would say 6 here)."""
    from opensmile_spark.text import token_count

    df = spark.createDataFrame(
        [(0, "It's 42 degrees—nice, isn't it?")], "doc_id long, text string")
    r = token_count(df).collect()[0]
    # It|'s| 42| degrees|—|nice|,| isn|'t| it|? -> 11
    assert r["n_tokens_bpe"] == 11
    assert r["n_tokens_ws"] == 5
