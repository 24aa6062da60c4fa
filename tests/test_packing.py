"""Sequence-assembly ops (packing.py) vs pure-Python references.

Reference semantics being pinned:
  chunk_documents  cFramer-style overlapping windows over whitespace
                   tokens (frameSize/frameStep — framer.cpp:24-38)
  pack_concat      concat-then-split every `budget` tokens, straddling
                   docs emitted once per touched pack with exact offsets
  pack_greedy      first-fit walk in doc_id order per group
  deterministic_shuffle  seeded md5 shard + total in-shard order
"""

import math

import pytest
from pyspark.sql import functions as F

DOCS = [
    # (doc_id, source, text)
    (0, "web", "a b c d e f g h i j"),          # 10 tokens
    (1, "web", "k l m"),                         # 3
    (2, "web", "n o p q r s"),                   # 6
    (3, "books", "t u v w x y z aa bb cc dd"),   # 11
    (4, "books", "ee"),                          # 1
    (5, "books", "ff gg hh ii"),                 # 4
    (6, "books", " leading  and   trailing "),   # 3 (ws-collapsed)
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    return df.withColumn(
        "n_tokens_ws", F.size(F.split(F.trim("text"), r"\s+")).cast("long"))


def py_tokens(text):
    return text.split()


def test_chunk_documents_exact(spark, docs):
    out = {(r["doc_id"], r["chunk_idx"]): r for r in
           __import__("opensmile_spark.packing", fromlist=["x"])
           .chunk_documents(docs, max_tokens=4, overlap=1)
           .collect()}
    stride = 3
    for doc_id, _, text in DOCS:
        toks = py_tokens(text)
        n = len(toks)
        n_chunks = max(1, math.ceil((n - 1) / stride))
        got_chunks = [k for k in out if k[0] == doc_id]
        assert len(got_chunks) == n_chunks, (doc_id, n, n_chunks)
        covered = []
        for i in range(n_chunks):
            r = out[(doc_id, i)]
            want = toks[i * stride: i * stride + 4]
            assert r["chunk_text"] == " ".join(want)
            assert r["chunk_tokens"] == len(want)
            covered.extend(toks[i * stride: i * stride + 4])
        assert set(covered) == set(toks)  # every token in >=1 chunk


def test_pack_concat_offsets(spark, docs):
    budget = 8
    rows = (__import__("opensmile_spark.packing", fromlist=["x"])
            .pack_concat(docs, budget, group_cols=["source"])
            .collect())
    # python reference: concat per source in doc_id order
    by_source = {}
    for doc_id, source, text in DOCS:
        by_source.setdefault(source, []).append((doc_id, len(py_tokens(text))))
    want = []
    for source, dlist in by_source.items():
        cum = 0
        for doc_id, n in sorted(dlist):
            start, end = cum, cum + n
            cum = end
            first = start // budget
            last = max((end - 1) // budget, first)
            for p in range(first, last + 1):
                lo = max(0, p * budget - start)
                hi = min(n, (p + 1) * budget - start)
                pb = max(0, start - p * budget)
                want.append((source, doc_id, n, p, lo, hi, pb))
    got = sorted((r["source"], r["doc_id"], r["doc_tokens"], r["pack_id"],
                  r["tok_begin"], r["tok_end"], r["pack_begin"])
                 for r in rows)
    assert got == sorted(want)
    # every pack is exactly `budget` tokens except each group's last
    tot = {}
    for source, doc_id, n, p, lo, hi, pb in want:
        tot[(source, p)] = tot.get((source, p), 0) + (hi - lo)
    for source in by_source:
        packs = sorted(p for s, p in tot if s == source)
        for p in packs[:-1]:
            assert tot[(source, p)] == budget


def test_pack_greedy_first_fit(spark, docs):
    budget = 8
    rows = (__import__("opensmile_spark.packing", fromlist=["x"])
            .pack_greedy(docs, budget, group_cols=("source",))
            .collect())
    by_source = {}
    for doc_id, source, text in DOCS:
        by_source.setdefault(source, []).append((doc_id, len(py_tokens(text))))
    want = {}
    for source, dlist in by_source.items():
        pack, pos, run = 0, 0, 0
        for i, (doc_id, n) in enumerate(sorted(dlist)):
            if i > 0 and run + n > budget:
                pack, pos, run = pack + 1, 0, 0
            run += n
            want[(source, doc_id)] = (pack, pos, run)
            pos += 1
    for r in rows:
        w = want[(r["source"], r["doc_id"])]
        assert (r["pack_id"], r["pack_pos"], r["pack_tokens"]) == w
    # no pack over budget unless it is a single oversized doc
    agg = {}
    for (source, doc_id), (pack, pos, run) in want.items():
        key = (source, pack)
        agg[key] = max(agg.get(key, 0), run)
        if run > budget:
            assert pos == 0  # oversized doc alone in its pack


def test_deterministic_shuffle_stable(spark, docs):
    from opensmile_spark.packing import deterministic_shuffle

    a = sorted((r["doc_id"], r["shard"], r["shuffle_pos"]) for r in
               deterministic_shuffle(docs, n_shards=4, seed=3).collect())
    b = sorted((r["doc_id"], r["shard"], r["shuffle_pos"]) for r in
               deterministic_shuffle(docs.repartition(5), n_shards=4,
                                     seed=3).collect())
    assert a == b  # partitioning-independent
    c = sorted((r["doc_id"], r["shard"], r["shuffle_pos"]) for r in
               deterministic_shuffle(docs, n_shards=4, seed=4).collect())
    assert a != c  # seed actually permutes
    # positions are dense per shard
    by_shard = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))


def test_randomized_invariants(spark):
    """300 random docs (seed-fixed; includes zero-token and over-budget
    sizes) through both packers: masses, contiguity, and the greedy rule
    hold everywhere."""
    import random

    from opensmile_spark.packing import pack_concat, pack_greedy

    rng = random.Random(1234)
    rows = []
    for i in range(300):
        tok = rng.choice([0, 1, 2, 7, 31, 64, 65, 120, 400])
        rows.append((i, f"g{i % 5}", tok))
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    budget = 64

    pc = pack_concat(df, budget, token_col="n",
                     group_cols=["source"]).collect()
    # per-doc spans partition [0, n) contiguously in pack order
    by_doc = {}
    for r in pc:
        by_doc.setdefault(r["doc_id"], []).append(r)
    toks = {i: t for i, _, t in rows}
    for doc, spans in by_doc.items():
        spans.sort(key=lambda r: r["pack_id"])
        assert spans[0]["tok_begin"] == 0
        assert spans[-1]["tok_end"] == toks[doc]
        for a, b in zip(spans, spans[1:]):
            assert a["tok_end"] == b["tok_begin"]
            assert b["pack_id"] == a["pack_id"] + 1
        # offset consistency: slice fits inside the pack
        for r in spans:
            assert 0 <= r["pack_begin"] <= budget
            assert r["pack_begin"] + (r["tok_end"] - r["tok_begin"]) \
                <= budget
    # pack masses: exactly budget except each group's last pack
    mass, last = {}, {}
    for r in pc:
        key = (r["source"], r["pack_id"])
        mass[key] = mass.get(key, 0) + r["tok_end"] - r["tok_begin"]
        last[r["source"]] = max(last.get(r["source"], 0), r["pack_id"])
    for (src, pid), m in mass.items():
        if pid < last[src]:
            assert m == budget, (src, pid, m)

    pg = pack_greedy(df, budget, token_col="n",
                     group_cols=("source",)).collect()
    by_group = {}
    for r in pg:
        by_group.setdefault(r["source"], []).append(r)
    for src, rs in by_group.items():
        rs.sort(key=lambda r: r["doc_id"])
        run, pack = 0, 0
        for i, r in enumerate(rs):
            t = toks[r["doc_id"]]
            if i > 0 and run + t > budget:
                pack, run = pack + 1, 0
            run += t
            assert (r["pack_id"], r["pack_tokens"]) == (pack, run), r
