"""Incremental cross-snapshot dedup: exact path, bloom-prefilter
equivalence, store roundtrip, fingerprint portability."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensmile_spark.incremental import (
    append_to_store,
    bloom_from_store,
    build_fingerprint_store,
    fingerprint_expr,
    incremental_dedup,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Historical snapshot (ids 0..99) and a new batch (ids 100..159)
    where: 20 new docs repeat historical text (seen), 10 repeat within
    the batch (batch_dup for the higher id), 30+ are fresh."""
    hist = [(i, f"historical document {i}") for i in range(100)]
    new = []
    for i in range(100, 120):
        new.append((i, f"historical document {i - 100}"))   # seen
    for i in range(120, 130):
        new.append((i, f"fresh duplicated text {i}"))
        new.append((i + 100, f"fresh duplicated text {i}"))  # batch dup
    for i in range(130, 160):
        new.append((i, f"brand new text {i}"))
    h = spark.createDataFrame(hist, "doc_id long, text string")
    n = spark.createDataFrame(new, "doc_id long, text string")
    return h.cache(), n.cache()


def _expect(decisions):
    got = {r["doc_id"]: r for r in decisions.collect()}
    assert len(got) == 70    # 20 seen + 10 dup pairs + 30 fresh
    for i in range(100, 120):
        assert got[i]["seen"] and not got[i]["batch_dup"] \
            and not got[i]["keep"], i
    for i in range(120, 130):
        assert not got[i]["seen"] and not got[i]["batch_dup"] \
            and got[i]["keep"], i
        j = i + 100
        assert got[j]["batch_dup"] and not got[j]["keep"], j
    for i in range(130, 160):
        assert got[i]["keep"], i
    return got


@pytest.mark.parametrize("method", ["xxhash64", "md5_64"])
def test_exact_path_decisions(spark, corpus, method):
    hist, new = corpus
    store = build_fingerprint_store(hist, method=method)
    _expect(incremental_dedup(new, store, method=method))


def test_bloom_path_equals_exact(spark, corpus):
    """Tiny bitmap (forces false positives) must STILL give decisions
    identical to the exact anti-join — FPs only route rows into the
    verify join, never into the output."""
    hist, new = corpus
    store = build_fingerprint_store(hist).cache()
    exact = {r["doc_id"]: (r["batch_dup"], r["seen"], r["keep"])
             for r in incremental_dedup(new, store).collect()}
    for m_bits in (64, 512, 1 << 16):       # 64 bits over 100 fps: FP-rich
        bloom = bloom_from_store(store, m_bits=m_bits, k=3)
        got = {r["doc_id"]: (r["batch_dup"], r["seen"], r["keep"])
               for r in incremental_dedup(new, store,
                                          bloom=bloom).collect()}
        assert got == exact, m_bits


def test_bloom_has_no_false_negatives_and_prunes(spark, corpus):
    """Every truly-seen fp probes positive (one-sided error), and with an
    adequately sized bitmap most fresh docs probe negative (the join-input
    cut that is the point of the prefilter)."""
    from opensmile_spark.incremental import _bloom_member_col

    hist, new = corpus
    store = build_fingerprint_store(hist).cache()
    bloom = bloom_from_store(store, m_bits=1 << 16, k=5)
    probed = _bloom_member_col(
        new.withColumn("fp", fingerprint_expr("text")), "fp", bloom)
    rows = {r["doc_id"]: r["__maybe"] for r in probed.collect()}
    for i in range(100, 120):
        assert rows[i], f"false negative for seen doc {i}"
    fresh_maybe = sum(rows[i] for i in range(130, 160))
    assert fresh_maybe <= 3      # 2^16 bits / 100 items -> fpp ~ 0


def test_store_roundtrip_and_append(spark, corpus, tmp_path):
    hist, new = corpus
    path = str(tmp_path / "store")
    build_fingerprint_store(hist, n_buckets=8).write \
        .partitionBy("bucket").mode("overwrite").parquet(path)
    store = spark.read.parquet(path)
    decisions = incremental_dedup(new, store)
    got = _expect(decisions)
    delta = append_to_store(decisions, n_buckets=8)
    d = delta.collect()
    kept_ids = {i for i, r in got.items() if r["keep"]}
    assert {r["first_id"] for r in d} == kept_ids
    assert all(r["bucket"] == r["fp"] % 8 for r in d)
    # ingesting the SAME batch again against store+delta: nothing keeps
    store2 = store.select("fp", "first_id", "bucket").unionByName(
        delta.select("fp", "first_id", "bucket"))
    again = incremental_dedup(new, store2)
    assert again.filter(F.col("keep")).count() == 0


def test_md5_64_fingerprint_portable(spark):
    """md5_64 equals int(md5(text)[:15], 16) — the DuckDB-twin contract."""
    rows = [(1, "alpha"), (2, "beta gamma"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id",
                     fingerprint_expr("text", "md5_64").alias("fp"))
           .collect()}
    for i, t in rows:
        want = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert got[i] == want, (i, t)


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        fingerprint_expr("text", "sha999")
