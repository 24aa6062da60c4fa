"""Incremental (cross-snapshot) corpus deduplication.

Production training-data pipelines ingest SNAPSHOTS: each new crawl/batch
must be deduplicated against everything already ingested WITHOUT
re-scanning the historical corpus — the historical side is reduced once
to a persisted fingerprint store and every new batch is (a) deduplicated
within itself and (b) anti-joined against the store. This is the
incremental complement of `dedup.exact_dedup` (which deduplicates one
static corpus) and mirrors how the reference engine processes appended
input incrementally rather than recomputing closed history
(/root/reference/src/core/dataMemory.cpp growDyn ring semantics: new
frames join fixed history).

100 TB design:
- The store holds ONLY (fp, first_id) — ~16 bytes/doc + layout, not the
  corpus. It is written `partitionBy(bucket)` with bucket = pmod(fp, B):
  a new batch repartitioned on the same bucket key joins co-located, and
  a bucket-pruned read serves point lookups.
- `keep` decisions are one map-side fingerprint pass over the new batch,
  one within-batch hash aggregation, and one fp-key join against the
  store — the join's shuffle carries fingerprints, never document text.
- The optional BLOOM PREFILTER cuts that join's input: a bitmap built
  once from the store routes each new row either to "definitely unseen"
  (bloom negative — skips the join entirely; the common case for fresh
  crawls) or to a "maybe seen" slice that still gets the EXACT verify
  join, so the result is exactly the anti-join's (Bloom's one-sided
  error: false positives go to verification, false negatives are
  impossible). Membership probes are vectorized: the JVM computes two
  64-bit hashes per row (xxhash64 with different seeds), an Arrow batch
  kernel derives the k = `bloom_k` probe positions h1 + i*h2 mod m
  (Kirsch-Mitzenmacher double hashing) and indexes a broadcast packed
  bitmap — no per-row Python, no driver-side membership loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FP_METHODS = ("xxhash64", "md5_64")


def fingerprint_expr(text_col: str, method: str = "xxhash64"):
    """Content-fingerprint column. `xxhash64` is the production default
    (JVM, fastest); `md5_64` (first 15 hex digits of md5 as a BIGINT —
    60 bits, always positive) is the DuckDB-portable variant the oracle
    gates use."""
    if method == "xxhash64":
        return F.xxhash64(F.col(text_col))
    if method == "md5_64":
        return F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10) \
            .cast("bigint")
    raise ValueError(f"unknown fingerprint method {method!r}; "
                     f"expected one of {_FP_METHODS}")


def build_fingerprint_store(docs: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            method: str = "xxhash64",
                            n_buckets: int = 256) -> DataFrame:
    """Reduce a corpus to its fingerprint store: one row per distinct
    content fingerprint, carrying the smallest owning id (the canonical
    survivor, matching exact_dedup's min-id convention) and the bucket
    column to `write.partitionBy("bucket")` on."""
    fp = fingerprint_expr(text_col, method)
    return (docs.select(F.col(id_col).alias("first_id"), fp.alias("fp"))
            .groupBy("fp").agg(F.min("first_id").alias("first_id"))
            .withColumn("bucket",
                        F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int")))


def bloom_from_store(store: DataFrame, m_bits: int, k: int = 5):
    """Pack the store's fingerprints into an m_bits Bloom bitmap
    (numpy uint8 array, m_bits/8 bytes). Partitions emit partial packed
    bitmaps that are OR-reduced — 2-level tree via RDD treeReduce, so
    the driver never sees per-row data, only ceil(log) bitmap merges.
    Size m for the target false-positive rate: m ~= -n*ln(p)/ln(2)^2."""
    import numpy as np

    m = int(m_bits)
    k = int(k)
    nbytes = (m + 7) // 8

    def partial(batches):
        import pandas as pd

        bits = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["__h1"].to_numpy(dtype=np.int64)
            h2 = pdf["__h2"].to_numpy(dtype=np.int64)
            for i in range(k):
                pos = np.mod(h1 + i * h2, m).astype(np.int64)
                np.bitwise_or.at(bits, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = (store
             .select(F.xxhash64("fp").alias("__h1"),
                     F.xxhash64("fp", F.lit(1)).alias("__h2"))
             .mapInPandas(partial, schema="bits binary")
             .rdd.map(lambda r: np.frombuffer(r["bits"], dtype=np.uint8)))
    merged = parts.treeReduce(np.bitwise_or, depth=2)
    return np.asarray(merged, dtype=np.uint8), m, k


def _bloom_member_col(df: DataFrame, fp_col: str, bloom) -> DataFrame:
    """Adds `__maybe` — True iff the fingerprint MAY be in the bloom
    (false positives possible, false negatives impossible)."""
    import numpy as np

    bits, m, k = bloom

    def probe(batches):
        for pdf in batches:
            if len(pdf):
                h1 = pdf["__h1"].to_numpy(dtype=np.int64)
                h2 = pdf["__h2"].to_numpy(dtype=np.int64)
                ok = np.ones(len(pdf), dtype=bool)
                for i in range(k):
                    pos = np.mod(h1 + i * h2, m).astype(np.int64)
                    ok &= (bits[pos >> 3]
                           & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
                pdf = pdf.assign(__maybe=ok)
            else:
                pdf = pdf.assign(__maybe=np.zeros(0, dtype=bool))
            yield pdf

    from pyspark.sql.types import BooleanType, StructField, StructType

    probed = (df.withColumn("__h1", F.xxhash64(fp_col))
              .withColumn("__h2", F.xxhash64(fp_col, F.lit(1))))
    schema = StructType(list(probed.schema.fields)
                        + [StructField("__maybe", BooleanType())])
    return probed.mapInPandas(probe, schema=schema) \
        .drop("__h1", "__h2")


def incremental_dedup(new_docs: DataFrame, store: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      method: str = "xxhash64",
                      bloom=None) -> DataFrame:
    """Per-document decision table for a new snapshot against the
    historical fingerprint store: every new doc gains

      fp            content fingerprint
      batch_dup     True iff another doc in THIS batch shares fp with a
                    smaller id (within-batch dedup, min-id survivor)
      seen          True iff fp exists in the store
      keep          not batch_dup and not seen

    `bloom`: optional (bits, m, k) from `bloom_from_store` — routes
    bloom-negative rows around the store join; output is identical to
    the exact path (pinned by tests)."""
    fp = fingerprint_expr(text_col, method)
    base = new_docs.withColumn("fp", fp)
    base = base.withColumn(
        "batch_dup",
        F.col(id_col) != F.min(id_col).over(Window.partitionBy("fp")))

    seen_fps = store.select(F.col("fp").alias("__seen_fp")).distinct()
    if bloom is None:
        joined = base.join(seen_fps,
                           base["fp"] == F.col("__seen_fp"), "left")
        out = joined.withColumn("seen", F.col("__seen_fp").isNotNull()) \
            .drop("__seen_fp")
    else:
        probed = _bloom_member_col(base, "fp", bloom)
        neg = probed.filter(~F.col("__maybe")).drop("__maybe") \
            .withColumn("seen", F.lit(False))
        maybe = probed.filter(F.col("__maybe")).drop("__maybe")
        verified = (maybe.join(seen_fps,
                               maybe["fp"] == F.col("__seen_fp"), "left")
                    .withColumn("seen", F.col("__seen_fp").isNotNull())
                    .drop("__seen_fp"))
        out = neg.unionByName(verified)
    return out.withColumn(
        "keep", ~F.col("batch_dup") & ~F.col("seen"))


def append_to_store(decisions: DataFrame, id_col: str = "doc_id",
                    n_buckets: int = 256) -> DataFrame:
    """The store delta for this batch: kept docs' fingerprints, ready to
    append to the partitioned store (same layout as
    build_fingerprint_store)."""
    return (decisions.filter(F.col("keep"))
            .select(F.col("fp"), F.col(id_col).alias("first_id"))
            .groupBy("fp").agg(F.min("first_id").alias("first_id"))
            .withColumn("bucket",
                        F.pmod(F.col("fp"), F.lit(n_buckets)).cast("int")))
