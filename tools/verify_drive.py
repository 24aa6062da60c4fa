"""Drive the library surface end-to-end (the .claude/skills/verify recipe).

Flows (see .claude/skills/verify/SKILL.md):
  1. transcripts -> LLD -> sma/delta -> sessionize -> functionals via BOTH
     the kernel and the SQL path; assert allclose on shared columns.
  2. Leakage probe: first-ts anchors see exactly 1 turn; perturbing every
     future row leaves anchor features bit-identical.
  3. asof_join tie semantics (default visible, strict invisible).
  4. Single-turn conversation through the FULL kernel family list.
  5. __spark_entry__.entry() runs and returns rows.
  6. Multimodal: real WAV synth -> decode -> features -> ANN top-k.

Usage: python tools/verify_drive.py   (exits nonzero on any failure)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import pyspark.sql.functions as F

    from opensmile_spark import get_spark

    spark = get_spark("verify", master="local[8]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"
    ok = True

    def check(name, cond):
        nonlocal ok
        print(f"STEP {name}: {'OK' if cond else 'FAIL'}")
        ok = ok and bool(cond)

    from opensmile_spark.functionals import functionals_kernel, functionals_sql
    from opensmile_spark.lld import compute_lld
    from opensmile_spark.operators import (
        asof_join, backfill_functionals, delta_regression, sessionize, sma,
    )
    from opensmile_spark.transcripts import transcripts_from_events

    t = transcripts_from_events(spark, sf)
    lld = compute_lld(t)
    lld2 = sessionize(
        delta_regression(sma(lld, ["char_len"], 3), ["char_len"], 2),
        gap_seconds=43200.0)
    fk = functionals_kernel(
        lld2, ["char_len"], ("conv_id",),
        families=["means", "moments", "percentiles", "regression"],
    ).toPandas().set_index("conv_id").sort_index()
    fs = functionals_sql(lld2, ["char_len"]) \
        .toPandas().set_index("conv_id").sort_index()
    shared = [c for c in fk.columns if c in fs.columns and c != "n_turns"]
    check("1 kernel-vs-sql allclose", len(shared) > 10 and all(
        np.allclose(fk[c].astype(float), fs[c].astype(float),
                    rtol=1e-8, atol=1e-10) for c in shared))

    first = lld.groupBy("conv_id").agg(F.min("ts").alias("anchor_ts"))
    fams = ["means", "moments", "regression"]
    bf = backfill_functionals(lld, first, ["char_len"], families=fams)
    nv = sorted(r[0] for r in bf.select("n_visible").distinct().collect())
    base = bf.orderBy("conv_id").toPandas()
    pert = lld.withColumn(
        "char_len",
        F.when(F.col("turn_idx") > 0, F.col("char_len") + 1000.0)
        .otherwise(F.col("char_len")))
    bf2 = backfill_functionals(pert, first, ["char_len"], families=fams) \
        .orderBy("conv_id").toPandas()
    cols = [c for c in base.columns if c.startswith("char_len_")]
    check("2 zero leakage", nv == [1] and all(
        (base[c].fillna(-1).values == bf2[c].fillna(-1).values).all()
        for c in cols))

    anchors = lld.select("conv_id", F.col("ts").alias("anchor_ts")).limit(200)
    d = asof_join(anchors, lld.select("conv_id", "ts", "char_len"),
                  value_cols=["char_len"])
    ds = asof_join(first, lld.select("conv_id", "ts", "char_len"),
                   value_cols=["char_len"], strict=True)
    check("3 asof ties", d.filter(F.col("char_len").isNull()).count() == 0
          and ds.filter(F.col("char_len").isNotNull()).count() == 0)

    one = lld.filter(F.col("turn_idx") == 0).limit(3)
    fam_all = ["means", "moments", "extremes", "percentiles", "regression",
               "crossings", "times", "onset", "segments", "peaks", "peaks2",
               "samples", "dct", "lpc", "lsp", "acf", "amdf", "modulation"]
    f1 = functionals_kernel(one, ["char_len"], ("conv_id",), families=fam_all)
    check("4 N=1 full families", f1.count() == 3)

    import __spark_entry__ as e
    check("5 entry()", e.entry(spark).count() > 0)

    from opensmile_spark.multimodal import (
        extract_media_features, synthetic_media,
    )
    from opensmile_spark.similarity import cosine_topk

    media = synthetic_media(spark, n=24, real_audio=True) \
        .filter(F.col("kind") == "audio")
    feats = extract_media_features(media, n_features=8, fake=False)
    emb = feats.select(
        F.col("media_id").alias("vec_id"),
        F.array(*[F.col(f"feat_{i}") for i in range(8)]).alias("embedding"))
    top = cosine_topk(emb, emb.limit(1), k=3)
    check("6 media->decode->ANN", top.count() == 3)

    # 7. corpus build -> sequence assembly roundtrip
    from opensmile_spark.packing import chunk_documents, pack_concat
    from opensmile_spark.pipeline import corpus_pipeline
    from opensmile_spark.text import token_count

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    built = corpus_pipeline(docs, bench, min_quality=0.5, k_shingle=5,
                            min_overlap=2, n_shards=4)
    built_again = corpus_pipeline(docs.repartition(7), bench,
                                  min_quality=0.5, k_shingle=5,
                                  min_overlap=2, n_shards=4)
    a = {(r["doc_id"], r["shard"], r["shuffle_pos"])
         for r in built.select("doc_id", "shard", "shuffle_pos").collect()}
    b = {(r["doc_id"], r["shard"], r["shuffle_pos"])
         for r in built_again.select("doc_id", "shard",
                                     "shuffle_pos").collect()}
    check("7 corpus build deterministic", 0 < len(a) < docs.count()
          and a == b)
    packed = pack_concat(token_count(built.select("doc_id", "text",
                                                  "shard")),
                         budget=512, group_cols=["shard"])
    mass = packed.groupBy("shard", "pack_id").agg(
        F.sum(F.col("tok_end") - F.col("tok_begin")).alias("m"))
    check("8 packs within budget",
          mass.filter(F.col("m") > 512).count() == 0)
    chunks = chunk_documents(built, max_tokens=64, overlap=8)
    tot = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("mx"))
    check("9 chunking covers survivors", tot.count() == len(a))

    # 10. boilerplate cut -> BPE tokenize -> packed id sequences: the id
    # stream must be preserved exactly through packing, every non-tail
    # pack budget-exact, and nothing about the chain partition-dependent.
    from opensmile_spark.bpe import bpe_encode_ids, bpe_train
    from opensmile_spark.linededup import line_dedup
    from opensmile_spark.packing import pack_sequences

    pages = docs.select(
        "doc_id", "source",
        F.concat(F.lit("BOILER\n"), F.col("text")).alias("text"))
    cleaned = line_dedup(pages).select(
        "doc_id", F.col("clean_text").alias("text")) \
        .join(docs.select("doc_id", "source"), "doc_id")
    model = bpe_train(cleaned, n_merges=60)
    enc = bpe_encode_ids(cleaned, model)
    packs = pack_sequences(enc, budget=256, group_cols=["source"])
    stream = [i for r in packs.orderBy("source", "pack_id").collect()
              for i in r["input_ids"]]
    want = [i for r in enc.orderBy("source", "doc_id")
            .select("source", "bpe_token_ids").collect()
            for i in r["bpe_token_ids"]]
    boiler_cut = cleaned.filter(
        F.col("text").startswith("BOILER")).count() == 0
    non_tail_exact = packs.filter(
        (F.col("n_ids") != 256)).groupBy("source").count() \
        .filter(F.col("count") > 1).count() == 0
    check("10 tokenize->pack stream exact",
          boiler_cut and stream == want and non_tail_exact)

    spark.stop()
    print("VERIFY " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
