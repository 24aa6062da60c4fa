"""Config-driven pipeline runner — the cConfigManager / SMILEapi analogue.

The reference's primary UX is a declarative config naming a component graph
(`SMILExtract -C config.conf`; ini sections [name:cType] wired by
reader/writer.dmLevel — /root/reference/src/core/configManager.cpp:1746-2460,
SURVEY.md §3.1), with the SMILEapi embedding the same lifecycle
(progsrc/include/smileapi/SMILEapi.h:83-140). The Spark-native equivalent:
a declarative stage list compiled onto one DataFrame — same negotiation
idea (each stage consumes the columns the previous produced), Catalyst does
the wiring/fusion the component manager did by hand.

    config = {
        "stages": [
            {"type": "lld"},
            {"type": "sma", "cols": ["char_len"], "win": 3},
            {"type": "delta", "cols": ["char_len_sma3"], "win": 2},
            {"type": "sessionize", "gap_seconds": 43200},
            {"type": "functionals", "value_cols": ["char_len_sma3"],
             "families": ["means", "moments"],
             "group_cols": ["conv_id", "session_id"]},
        ]
    }
    out = run_config(spark_df, config)

Stage types: lld, sma, delta, preemphasis, vector_op, sessionize, mvn,
mvn_transform
(needs cfg["stats"] DataFrame — the frozen pre-trained stats path),
fullinput_mean, valbased_selector, data_selector, viterbi, functionals,
functionals_sql, backfill (needs cfg["anchors"] DataFrame), resample
(uniform time grid — cSmileResample), weighted_sma, contour_direction,
segment_by_meta, select, filter.

Training-data corpus stages (documents-shaped frames): token_count,
quality_score, c4_signals, redact, hash_sample, stratified_sample,
dedup_exact, semdedup (keep-filter join on the decision table),
incremental_dedup (needs cfg["store"] DataFrame),
decontaminate (needs cfg["benchmark"] DataFrame), nb_quality
(seed-based NB quality classifier; fits on cfg["seed_docs"] or the
current frame's label column, joins score columns back), shuffle,
pack (mode=concat|greedy), chunk, line_dedup (repeated-line
boilerplate cut), bpe_encode (trains in-stage or loads cfg["model"]
parquet; ids=True emits integer ids), pack_sequences (packed id
arrays), corpus_pipeline — so a whole corpus build is one declarative
config, the same UX the reference gives feature extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_config(df: DataFrame, config: dict) -> DataFrame:
    from opensmile_spark.functionals import functionals_kernel, functionals_sql
    from opensmile_spark.lld import compute_lld
    from opensmile_spark.operators import (
        backfill_functionals, contour_direction, data_selector,
        delta_regression, fullinput_mean, mvn, mvn_transform, preemphasis,
        segment_by_meta, sessionize, sma, valbased_selector, weighted_sma,
    )
    from opensmile_spark.operators.viterbi import viterbi_smooth_df

    # DAG routing (smileconf-compiled configs): a stage may carry
    # "_reads": [level, ...] and "_writes": [level, ...] — named
    # intermediates mirroring the reference's dataMemory levels. A level
    # never written resolves to the INPUT frame (the audio-source chain the
    # compile maps onto the caller's columns). Stages without _reads chain
    # from the previous stage's output, so plain JSON configs are
    # unaffected. Multi-read stages column-concat their sources, which for
    # distinct frames is a key join (cVectorConcat of functional levels).
    env: dict[str, DataFrame] = {}
    aliases: dict = config.get("aliases") or {}

    def _resolve(lv, _seen=()):
        """Look a level up in env, reaching through passthrough aliases;
        None = never written -> caller falls back to the input frame."""
        if lv in env:
            return env[lv]
        for src in aliases.get(lv, []):
            if src not in _seen:
                d = _resolve(src, _seen + (lv,))
                if d is not None:
                    return d
        return None

    def _merge_frames(frames):
        res = frames[0]
        for d in frames[1:]:
            keys = [k for k in ("conv_id", "session_id", "turn_idx")
                    if k in res.columns and k in d.columns]
            if not keys:
                raise ValueError("config concat: frames share no key "
                                 "columns (conv_id/session_id/turn_idx)")
            dup = [c for c in d.columns
                   if c in res.columns and c not in keys]
            # full outer: a source can be legitimately EMPTY (e.g. the
            # unvoiced branch when the voicing gate never fires on this
            # data) — the reference emits empty fields there, we emit nulls
            res = res.join(d.drop(*dup) if dup else d, on=keys, how="full")
        return res

    out = df
    for stage in config["stages"]:
        s = dict(stage)
        kind = s.pop("type")
        reads = s.pop("_reads", None)
        writes = s.pop("_writes", None)
        if reads:
            srcs: list[DataFrame] = []
            for lv in reads:
                d = _resolve(lv)
                if d is None:
                    d = df
                if all(d is not x for x in srcs):
                    srcs.append(d)
            out = srcs[0] if len(srcs) == 1 else _merge_frames(srcs)
        if kind == "concat":
            pass            # out is already the merged read set
        elif kind == "lld":
            out = compute_lld(out, **s)
        elif kind == "sma":
            out = sma(out, s.pop("cols"), s.pop("win", 3), **s)
        elif kind == "delta":
            out = delta_regression(out, s.pop("cols"), s.pop("win", 2), **s)
        elif kind == "preemphasis":
            out = preemphasis(out, s.pop("cols"), **s)
        elif kind == "sessionize":
            out = sessionize(out, **s)
        elif kind == "mvn":
            out = mvn(out, s.pop("cols"), **s)
        elif kind == "mvn_transform":
            out = mvn_transform(out, s.pop("stats"), s.pop("cols"), **s)
        elif kind == "weighted_sma":
            out = weighted_sma(out, s.pop("cols"), s.pop("length", 5),
                               s.pop("func", "hamming"), **s)
        elif kind == "contour_direction":
            out = contour_direction(out, s.pop("col"), **s)
        elif kind == "segment_by_meta":
            out = segment_by_meta(out, s.pop("meta_col"), **s)
        elif kind == "fullinput_mean":
            out = fullinput_mean(out, s.pop("cols"), **s)
        elif kind == "valbased_selector":
            out = valbased_selector(out, s.pop("gate_col"), **s)
        elif kind == "data_selector":
            out = data_selector(out, **s)
        elif kind == "tumbling_bucket":
            from pyspark.sql import functions as F

            from opensmile_spark.util import epoch_seconds

            sec_len = float(s.pop("seconds"))
            ts_col = s.pop("ts_col", "ts")
            out = out.withColumn(
                s.pop("out_col", "win_start"),
                F.floor(epoch_seconds(F.col(ts_col)) / sec_len) * sec_len)
        elif kind == "vector_op":
            from opensmile_spark.operators import vector_op

            out = vector_op(out, s.pop("col"), s.pop("op"), **s)
        elif kind == "viterbi":
            # carry everything: compiled configs use viterbi mid-pipeline
            # and later stages (resample, sessionize) still need ts etc.
            s.setdefault("carry_cols", "all")
            out = viterbi_smooth_df(out, s.pop("col"), **s)
        elif kind == "functionals":
            out = functionals_kernel(
                out, s.pop("value_cols"),
                tuple(s.pop("group_cols", ["conv_id"])), **s)
        elif kind == "functionals_sql":
            out = functionals_sql(
                out, s.pop("value_cols"),
                tuple(s.pop("group_cols", ["conv_id"])), **s)
        elif kind == "backfill":
            out = backfill_functionals(
                out, s.pop("anchors"), s.pop("value_cols"), **s)
        elif kind == "resample":
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            from opensmile_spark.operators import resample

            by = s.get("by", "conv_id")
            out = resample(out, s.pop("period_seconds"), **s)
            # the grid is a fresh uniform series: re-derive the order
            # column so downstream window stages (sma/delta/functionals)
            # keep working; the window reuses the resample's partitioning
            if "turn_idx" not in out.columns and "ts" in out.columns:
                w = Window.partitionBy(by).orderBy("ts")
                out = out.withColumn(
                    "turn_idx", (F.row_number().over(w) - 1).cast("int"))
        elif kind == "select":
            # backtick-quote names: functional columns contain dots
            # (percentile20.0), which bare strings would parse as struct
            # field access
            from pyspark.sql import functions as F

            out = out.select(*[F.col(f"`{c}`") if isinstance(c, str) else c
                               for c in s["cols"]])
        elif kind == "filter":
            out = out.filter(s["condition"])
        # ---- training-data corpus stages (documents-shaped frames) ----
        elif kind == "token_count":
            from opensmile_spark.text import token_count

            out = token_count(out, **s)
        elif kind == "quality_score":
            from opensmile_spark.text import quality_score

            out = quality_score(out, **s)
        elif kind == "c4_signals":
            from opensmile_spark.text import c4_signals

            out = c4_signals(out, **s)
        elif kind == "redact":
            from opensmile_spark.text import redact

            out = redact(out, **s)
        elif kind == "hash_sample":
            from opensmile_spark.sampling import hash_sample

            out = hash_sample(out, s.pop("rate"), **s)
        elif kind == "stratified_sample":
            from opensmile_spark.sampling import stratified_sample

            out = stratified_sample(out, s.pop("strata_col"),
                                    s.pop("rates"), **s)
        elif kind == "dedup_exact":
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            id_col = s.pop("id_col", "doc_id")
            text_col = s.pop("text_col", "text")
            w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
            out = (out.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1).drop("__rn"))
        elif kind == "decontaminate":
            from opensmile_spark.dedup import decontaminate_survivors

            out = decontaminate_survivors(out, s.pop("benchmark"), **s)
        elif kind == "shuffle":
            from opensmile_spark.packing import deterministic_shuffle

            out = deterministic_shuffle(out, **s)
        elif kind == "pack":
            from opensmile_spark.packing import pack_concat, pack_greedy

            mode = s.pop("mode", "concat")
            fn = pack_concat if mode == "concat" else pack_greedy
            out = fn(out, s.pop("budget"), **s)
        elif kind == "chunk":
            from opensmile_spark.packing import chunk_documents

            out = chunk_documents(out, **s)
        elif kind == "nb_quality":
            from opensmile_spark.classify import nb_fit, nb_score

            label_col = s.pop("label_col", "label")
            seed = s.pop("seed_docs", None)
            w, params = nb_fit(seed if seed is not None else out,
                               label_col=label_col,
                               alpha=s.pop("alpha", 1.0),
                               max_vocab=s.pop("max_vocab", None))
            scored = nb_score(out, w, params, **s)
            out = out.join(scored, s.get("id_col", "doc_id"))
        elif kind == "line_dedup":
            from opensmile_spark.linededup import line_dedup

            out = line_dedup(out, **s)
        elif kind == "bpe_encode":
            from opensmile_spark.bpe import (BPEModel, bpe_encode,
                                             bpe_encode_ids, bpe_train)

            model_path = s.pop("model", None)
            if model_path:
                model = BPEModel.from_df(
                    out.sparkSession.read.parquet(model_path))
            else:
                model = bpe_train(
                    out, n_merges=s.pop("n_merges", 200),
                    top_k=s.pop("top_k", 50_000),
                    min_count=s.pop("min_count", 2),
                    text_col=s.get("text_col", "text"),
                    lowercase=s.get("lowercase", False))
            fn = bpe_encode_ids if s.pop("ids", True) else bpe_encode
            out = fn(out, model, **s)
        elif kind == "pack_sequences":
            from opensmile_spark.packing import pack_sequences

            out = pack_sequences(out, s.pop("budget"), **s)
        elif kind == "semdedup":
            from pyspark.sql import functions as F

            from opensmile_spark.semdedup import semdedup

            id_col = s.get("id_col", "vec_id")
            dec = semdedup(out, **s)
            out = (out.join(dec.filter(F.col("keep")).select(id_col),
                            id_col))
        elif kind == "incremental_dedup":
            from pyspark.sql import functions as F

            from opensmile_spark.incremental import incremental_dedup

            dec = incremental_dedup(out, s.pop("store"), **s)
            out = dec.filter(F.col("keep")) \
                .drop("fp", "batch_dup", "seen", "keep")
        elif kind == "corpus_pipeline":
            from opensmile_spark.pipeline import corpus_pipeline

            out = corpus_pipeline(out, s.pop("benchmark"), **s)
        else:
            raise ValueError(f"unknown stage type: {kind!r}")
        if writes:
            for lv in writes:
                env[lv] = out
    return out
