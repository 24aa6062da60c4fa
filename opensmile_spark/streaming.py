"""Structured Streaming surface — the incremental/online half of the engine.

The reference is an incremental real-time engine (tick loop,
/root/reference/src/core/componentManager.cpp:1416-1520; about.rst:29-36).
Spark's analogue is Structured Streaming:

  cExternalSource push source  -> readStream (rate/kafka/file) or
                                  MemoryStream in tests
  ring-buffer bounded lateness -> withWatermark(ts, delay)
  cTurnDetector sessionisation -> session_window(ts, gap) aggregation
  incremental LLDs             -> same stateless column exprs as batch
                                  (compute_lld works on streaming frames)
  stateful ops (adaptive MVN,
  Viterbi-style smoothing)     -> applyInPandasWithState per conv_id
  cExternalSink callback       -> foreachBatch / memory sink

Everything here reuses the batch expressions — one logical definition,
two execution modes (the Spark-first replacement for the reference's single
dataflow graph running either offline or online).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_lld(transcripts_stream: DataFrame) -> DataFrame:
    """Stateless LLD columns on a streaming transcripts frame.

    lag-based LLDs (reply_latency, role_change) are *stateful* in streaming
    and are therefore not computed here — they belong to the sessionized
    aggregate (below) or the stateful smoother. Everything else is the exact
    batch expression set.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    char_len = F.length("text").cast("double")
    return transcripts_stream.select(
        "conv_id", "turn_idx", "ts",
        char_len.alias("char_len"),
        F.size(toks).cast("double").alias("token_cnt"),
        (F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast("double")
         / char_len).alias("punct_density"),
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks).cast("double")).alias("ttr"),
        F.when(F.col("role") == "tool", 1.0).otherwise(0.0).alias("is_tool"),
    )


def streaming_session_functionals(
    lld_stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: str = "char_len",
) -> DataFrame:
    """Per-(conv, session-window) incremental functional aggregates.

    session_window(ts, gap) IS the cTurnDetector timeout rule
    (turnDetector.cpp:58-62) executed by the state store; the watermark is
    the lateness bound the reference enforces physically with its ring
    buffer (dataMemoryLevel.hpp:245 noHang). Aggregates limited to the
    single-pass (partial-combinable) functional subset — order statistics
    need the batch kernel over closed sessions.
    """
    x = F.col(value_col)
    return (
        lld_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.avg(x).alias(f"{value_col}_amean"),
            F.avg(F.abs(x)).alias(f"{value_col}_absmean"),
            F.avg(x * x).alias(f"{value_col}_qmean"),
            F.sqrt(F.avg(x * x)).alias(f"{value_col}_rqmean"),
            F.var_pop(x).alias(f"{value_col}_variance"),
            F.max(x).alias(f"{value_col}_max"),
            F.min(x).alias(f"{value_col}_min"),
            F.sum(F.when(x != 0.0, 1).otherwise(0)).cast("double")
            .alias(f"{value_col}_nnz"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            *[F.col(c) for c in [
                f"{value_col}_amean", f"{value_col}_absmean",
                f"{value_col}_qmean", f"{value_col}_rqmean",
                f"{value_col}_variance", f"{value_col}_max",
                f"{value_col}_min", f"{value_col}_nnz",
            ]],
        )
    )


def stateful_expanding_stats(
    lld_stream: DataFrame,
    value_col: str = "char_len",
) -> DataFrame:
    """Causal expanding mean/M2 per conversation via applyInPandasWithState —
    the streaming twin of mvn(mode='expanding') and the execution slot for
    any sequential per-conv operator (the Viterbi-smoother class of ops,
    pitchSmootherViterbi.cpp, that can never be a window expression).

    State = (count, mean, M2) Welford accumulator carried across
    micro-batches; emits one row per input turn with the running stats at
    that turn (ts <= now ⇒ leakage-free). The per-batch update is the
    vectorized Welford recursion: mean_k from shifted cumulative sums,
    M2_k = M2_{k-1} + (x_k − mean_{k-1})(x_k − mean_k).

    Output mode is 'update' with NoTimeout: in this pyspark build the
    ProcessingTimeTimeout + append combination crashes the Arrow state
    worker (observed: empty-crash loop under Trigger.AvailableNow).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (f"conv_id string, turn_idx int, {value_col} double, "
                  f"run_mean double, run_std double, n long")
    state_schema = "n long, mean double, m2 double"

    def fn(key, pdfs, state):
        if state.exists:
            n0, mean0, m20 = state.get
        else:
            n0, mean0, m20 = 0, 0.0, 0.0
        frames = []
        for pdf in pdfs:
            frames.append(pdf)
        if not frames:
            state.update((n0, mean0, m20))
            return
        pdf = pd.concat(frames, ignore_index=True).sort_values("turn_idx")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        k = np.arange(1, len(x) + 1, dtype=np.float64)
        n = n0 + k
        means = (n0 * mean0 + np.cumsum(x)) / n
        prev_means = np.concatenate(([mean0], means[:-1]))
        m2 = m20 + np.cumsum((x - prev_means) * (x - means))
        stds = np.sqrt(np.maximum(m2 / n, 0.0))
        state.update((int(n[-1]), float(means[-1]), float(m2[-1])))
        yield pd.DataFrame({
            "conv_id": key[0],
            "turn_idx": pdf["turn_idx"].to_numpy(),
            value_col: x,
            "run_mean": means,
            "run_std": stds,
            "n": n.astype(np.int64),
        })

    return (
        lld_stream.select("conv_id", "turn_idx", value_col)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def closed_session_functionals(
    lld_stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: str = "char_len",
    families: list[str] | None = None,
):
    """FULL functional vectors (incl. order statistics / peaks2 — anything
    the incremental aggregate above cannot express) over CLOSED sessions:
    the streaming analogue of the reference's EOI flush
    (componentManager.cpp:1485-1502 runs extra ticks at EOI so full-input
    ops see the whole segment).

    Mechanics: session_window aggregation in APPEND mode collects each
    session's (ts-ordered) values; append + watermark means a session row
    is emitted exactly once, when the watermark passes its close — at that
    point the whole segment is known, so the batch kernel runs on it inside
    foreachBatch. State is bounded by session length (the reference's ring
    buffer bound); the kernel never sees an open session.

    Returns (sessions_stream, process_batch): start with
      sessions_stream.writeStream.outputMode("append")
          .foreachBatch(lambda df, _: sink(process_batch(df))).start()
    where process_batch(df) -> DataFrame applies the kernel batch-side.
    """
    import numpy as np
    import pandas as pd

    from opensmile_spark.functionals.kernels import compute_all

    families = families or ["means", "moments", "percentiles", "segments",
                            "peaks2"]
    probe = list(compute_all(np.arange(1.0, 9.0), families))
    feat_names = [f"{value_col}_{k}" for k in probe]

    sessions = (
        lld_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sort_array(
                F.collect_list(F.struct("ts", "turn_idx", value_col))
            ).alias("__rows"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
            F.transform("__rows", lambda r: r[value_col]).alias("__xs"),
        )
    )

    out_schema = ("conv_id string, session_start timestamp, "
                  "session_end timestamp, n_turns long, "
                  + ", ".join(f"`{n}` double" for n in feat_names))

    def process_batch(batch_df: DataFrame) -> DataFrame:
        def kernel(pdfs):
            for pdf in pdfs:
                if not len(pdf):
                    continue
                cols = {c: pdf[c] for c in
                        ("conv_id", "session_start", "session_end",
                         "n_turns")}
                feats = [compute_all(np.asarray(xs, dtype=np.float64),
                                     families) for xs in pdf["__xs"]]
                for k in probe:
                    cols[f"{value_col}_{k}"] = [f.get(k, float("nan"))
                                                for f in feats]
                yield pd.DataFrame(cols)

        return batch_df.mapInPandas(kernel, schema=out_schema)

    return sessions, process_batch


def dedup_stream(
    stream_df: DataFrame,
    key=None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Exact-duplicate drop at INGEST (streaming twin of dedup.exact_dedup):
    state-store dropDuplicates on the content hash, bounded by the
    watermark — a duplicate arriving within `watermark` of the original is
    dropped; the state for older keys is evicted (the unbounded-state
    pitfall of naive streaming dedup is the point of the bound). `key`
    defaults to md5(text)."""
    key_expr = key if key is not None else F.md5(F.col(text_col))
    return (
        stream_df.withColumn("__content_key", key_expr)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_key"])
        .drop("__content_key")
    )


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         output_mode: str = "append"):
    """Drive a streaming frame to completion against available data (the
    Trigger.AvailableNow EOI analogue — componentManager.cpp:1485-1502 runs
    extra ticks at EOI so full-input ops flush). Returns the query handle;
    caller reads `SELECT * FROM {name}`."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
