"""Agent-trajectory metrics over conversation transcripts.

Per-conversation behavioural summary of an agent run — the transcript
analogue of the reference's per-segment functional summaries
(/root/reference/src/functionals/functionals.cpp:61-118 computes fixed
statistics per segment; here the "signal" is the tool-call sequence):

  * tool-call volume and diversity (how many calls, how many distinct
    tools),
  * loop detection: the longest run of CONSECUTIVE calls to the same
    tool among the conversation's tool turns (agents stuck in retry
    loops show long same-tool runs), and the number of runs at or above
    a loop threshold,
  * role-protocol health: count of adjacent same-role turns (a healthy
    user/assistant protocol alternates; repeated roles flag
    merged/dropped turns),
  * reply latency: mean seconds between an assistant turn and the turn
    before it.

Single-lineage plan: ONE scan, ONE hash exchange on the group key, the
window pass (lag/last/cumsum all share the conv_id+turn_idx sort), then
a two-level aggregation (group, run) -> (group). The second aggregation
needs no reshuffle — hash partitioning on the group key already
satisfies the (group, run) clustering — and there is no join. At 10^12
turns the input scan dominates; this formulation reads it once (the
first version scanned twice and merged with a SortMergeJoin).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensmile_spark.util import epoch_seconds


def conversation_fingerprints(
    df: DataFrame,
    by: Sequence[str] = ("conv_id",),
    order_col: str = "turn_idx",
    cols: Sequence[str] = ("role", "text"),
    out_col: str = "conv_fp",
) -> DataFrame:
    """One md5 fingerprint per conversation over the ORDERED turn
    sequence — the conversation-grain analogue of document content
    hashing. `cols=("role",)` fingerprints only the interaction shape
    (structural dedup: conversations with identical role protocols),
    the default fingerprints full content (verbatim re-ingest dedup).

    The per-group concatenation is bounded by conversation length; at
    10^12 turns a mega-conversation's turn texts still fit one
    aggregation buffer (they fit one Arrow batch elsewhere in the
    engine), and the md5-of-ordered-string form is what keeps the
    fingerprint DuckDB-twinnable (string_agg ... ORDER BY turn_idx).
    Fields join on 0x1f, turns on 0x1e (unit / record separators), so
    no text can alias a boundary.
    """
    by = list(by)
    parts = F.concat_ws("\x1f", *[F.col(c) for c in cols])
    arr = F.array_sort(F.collect_list(
        F.struct(F.col(order_col).alias("i"), parts.alias("s"))))
    joined = F.array_join(
        F.transform(arr, lambda x: x["s"]), "\x1e")
    return df.groupBy(*by).agg(F.md5(joined).alias(out_col))


def extract_sft_pairs(
    df: DataFrame,
    by: Sequence[str] = ("conv_id",),
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
    context: str = "turn",
    max_context_chars: int | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Extract (prompt, response) training pairs from transcripts — the
    conversation-grain last mile of a training-data pipeline (documents
    get chunk/pack; transcripts get pair extraction).

    context='turn': each assistant turn whose IMMEDIATELY preceding turn
    is a user turn yields (that user text, assistant text). One lag
    window, pure JVM.

    context='full': the prompt is the whole preceding conversation
    rendered as "role: text" lines joined by `sep` (every assistant
    turn with a non-empty history yields a pair — the multi-turn SFT
    convention). `max_context_chars` keeps the TAIL of long contexts
    (the turns nearest the response), bounding row width for
    mega-conversations at scale.

    Output: `by` + order_col + (prompt, response), one row per emitted
    pair, same conv partitioning as every other transcript operator.
    """
    w = Window.partitionBy(*by).orderBy(order_col)
    if context == "turn":
        prompt = F.when(
            F.lag(role_col).over(w) == user_role,
            F.lag(text_col).over(w))
    elif context == "full":
        line = F.concat_ws(": ", F.col(role_col), F.col(text_col))
        prompt = F.array_join(
            F.collect_list(line).over(
                w.rowsBetween(Window.unboundedPreceding, -1)), sep)
    else:
        raise ValueError(f"context must be 'turn' or 'full': {context!r}")
    out = (
        df.select(*by, order_col, F.col(role_col).alias("_role"),
                  prompt.alias("prompt"),
                  F.col(text_col).alias("response"))
        .filter((F.col("_role") == assistant_role)
                & F.col("prompt").isNotNull()
                & (F.length("prompt") > 0))
        .drop("_role")
    )
    if max_context_chars is not None:
        n = int(max_context_chars)
        out = out.withColumn(
            "prompt",
            F.expr(f"substring(prompt, "
                   f"greatest(1, length(prompt) - {n} + 1))"))
    return out


def turn_novelty(
    df: DataFrame,
    by: Sequence[str] = ("conv_id",),
    order_col: str = "turn_idx",
    text_col: str = "text",
    out_col: str = "novelty",
) -> DataFrame:
    """Per-turn novelty vs the previous turn: Levenshtein edit distance
    normalized by the longer text's length. 1.0 for the first turn (and
    for total rewrites); near 0 for near-verbatim repeats — the
    turn-grain repetition signal for agents stuck re-emitting the same
    output. Pure JVM expression (F.levenshtein + one lag window), rides
    the conversation exchange like every other LLD."""
    w = Window.partitionBy(*by).orderBy(order_col)
    prev = F.lag(text_col).over(w)
    dist = F.levenshtein(F.col(text_col), prev).cast("double")
    denom = F.greatest(F.length(text_col), F.length(prev))
    nov = F.when(prev.isNull(), F.lit(1.0)).otherwise(
        dist / F.when(denom > 0, denom))
    return df.withColumn(out_col, nov)


def trajectory_metrics(
    df: DataFrame,
    by: Sequence[str] = ("conv_id",),
    order_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
    loop_min: int = 3,
) -> DataFrame:
    """Per-`by`-group agent-trajectory summary.

    Output columns (one row per group):
      n_turns, n_tool_calls, n_distinct_tools, max_tool_run,
      n_tool_loops (runs of >= loop_min consecutive same-tool calls),
      n_role_repeats (adjacent same-role turn pairs),
      n_user_turns, n_assistant_turns,
      mean_reply_latency_s (assistant turns only; null when none).
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(order_col)
    is_tool = F.col("_role") == "tool"

    base = df.select(
        *by, order_col,
        F.col(role_col).alias("_role"),
        F.col(tool_col).alias("_tool"),
        F.col(ts_col).alias("_ts"),
    ).withColumn(
        "_prev_role", F.lag("_role").over(w)
    ).withColumn(
        "_gap_s",
        epoch_seconds("_ts") - F.lag(epoch_seconds("_ts")).over(w),
    ).withColumn(
        # the PREVIOUS tool call's tool name (running last over the
        # strictly-preceding frame, non-tool rows transparent) — a new
        # same-tool run starts where it differs or doesn't exist
        "_prev_tool_call",
        F.last(F.when(is_tool, F.col("_tool")), ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "_new_run",
        F.when(
            is_tool
            & (F.col("_prev_tool_call").isNull()
               | (F.col("_prev_tool_call") != F.col("_tool"))),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        # run ordinal among this group's tool calls; NULL for non-tool
        # rows so the (group, run) aggregation keeps them in their own
        # bucket instead of folding them into the nearest run
        "_run_key",
        F.when(is_tool, F.sum("_new_run").over(
            w.rowsBetween(Window.unboundedPreceding, 0))),
    )

    # level 1: one row per (group, tool-run) — plus one NULL-key row per
    # group carrying the non-tool partials. Hash partitioning on `by`
    # satisfies this clustering, so no second exchange.
    runs = base.groupBy(*by, "_run_key").agg(
        F.count(F.lit(1)).alias("_n_rows"),
        F.count(F.when(is_tool, 1)).alias("_run_len"),
        F.first(F.when(is_tool, F.col("_tool"))).alias("_run_tool"),
        F.count(F.when(F.col("_role") == F.col("_prev_role"), 1))
        .alias("_role_repeats"),
        F.count(F.when(F.col("_role") == "user", 1)).alias("_n_user"),
        F.count(F.when(F.col("_role") == "assistant", 1))
        .alias("_n_assistant"),
        F.sum(F.when(F.col("_role") == "assistant", F.col("_gap_s")))
        .alias("_lat_sum"),
        F.count(F.when(F.col("_role") == "assistant", F.col("_gap_s")))
        .alias("_lat_cnt"),
    )

    # level 2: fold runs into the per-group summary
    out = runs.groupBy(*by).agg(
        F.sum("_n_rows").cast("long").alias("n_turns"),
        F.sum("_run_len").cast("long").alias("n_tool_calls"),
        F.countDistinct("_run_tool").cast("long").alias("n_distinct_tools"),
        F.coalesce(
            F.max(F.when(F.col("_run_key").isNotNull(), F.col("_run_len"))),
            F.lit(0),
        ).cast("long").alias("max_tool_run"),
        F.count(
            F.when(
                F.col("_run_key").isNotNull()
                & (F.col("_run_len") >= loop_min), 1)
        ).cast("long").alias("n_tool_loops"),
        F.sum("_role_repeats").cast("long").alias("n_role_repeats"),
        F.sum("_n_user").cast("long").alias("n_user_turns"),
        F.sum("_n_assistant").cast("long").alias("n_assistant_turns"),
        (F.sum("_lat_sum")
         / F.when(F.sum("_lat_cnt") > 0, F.sum("_lat_cnt")))
        .alias("mean_reply_latency_s"),
    )
    return out
