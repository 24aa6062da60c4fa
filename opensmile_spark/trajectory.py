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

Everything is built from ONE lag() window pass over the conversation's
turn order plus per-conversation aggregation, so the whole operator
rides the same hash exchange as the LLD chain (partition by conv_id) —
no Python, no extra shuffle beyond the groupBy. At 10^12 turns this is
a single map-side-combinable aggregation per conversation; the run
(gaps-and-islands) stage reuses the conv_id partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensmile_spark.util import epoch_seconds


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
    )

    per_turn = base.groupBy(*by).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.count(F.when(F.col("_role") == "tool", 1)).cast("long")
        .alias("n_tool_calls"),
        F.countDistinct(
            F.when(F.col("_role") == "tool", F.col("_tool"))
        ).cast("long").alias("n_distinct_tools"),
        F.count(
            F.when(F.col("_role") == F.col("_prev_role"), 1)
        ).cast("long").alias("n_role_repeats"),
        F.count(F.when(F.col("_role") == "user", 1)).cast("long")
        .alias("n_user_turns"),
        F.count(F.when(F.col("_role") == "assistant", 1)).cast("long")
        .alias("n_assistant_turns"),
        F.avg(
            F.when(F.col("_role") == "assistant", F.col("_gap_s"))
        ).alias("mean_reply_latency_s"),
    )

    # Gaps-and-islands over the TOOL-CALL subsequence: restrict to tool
    # turns, then a run starts wherever the tool name differs from the
    # previous tool call's (or at the first call). run_id = running sum
    # of starts; island length = rows per (group, run_id).
    tools = base.filter(F.col("_role") == "tool").withColumn(
        "_new_run",
        F.when(
            F.lag("_tool").over(w).isNull()
            | (F.lag("_tool").over(w) != F.col("_tool")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("_run_id", F.sum("_new_run").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = (
        tools.groupBy(*by, "_run_id").agg(F.count(F.lit(1)).alias("_len"))
        .groupBy(*by).agg(
            F.max("_len").cast("long").alias("max_tool_run"),
            F.count(F.when(F.col("_len") >= loop_min, 1)).cast("long")
            .alias("n_tool_loops"),
        )
    )

    out = per_turn.join(runs, on=by, how="left").select(
        *by, "n_turns", "n_tool_calls", "n_distinct_tools",
        F.coalesce("max_tool_run", F.lit(0)).cast("long")
        .alias("max_tool_run"),
        F.coalesce("n_tool_loops", F.lit(0)).cast("long")
        .alias("n_tool_loops"),
        "n_role_repeats", "n_user_turns", "n_assistant_turns",
        "mean_reply_latency_s",
    )
    return out
