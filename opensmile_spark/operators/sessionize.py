"""Sessionization — the cTurnDetector analogue.

The reference segments streams with a stateful hysteresis detector emitting
turnStart/turnEnd messages (/root/reference/src/dspcore/turnDetector.cpp:
35-72: nPre frames above threshold open a turn, nPost below close it,
maxTurnLength forces a split, timeoutSec closes on inactivity). Downstream
functionals pull the [start, end] range per message
(winToVecProcessor.cpp:917-938, frameMode=var).

Spark has no side channel; segmentation becomes a computed `session_id`
column — identical semantics, declarative form:
  1. gap rule: a new session starts when ts - lag(ts) > gap (the timeoutSec
     analogue);
  2. max-length rule: a session longer than max_turns rows is force-split
     (the maxTurnLength analogue, turnDetector.cpp:58-62).

Both are window expressions over (conv_id, turn_idx) — one shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensmile_spark.util import epoch_seconds


def sessionize(
    df: DataFrame,
    gap_seconds: float = 300.0,
    max_turns: int | None = None,
    partition_cols=("conv_id",),
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    out_col: str = "session_id",
) -> DataFrame:
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    cum = Window.partitionBy(*partition_cols).orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, 0)

    gap = epoch_seconds(ts_col) - F.lag(epoch_seconds(ts_col)).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    out = df.withColumn(out_col, (F.sum(new_sess).over(cum) - 1).cast("int"))

    if max_turns is not None:
        # force-split oversized sessions: row index within session // max_turns
        ws = Window.partitionBy(*partition_cols, out_col).orderBy(order_col)
        out = (
            out.withColumn("__sidx", F.row_number().over(ws) - 1)
            .withColumn("__subs", (F.col("__sidx") / max_turns).cast("int"))
        )
        # re-number (session_id, subsplit) pairs densely per conv
        wd = Window.partitionBy(*partition_cols).orderBy(out_col, "__subs")
        out = (
            out.withColumn(
                out_col,
                (F.dense_rank().over(wd) - 1).cast("int"),
            )
            .drop("__sidx", "__subs")
        )
    return out


def session_bounds(
    df: DataFrame,
    partition_cols=("conv_id",),
    session_col: str = "session_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session [start_ts, end_ts, n_turns] — the turnFrameTime message
    payload analogue (turnDetector.cpp:48-56)."""
    return df.groupBy(*partition_cols, session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_turns"),
    )


def turn_detector(
    df: DataFrame,
    energy_col: str,
    threshold: float = 0.0,
    n_pre: int = 2,
    n_post: int = 2,
    partition_cols=("conv_id",),
    order_col: str = "turn_idx",
    out_col: str = "turn_id",
) -> DataFrame:
    """cTurnDetector hysteresis (/root/reference/src/dspcore/turnDetector.cpp:
    35-72): a turn opens after `n_pre` above-threshold frames and closes
    after `n_post` below-threshold frames. Equivalently (the frameMode=var
    automaton): a turn is a maximal group of above-threshold frames whose
    internal below-threshold gaps are < n_post, valid when it contains
    >= n_pre above-threshold frames. Window expressions only: gap-group the
    active frames, count per group, label member rows (inactive / invalid
    rows get null). One shuffle on the (conv, order) window the LLD chain
    already uses."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    active = F.col(energy_col) > threshold
    # index within conv + previous-active index via last-non-null
    idx = F.row_number().over(w) - 1
    d = df.withColumn("__i", idx)
    prev_act = F.last(F.when(active, F.col("__i")), ignorenulls=True) \
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_grp = F.when(
        active & (prev_act.isNull()
                  | (F.col("__i") - prev_act - 1 >= n_post)), 1).otherwise(0)
    d = d.withColumn("__grp",
                     F.when(active, F.sum(new_grp).over(cum)).otherwise(None))
    wg = Window.partitionBy(*partition_cols, "__grp")
    n_active = F.count(F.when(active, 1)).over(wg)
    d = d.withColumn(
        out_col,
        F.when(F.col("__grp").isNotNull() & (n_active >= n_pre),
               (F.col("__grp") - 1).cast("int")).otherwise(None),
    )
    # re-number valid turns densely per conv (invalid groups leave gaps);
    # nulls sort last so the first valid turn ranks 1 -> id 0
    wd = Window.partitionBy(*partition_cols) \
        .orderBy(F.col(out_col).asc_nulls_last())
    d = d.withColumn(
        out_col,
        F.when(F.col(out_col).isNotNull(),
               (F.dense_rank().over(wd) - 1).cast("int")),
    )
    return d.drop("__i", "__grp")
