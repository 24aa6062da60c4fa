"""Framing — frameMode=fixed/list materialisation and the interval join.

cFramer materialises each window as a vector (/root/reference/src/dspcore/
framer.cpp:54-68); frameMode=list extracts explicit [start,end] intervals
(winToVecProcessor.cpp:336-374, 940-965) — the reference's only join-like
operator with an interval predicate. Spark: a broadcast range join
(ts BETWEEN start AND end) when the interval table is small, else AQE handles
the shuffle join; then groupBy(interval) for the functional pass.

tumbling_frames covers frameMode=fixed with frameStep == frameSize
(winToVecProcessor.cpp:438-458) via the built-in F.window bucketing —
no shuffle beyond the downstream groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensmile_spark.util import epoch_seconds


def frame_vector(
    df: DataFrame,
    col: str,
    frame_rows: int,
    partition_cols=("conv_id",),
    order_col: str = "turn_idx",
    out_col: str | None = None,
) -> DataFrame:
    """cFramer: each row gets the trailing window of `frame_rows` values as
    an array column (the materialized frame; ragged at the head mirrors
    allowLastFrameIncomplete/PAD_NONE truncation,
    winToVecProcessor.cpp:967-989)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(frame_rows - 1), 0)
    )
    return df.withColumn(out_col or f"{col}_frame", F.collect_list(col).over(w))


def tumbling_frames(
    df: DataFrame,
    size_seconds: float,
    step_seconds: float | None = None,
    ts_col: str = "ts",
    out_col: str = "frame",
) -> DataFrame:
    """frameMode=fixed over event time: tumbling (step==size, default) or
    sliding (hopping) windows via F.window."""
    size = f"{int(size_seconds)} seconds"
    if step_seconds and step_seconds != size_seconds:
        win = F.window(F.col(ts_col), size, f"{int(step_seconds)} seconds")
    else:
        win = F.window(F.col(ts_col), size)
    return df.withColumn(out_col, win)


def interval_join(
    df: DataFrame,
    intervals: DataFrame,
    on: str = "conv_id",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """frameMode=list: attach each row to every interval containing its ts
    (inclusive ends, matching getMatrix(start, end) pulls). The interval
    table is broadcast when small — zero shuffle of the fact side."""
    iv = intervals
    if broadcast_intervals:
        iv = F.broadcast(iv)
    cond = (
        (df[on] == iv[on])
        & (epoch_seconds(df[ts_col]) >= epoch_seconds(iv[start_col]))
        & (epoch_seconds(df[ts_col]) <= epoch_seconds(iv[end_col]))
    )
    return df.join(iv, cond).drop(iv[on])


def segment_by_meta(
    df: DataFrame,
    meta_col: str,
    partition_cols=("conv_id",),
    order_col: str = "turn_idx",
    out_col: str = "meta_seg",
) -> DataFrame:
    """frameMode=meta (winToVecProcessor.cpp frameMode config): segment at
    CHANGES of a metadata-carried ID — each maximal run of equal `meta_col`
    values becomes one segment. Downstream: functionals_kernel grouped on
    (partition_cols..., out_col). One window over the existing (conv,
    order) shuffle, reusable by the whole LLD chain."""
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    change = F.when(
        F.lag(meta_col).over(w).isNull()
        | (F.col(meta_col) != F.lag(meta_col).over(w)),
        1,
    ).otherwise(0)
    return df.withColumn(
        out_col,
        (F.sum(change).over(
            w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("int"),
    )
