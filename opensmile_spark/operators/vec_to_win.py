"""cVecToWinProcessor — frames back to a sample stream by overlap-add.

Reference (/root/reference/src/core/vecToWinProcessor.cpp): each input
vector is a window of samples placed at its frame position; overlapping
regions are summed with optional normalisation by the summed window gain
(resynthesis). Spark-first: explode each frame array into (position, value,
weight) rows, then groupBy position summing value*weight / sum(weight) —
a shuffle on the output grid, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_add(
    df: DataFrame,
    frame_col: str,
    frame_start_col: str = "frame_start",
    partition_cols=("conv_id",),
    step: int = 1,
    normalize: bool = True,
    out_col: str = "value",
) -> DataFrame:
    """Reassemble frames (array columns placed at `frame_start_col` sample
    positions, hop = `step`) into one series per partition key.

    Output: (partition_cols..., pos, value). With normalize=True each output
    sample is the gain-normalised sum of contributions (rectangular window
    weights; pass pre-windowed frames for other window functions, matching
    the reference where windowing happened upstream in cWindower)."""
    keys = list(partition_cols)
    exploded = df.select(
        *keys,
        F.col(frame_start_col).alias("__start"),
        F.posexplode(F.col(frame_col)).alias("__off", "__v"),
    ).select(
        *keys,
        (F.col("__start") + F.col("__off")).alias("pos"),
        F.col("__v").alias("__v"),
    )
    agg = exploded.groupBy(*keys, "pos").agg(
        F.sum("__v").alias("__sum"),
        F.count("*").alias("__n"),
    )
    val = (F.col("__sum") / F.col("__n")) if normalize else F.col("__sum")
    return agg.select(*keys, "pos", val.alias(out_col))
