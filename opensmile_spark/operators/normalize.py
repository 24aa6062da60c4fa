"""Normalisation transforms — cVectorMVN / cFullinputMean.

cVectorMVN (/root/reference/src/dspcore/vectorMVN.cpp:34-42) normalises with
mean/stddev (or min-max) statistics that are either computed over the whole
input ("analysis" then "transform" passes), updated incrementally, or loaded
from a file (cVectorTransform modes, vectorTransform.hpp:24-39).

cFullinputMean (/root/reference/src/dspcore/fullinputMean.cpp:35-45) is the
two-phase whole-input mean subtraction (multiLoopMode: accumulate in pass 1,
subtract at EOI).

Spark strategies (SURVEY.md §2.4):
  mode="full"      groupBy().agg() + broadcast-join back — exact reference
                   semantics (non-causal by design — batch parity only!)
  mode="expanding" causal variant: expanding window (ts <= current) —
                   the point-in-time-safe choice for backfill
  mode="global"    precomputed stats dict (the "load from file" mode) —
                   broadcast map, no shuffle at all
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mvn(
    df: DataFrame,
    cols: list[str],
    mode: str = "full",
    by=("conv_id",),
    order_col: str = "turn_idx",
    stats: dict | None = None,
    min_max: bool = False,
    suffix: str = "_mvn",
) -> DataFrame:
    by = list(by)
    out = df
    if mode == "global":
        for c in cols:
            mu, sd = stats[c]
            out = out.withColumn(
                c + suffix,
                (F.col(c) - F.lit(mu)) / F.lit(sd if sd != 0 else 1.0),
            )
        return out

    if mode == "expanding":
        w = Window.partitionBy(*by).orderBy(order_col) \
            .rowsBetween(Window.unboundedPreceding, 0)
        for c in cols:
            if min_max:
                lo, hi = F.min(c).over(w), F.max(c).over(w)
                out = out.withColumn(
                    c + suffix,
                    F.when(hi != lo, (F.col(c) - lo) / (hi - lo)).otherwise(0.0),
                )
            else:
                mu = F.avg(c).over(w)
                # population stddev over the expanding window — stddev_pop
                # (central-moment aggregator) instead of
                # sqrt(E[x^2]-mean^2), which catastrophically cancels for
                # large-mean columns (can even go sqrt(negative) -> NaN,
                # and NaN > 0 is TRUE in Spark, bypassing the guard)
                sd = F.stddev_pop(c).over(w)
                out = out.withColumn(
                    c + suffix,
                    F.when(sd.isNotNull() & ~F.isnan(sd) & (sd > 0),
                           (F.col(c) - mu) / sd).otherwise(0.0),
                )
        return out

    # mode == "full": two-phase agg + join (the multiLoopMode analogue).
    # The stats side is tiny (one row per group) -> broadcast join, no
    # second shuffle of the big side.
    aggs = []
    for c in cols:
        if min_max:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        else:
            aggs += [
                F.avg(c).alias(f"__mu_{c}"),
                # numerically stable population stddev (see expanding mode)
                F.stddev_pop(c).alias(f"__sd_{c}"),
            ]
    st = df.groupBy(*by).agg(*aggs)
    out = df.join(F.broadcast(st), on=by, how="left")
    for c in cols:
        if min_max:
            lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
            out = out.withColumn(
                c + suffix,
                F.when(hi != lo, (F.col(c) - lo) / (hi - lo)).otherwise(0.0),
            )
        else:
            mu, sd = F.col(f"__mu_{c}"), F.col(f"__sd_{c}")
            out = out.withColumn(
                c + suffix,
                F.when(sd.isNotNull() & ~F.isnan(sd) & (sd > 0),
                       (F.col(c) - mu) / sd).otherwise(0.0),
            )
    return out.drop(*[c for c in out.columns if c.startswith("__")])


def mvn_fit(
    df: DataFrame,
    cols: list[str],
    by=("conv_id",),
) -> DataFrame:
    """Analysis pass of the cVectorTransform analysis/transform split
    (vectorTransform.hpp:24-39, UPDMETHOD_FIX with saved initial values):
    per-group mean + population stddev, one row per group — the "save stats
    to file" stage. The output is a tiny stats table meant to be persisted
    (feature-store style) and fed to `mvn_transform` on any later dataset."""
    by = list(by)
    return df.groupBy(*by).agg(*[
        a for c in cols for a in (
            F.avg(c).alias(f"{c}_mean"),
            F.stddev_pop(c).alias(f"{c}_std"),
        )
    ])


def mvn_transform(
    df: DataFrame,
    stats: DataFrame,
    cols: list[str],
    by=("conv_id",),
    suffix: str = "_mvn",
) -> DataFrame:
    """Transform pass with FROZEN pre-trained stats (cVectorMVN mode with
    initFile / UPDMETHOD_FIX, vectorTransform.hpp:24-39): broadcast-join the
    stats table (tiny) onto the big side — no shuffle of df, no second pass.
    Rows whose group has no stats (or zero/NaN stddev) emit 0.0, mirroring
    the sd>0 guard of the batch modes."""
    by = list(by)
    out = df.join(F.broadcast(stats), on=by, how="left")
    for c in cols:
        mu, sd = F.col(f"{c}_mean"), F.col(f"{c}_std")
        out = out.withColumn(
            c + suffix,
            F.when(sd.isNotNull() & ~F.isnan(sd) & (sd > 0),
                   (F.col(c) - mu) / sd).otherwise(0.0),
        )
    return out.drop(*[f"{c}_mean" for c in cols],
                    *[f"{c}_std" for c in cols])


def fullinput_mean(
    df: DataFrame,
    cols: list[str],
    by=("conv_id",),
    order_col: str = "turn_idx",
    causal: bool = False,
    mean_type: str = "amean",
    suffix: str = "_fim",
) -> DataFrame:
    """cFullinputMean: x - mean(whole input). mean_type per
    fullinputMean.cpp:35-45: amean | rqmean (sqrt of mean square) | absmean.
    causal=True switches to the expanding-window (point-in-time) variant —
    the reference op is non-causal by design (SURVEY.md §2.4 flag)."""
    by = list(by)
    out = df

    def mean_expr(c, over=None):
        x = F.col(c)
        if mean_type == "rqmean":
            e = F.sqrt(F.avg(x * x).over(over)) if over is not None \
                else F.sqrt(F.avg(x * x))
        elif mean_type == "absmean":
            e = F.avg(F.abs(x)).over(over) if over is not None \
                else F.avg(F.abs(x))
        else:
            e = F.avg(x).over(over) if over is not None else F.avg(x)
        return e

    if causal:
        w = Window.partitionBy(*by).orderBy(order_col) \
            .rowsBetween(Window.unboundedPreceding, 0)
        for c in cols:
            out = out.withColumn(c + suffix, F.col(c) - mean_expr(c, w))
        return out

    st = df.groupBy(*by).agg(*[mean_expr(c).alias(f"__m_{c}") for c in cols])
    out = df.join(F.broadcast(st), on=by, how="left")
    for c in cols:
        out = out.withColumn(c + suffix, F.col(c) - F.col(f"__m_{c}"))
    return out.drop(*[f"__m_{c}" for c in cols])
