"""Time-grid regularization — the cSmileResample / cSpecResample analogue.

The reference resamples a uniformly-sampled signal to a new rate
(/root/reference/src/dsp/smileResample.cpp — FFT/sinc interpolation onto the
`targetRate` grid; specResample.cpp does the same for spectra). In the
transcript domain the series is IRREGULAR (turns arrive at arbitrary ts), so
"resample" means: land every conversation on a uniform grid of period
`period_seconds`, with a value policy at each grid point. Time<->index
duality per dataMemory.hpp:132-133 (secToVidx/vIdxToSec): grid index i maps
to t0 + i*period, exactly the reference's frame-time convention.

Policies (per value column):
  hold     latest sample at ts <= grid point (the causal as-of read —
           sample-and-hold; DMEM-style "latest frame readable at t")
  linear   linear interpolation between the surrounding samples (the
           irregular-series stand-in for the reference's band-limited
           interpolation; ends clamp to the nearest sample)
  nearest  the closer of the two surrounding samples (ties -> earlier)

Scale shape: one tiny per-conversation (min, max) aggregate builds the grid
(sequence + explode — narrow), then ONE shuffle of grid+data on the
conversation key drives two ordered window passes (ascending for the
previous sample, descending for the next). Work is linear in rows + grid
points; no join node, no per-row Python, no driver collect. Equal-ts data
rows are disambiguated by `order_col` (highest wins — same convention as
operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_POLICIES = ("hold", "linear", "nearest")


def resample(
    df: DataFrame,
    period_seconds: float,
    by: str = "conv_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    policy: str = "linear",
    order_col: str | None = "turn_idx",
    origin_epoch: float | None = None,
) -> DataFrame:
    """Regularize an irregular per-`by` series onto a uniform grid.

    Grid per key: origin, origin + period, ... up to the key's max ts,
    where origin is the key's min ts (origin_epoch=None) or the first
    grid point >= the key's min ts on the global lattice
    origin_epoch + k*period (for cross-key-aligned grids). Output: one row
    per (key, grid ts) with each value column filled per `policy`, plus
    `n_seen` = number of samples with ts <= the grid point.

    Value columns may be numeric scalars OR array<numeric> (the
    cSpecResample case: per-turn spectra landing on the grid) —
    arrays interpolate element-wise (zip_with) under `linear` and are
    picked whole under `hold`/`nearest`.
    """
    if policy not in _POLICIES:
        raise ValueError(f"policy must be one of {_POLICIES}, got {policy!r}")
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    p_us = int(round(period_seconds * 1e6))
    if value_cols is None:
        value_cols = [c for c in df.columns
                      if c not in (by, ts_col, order_col)]
    ord_expr = (F.col(order_col).cast("long") if order_col is not None
                and order_col in df.columns else F.lit(0).cast("long"))

    from pyspark.sql.types import ArrayType

    # array<numeric> value columns (the cSpecResample case — per-turn
    # SPECTRA landing on the uniform grid) interpolate element-wise via
    # zip_with; scalars stay plain column arithmetic
    is_arr = {c: isinstance(df.schema[c].dataType, ArrayType)
              for c in value_cols}

    def _in(c):
        col = F.col(c)
        return (F.transform(col, lambda x: x.cast("double")) if is_arr[c]
                else col.cast("double"))

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    data = df.select(
        F.col(by),
        us.alias("__t"),
        F.lit(0).alias("__is_grid"),
        ord_expr.alias("__ord"),
        *[_in(c).alias(c) for c in value_cols],
    )

    # per-key grid: a tiny (key, min, max) aggregate, then sequence+explode
    # (narrow). With a global origin, snap the start up to the lattice.
    bounds = data.groupBy(by).agg(F.min("__t").alias("__mn"),
                                  F.max("__t").alias("__mx"))
    if origin_epoch is None:
        start = F.col("__mn")
    else:
        o_us = int(round(origin_epoch * 1e6))
        start = (F.lit(o_us)
                 + F.ceil((F.col("__mn") - F.lit(o_us))
                          / F.lit(p_us)).cast("long") * F.lit(p_us))
    grid = bounds.select(
        F.col(by),
        F.explode(F.sequence(start, F.col("__mx"),
                             F.lit(p_us))).alias("__t"),
        F.lit(1).alias("__is_grid"),
        F.lit(None).cast("long").alias("__ord"),
        *[F.lit(None).cast("array<double>" if is_arr[c] else "double")
          .alias(c) for c in value_cols],
    )

    merged = data.unionByName(grid)
    # previous sample: ascending scan, data rows sort BEFORE grid rows at
    # equal __t (a sample AT the grid point is visible — non-strict as-of),
    # equal-ts data rows resolved by __ord (highest wins: F.last sees it
    # latest). next sample: the same with time reversed.
    w_prev = (Window.partitionBy(by)
              .orderBy(F.col("__t").asc(), F.col("__is_grid").asc(),
                       F.col("__ord").asc_nulls_first())
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy(by)
              .orderBy(F.col("__t").desc(), F.col("__is_grid").asc(),
                       F.col("__ord").asc_nulls_first())
              .rowsBetween(Window.unboundedPreceding, 0))
    n_seen = F.sum(F.lit(1) - F.col("__is_grid")).over(w_prev)
    for c in value_cols:
        pick = F.when(F.col(c).isNotNull(),
                      F.struct(F.col("__t").alias("t"),
                               F.col(c).alias("v")))
        merged = (merged
                  .withColumn(f"__p_{c}", F.last(pick, ignorenulls=True)
                              .over(w_prev))
                  .withColumn(f"__n_{c}", F.last(pick, ignorenulls=True)
                              .over(w_next)))
    merged = merged.withColumn("__n_seen", n_seen)

    out = merged.filter(F.col("__is_grid") == 1)
    t = F.col("__t")
    cols = [F.col(by),
            F.timestamp_micros(t).alias(ts_col),
            F.col("__n_seen").cast("long").alias("n_seen")]
    for c in value_cols:
        pv, pt = F.col(f"__p_{c}.v"), F.col(f"__p_{c}.t")
        nv, nt = F.col(f"__n_{c}.v"), F.col(f"__n_{c}.t")
        if policy == "hold":
            val = pv
        elif policy == "nearest":
            val = (F.when(pv.isNull(), nv)
                   .when(nv.isNull(), pv)
                   .when(t - pt <= nt - t, pv)
                   .otherwise(nv))
        else:  # linear
            frac = (t - pt).cast("double") / (nt - pt).cast("double")
            if is_arr[c]:
                interp = F.zip_with(pv, nv,
                                    lambda p, n: p + (n - p) * frac)
            else:
                interp = pv + (nv - pv) * frac
            val = (F.when(pv.isNull(), nv)
                   .when(nv.isNull() | (nt == pt), pv)
                   .otherwise(interp))
        cols.append(val.alias(c))
    return out.select(*cols)
