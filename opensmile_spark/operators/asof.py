"""Point-in-time as-of merge + backfill — the causal ring-buffer read, as a join.

The reference's buffer protocol IS its temporal-leakage guarantee: a reader
can never observe frames beyond the write cursor (`curW`), and relative reads
are "latest frame with vIdx <= now" (/root/reference/src/include/core/
dataMemoryLevel.hpp:296-311, dataReader.hpp:87-88 getFrameRel). Cross-rate
reads (e.g. pitchJitter reading wave + F0 levels at different periods,
GeMAPSv01b_core.lld.conf.inc:174-179) resolve time via secToVidx
(dataMemory.hpp:132-133) — exactly an as-of lookup.

Spark-first implementation — union + last-non-null over an ordered window:
one shuffle+sort on (key, time), linear work, no O(anchor x rows) blowup,
AQE-skew friendly. For each anchor row, every right column is filled with the
latest right value at ts <= anchor_ts (ties: the right row wins, i.e. a turn
AT the anchor timestamp is visible — mirroring "frame written at t is
readable at t").

`backfill_functionals` materializes whole functional vectors at every
(conv_id, anchor_ts) grid point using a per-conversation vectorized kernel
(cogrouped applyInPandas): for A anchors over N turns it does one sort plus
prefix scans — not A separate window jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensmile_spark.functionals.kernels import compute_all


def asof_join(
    anchors: DataFrame,
    right: DataFrame,
    on: str = "conv_id",
    anchor_ts: str = "anchor_ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each anchor row: latest `right` row with right_ts <= anchor_ts
    (right_ts < anchor_ts when strict=True). Null columns when no prior row
    exists (the DMEM_PAD_ZERO analogue is a caller-side fillna; padding
    policies per dataMemoryLevel.hpp:26-28).
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    a = anchors.select(
        F.col(on),
        F.col(anchor_ts).alias("__t"),
        F.lit(1).alias("__is_anchor"),
        *[F.col(c) for c in anchors.columns if c not in (on, anchor_ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_anchor"),
        *[F.lit(None).cast(anchors.schema[c].dataType).alias(c)
          for c in anchors.columns if c not in (on, anchor_ts)],
        *[F.col(c) for c in value_cols],
    )
    # non-strict: right rows sort before anchors at equal __t => ties visible;
    # strict: anchors sort first => equal-time right rows NOT visible
    tie_order = F.col("__is_anchor").desc() if strict else F.col("__is_anchor").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), tie_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = a.unionByName(r)
    for c in value_cols:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = merged.filter(F.col("__is_anchor") == 1).drop("__is_anchor")
    return out.withColumnRenamed("__t", anchor_ts)


def backfill_functionals(
    lld: DataFrame,
    anchors: DataFrame,
    value_cols: list[str],
    families: list[str] | None = None,
    options: dict | None = None,
    window_seconds: float | None = None,
    on: str = "conv_id",
    anchor_ts: str = "anchor_ts",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Functional vectors at every (conv_id, anchor_ts): each anchor sees
    only turns with ts <= anchor_ts (zero temporal leakage, enforced in one
    place), optionally bounded to a trailing window of `window_seconds`.

    Cogrouped applyInPandas keyed by conv_id: one shuffle of each side,
    vectorized numpy inside. Empty windows emit NaN features (anchor row is
    kept so the grid is complete — the PAD_ZERO/PAD_NONE choice is the
    caller's fillna/dropna).
    """
    import numpy as np
    import pandas as pd

    families = families or ["means", "moments", "extremes", "percentiles",
                            "regression"]
    options = options or {}

    probe = compute_all(np.arange(1.0, 9.0), families, options)
    feat_names = [f"{c}_{k}" for c in value_cols for k in probe]
    schema = (
        f"{on} string, {anchor_ts} timestamp, n_visible long, "
        + ", ".join(f"`{n}` double" for n in feat_names)
    )

    def kernel(key, ldf, adf):
        if adf.empty:
            return pd.DataFrame(columns=[on, anchor_ts, "n_visible"] + feat_names)
        conv = key[0]
        adf = adf.sort_values(anchor_ts)
        rows = []
        if ldf.empty:
            ts_vals = np.array([], dtype="datetime64[us]")
        else:
            ldf = ldf.sort_values([ts_col, order_col], kind="mergesort")
            ts_vals = ldf[ts_col].to_numpy()
        anchor_vals = adf[anchor_ts].to_numpy()
        # prefix positions: count of turns with ts <= anchor (searchsorted right)
        hi = np.searchsorted(ts_vals, anchor_vals, side="right")
        if window_seconds is not None:
            lo = np.searchsorted(
                ts_vals,
                anchor_vals - np.timedelta64(int(window_seconds * 1e6), "us"),
                side="left",
            )
        else:
            lo = np.zeros_like(hi)
        col_arrays = {c: ldf[c].to_numpy(dtype=np.float64) if not ldf.empty
                      else np.array([]) for c in value_cols}
        for j in range(len(adf)):
            row = {on: conv, anchor_ts: adf[anchor_ts].iloc[j],
                   "n_visible": int(hi[j] - lo[j])}
            for c in value_cols:
                xs = col_arrays[c][lo[j]:hi[j]]
                feats = compute_all(xs, families, options)
                for k in probe:
                    row[f"{c}_{k}"] = feats.get(k, float("nan"))
            rows.append(row)
        return pd.DataFrame(rows, columns=[on, anchor_ts, "n_visible"] + feat_names)

    lg = lld.select(on, order_col, ts_col, *value_cols).groupBy(on)
    ag = anchors.select(on, anchor_ts).groupBy(on)
    return lg.cogroup(ag).applyInPandas(kernel, schema=schema)
