"""Projection / row-filter operators — cDataSelector & cValbasedSelector.

cDataSelector (/root/reference/src/core/dataSelector.cpp:35-41): select
elements by exact name, name range, or index ranges; optional `newNames`
aliasing. Spark: select + alias, regex selection via colRegex.

cValbasedSelector (/root/reference/src/other/valbasedSelector.cpp:33-43):
emit a frame only if element[idx] ⋛ threshold; `invert` flips, `allowEqual`
includes equality, `zeroVec=1` zeroes the vector instead of dropping the row,
and an adaptive mode thresholds against the running average. All pure
Catalyst expressions (filter pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def data_selector(
    df: DataFrame,
    names: list[str] | None = None,
    pattern: str | None = None,
    new_names: dict[str, str] | None = None,
    keep_keys=("conv_id", "turn_idx", "ts"),
) -> DataFrame:
    """Projection + rename. `names` exact, `pattern` Java regex (colRegex)."""
    keys = [k for k in keep_keys if k in df.columns]
    cols = [F.col(k) for k in keys]
    if pattern is not None:
        selected = [c for c in df.columns
                    if c not in keys and __import__("re").match(pattern, c)]
    else:
        selected = [n for n in (names or []) if n not in keys]
    new_names = new_names or {}
    cols += [F.col(f"`{c}`").alias(new_names.get(c, c)) for c in selected]
    return df.select(*cols)


def valbased_selector(
    df: DataFrame,
    gate_col: str,
    threshold: float = 0.0,
    op: str = "gt",
    invert: bool = False,
    zero_cols: list[str] | None = None,
    adaptive: bool = False,
    partition_cols=("conv_id",),
    order_col: str = "turn_idx",
) -> DataFrame:
    """Row filter / zero-out gate.

    op in {gt, ge, lt, le, eq}; invert flips the predicate. zero_cols set
    -> instead of dropping rows, zero those columns where the gate fails
    (zeroVec=1, valbasedSelector.cpp:40). adaptive=True thresholds against
    the causal running mean of gate_col (the adaptive running-average
    threshold, valbasedSelector.cpp:34-36) — expanding window, leakage-safe.
    """
    g = F.col(gate_col)
    thr = F.lit(threshold)
    if adaptive:
        w = Window.partitionBy(*partition_cols).orderBy(order_col) \
            .rowsBetween(Window.unboundedPreceding, 0)
        thr = F.avg(g).over(w) * threshold if threshold else F.avg(g).over(w)
    preds = {
        "gt": g > thr, "ge": g >= thr, "lt": g < thr,
        "le": g <= thr, "eq": g == thr,
    }
    cond = preds[op]
    if invert:
        cond = ~cond
    if zero_cols:
        out = df
        for c in zero_cols:
            out = out.withColumn(c, F.when(cond, F.col(c)).otherwise(F.lit(0.0)))
        return out
    return df.filter(cond)


def max_index(
    df: DataFrame,
    array_col: str,
    n_indices: int = 1,
    out_col: str = "max_idx",
) -> DataFrame:
    """cMaxIndex (/root/reference/src/other/maxIndex.cpp:34-39): top-n
    argmax positions over an array field per row (1-based like openSMILE's
    field indexing is 0-based; we emit 0-based)."""
    arr = F.col(array_col)
    if n_indices == 1:
        return df.withColumn(
            out_col, (F.array_position(arr, F.array_max(arr)) - 1).cast("int")
        )
    # top-n: sort (value, index) structs descending, take indices
    idx = F.transform(arr, lambda v, i: F.struct(v.alias("v"), i.alias("i")))
    topk = F.slice(F.reverse(F.array_sort(idx)), 1, n_indices)
    return df.withColumn(out_col, F.transform(topk, lambda s: s["i"]))
