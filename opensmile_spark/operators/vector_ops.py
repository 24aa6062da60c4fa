"""Per-row scalar math — cVectorOperation / cVectorBinaryOperation /
cMonoMixdown, as pure Catalyst column expressions.

cVectorOperation (/root/reference/src/other/vectorOperation.cpp:42-48)
unary/reduce op set: norm(L2) nr1 nr0 nma mul add log lgA sqrt pow exp ee
abs min max agn sum ssm ll1 ll2 dBp dBv fconv_*. cVectorBinaryOperation
(/root/reference/src/other/vectorBinaryOperation.cpp:36-41): elementwise
add/sub/mul/div/pow/min/max of two fields with a divide-by-zero policy
(`divZeroOutputVal`). Everything stays JVM-side / codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_op(df: DataFrame, col: str, op: str, scalar: float = 1.0,
              out_col: str | None = None) -> DataFrame:
    """Unary scalar ops on one column (vectorOperation.cpp op table)."""
    x = F.col(col)
    ops = {
        "mul": x * scalar,
        "add": x + scalar,
        "log": F.when(x > 0, F.log(x)).otherwise(F.lit(0.0)),   # safe log
        "lgA": F.when(x > 0, F.log(x) / math.log(scalar)).otherwise(F.lit(0.0)),
        "log1p": F.log1p(x),
        "sqrt": F.sqrt(F.abs(x)),
        "pow": F.pow(x, scalar),
        "exp": F.pow(F.lit(scalar), x),
        "ee": F.exp(x),
        "abs": F.abs(x),
        "min": F.least(x, F.lit(scalar)),
        "max": F.greatest(x, F.lit(scalar)),
        "dBp": F.lit(10.0) * F.when(x > 0, F.log10(x)).otherwise(F.lit(0.0)),
        "dBv": F.lit(20.0) * F.when(x > 0, F.log10(x)).otherwise(F.lit(0.0)),
        # frequency-scale conversions (vectorOperation.cpp fconv_*; formulas
        # are the standard public mel/bark/octave maps)
        "fconv_mel": F.lit(1127.0) * F.log1p(x / 700.0),
        "fconv_bark": F.lit(13.0) * F.atan(F.lit(0.00076) * x)
        + F.lit(3.5) * F.atan(F.pow(x / 7500.0, 2)),
        "fconv_oct": F.when(x > 0, F.log2(x / 27.5)).otherwise(F.lit(0.0)),
        # single-output reduces (vectorOperation.cpp:130-140) applied to a
        # SCALAR column — the 1-element-vector degenerate forms (smileconf
        # compiles per-column stages, so the frame "vector" has one
        # element here): sum = x, ssm = x^2, ll1 = mean = x, ll2 = |x|.
        # Multi-column reduces live in vector_reduce (array columns).
        "sum": x,
        "ssm": x * x,
        "ll1": x,
        "ll2": F.abs(x),
    }
    return df.withColumn(out_col or f"{col}_{op}", ops[op])


def vector_reduce(df: DataFrame, array_col: str, op: str,
                  out_col: str | None = None) -> DataFrame:
    """Reduce ops over an ArrayType column (vectorOperation.cpp reduces:
    sum, ssm (sum of squares), ll1/ll2 norms, norm=L2-normalise, nr1/nr0
    range-normalise, nma max-abs-normalise) — F.aggregate/transform, no UDF."""
    arr = F.col(array_col)
    zero = F.lit(0.0)
    s = F.aggregate(arr, zero, lambda a, v: a + v)
    ssm = F.aggregate(arr, zero, lambda a, v: a + v * v)
    l1 = F.aggregate(arr, zero, lambda a, v: a + F.abs(v))
    l2 = F.sqrt(ssm)
    mx = F.array_max(arr)
    mn = F.array_min(arr)
    ops = {
        "sum": s,
        "ssm": ssm,
        "ll1": l1,
        "ll2": l2,
        "mean": s / F.size(arr),
        "norm": F.transform(arr, lambda v: F.when(l2 != 0, v / l2).otherwise(v)),
        "nr1": F.transform(arr, lambda v: F.when(mx != mn, (v - mn) / (mx - mn)).otherwise(v)),
        "nma": F.transform(arr, lambda v: F.when(F.greatest(F.abs(mx), F.abs(mn)) != 0,
                                                 v / F.greatest(F.abs(mx), F.abs(mn))).otherwise(v)),
    }
    return df.withColumn(out_col or f"{array_col}_{op}", ops[op])


def vector_binary_op(df: DataFrame, col1: str, col2: str, op: str,
                     div_zero_val: float = 0.0,
                     out_col: str | None = None) -> DataFrame:
    """Elementwise binary op of two scalar columns with div-zero policy
    (vectorBinaryOperation.cpp:36-41 `divZeroOutputVal`)."""
    a, b = F.col(col1), F.col(col2)
    ops = {
        "add": a + b,
        "sub": a - b,
        "mul": a * b,
        "div": F.when(b != 0, a / b).otherwise(F.lit(div_zero_val)),
        "pow": F.pow(a, b),
        "min": F.least(a, b),
        "max": F.greatest(a, b),
    }
    return df.withColumn(out_col or f"{col1}_{op}_{col2}", ops[op])


def mono_mixdown(df: DataFrame, cols: list[str],
                 out_col: str = "mix") -> DataFrame:
    """cMonoMixdown (/root/reference/src/dspcore/monoMixdown.cpp): average
    of channel fields."""
    expr: Column = F.col(cols[0])
    for c in cols[1:]:
        expr = expr + F.col(c)
    return df.withColumn(out_col, expr / float(len(cols)))
