"""Deterministic leakage-safe split assignment (sampling.assign_splits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensmile_spark.sampling import assign_splits


def _convs(spark, n=500, turns=3):
    rows = [(f"u{c}", t) for c in range(n) for t in range(turns)]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int")


def test_splits_leakage_safe_and_proportional(spark):
    df = _convs(spark)
    out = assign_splits(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    # every conversation entirely in ONE split
    per_conv = out.groupBy("conv_id").agg(
        F.countDistinct("split").alias("k")).agg(F.max("k")).first()[0]
    assert per_conv == 1
    frac = {r["split"]: r["count"] for r in
            out.groupBy("split").count().collect()}
    n = sum(frac.values())
    assert abs(frac["train"] / n - 0.8) < 0.06
    assert abs(frac["val"] / n - 0.1) < 0.04
    assert abs(frac["test"] / n - 0.1) < 0.04
    # deterministic across reruns / partitionings
    again = assign_splits(df.repartition(7),
                          {"train": 0.8, "val": 0.1, "test": 0.1})
    a_set = out.select("conv_id", "split").distinct()
    b_set = again.select("conv_id", "split").distinct()
    # both directions (ADVICE r5): one-way exceptAll would pass if the
    # repartitioned run produced EXTRA distinct rows
    assert a_set.exceptAll(b_set).count() == 0
    assert b_set.exceptAll(a_set).count() == 0


def test_splits_nested_growth_and_holdout(spark):
    df = _convs(spark, n=300, turns=1)
    a = {r["conv_id"]: r["split"] for r in
         assign_splits(df, {"train": 0.5, "val": 0.2}).collect()}
    b = {r["conv_id"]: r["split"] for r in
         assign_splits(df, {"train": 0.7, "val": 0.2}).collect()}
    # growing train only ever absorbs keys from its right neighbour:
    # nothing that was train leaves; nothing new becomes NULL
    for k, s in a.items():
        if s == "train":
            assert b[k] == "train"
    # fractions summing under 1 leave a NULL holdout
    assert any(s is None for s in a.values())
    with pytest.raises(ValueError):
        assign_splits(df, {"train": 0.9, "val": 0.2})
