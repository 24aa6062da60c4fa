"""Uniform-grid resample (cSmileResample/cSpecResample analogue)."""

import pytest
from pyspark.sql import functions as F


def _series(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, sec double, x double")
    return df.withColumn(
        "ts", F.timestamp_micros((F.col("sec") * 1e6).cast("long"))
    ).drop("sec")


def _collect(out):
    return [(r.conv_id, r.ts.timestamp(), r.n_seen, r.x)
            for r in out.orderBy("conv_id", "ts").collect()]


def test_policies(spark):
    from opensmile_spark.operators import resample

    df = _series(spark, [("a", 0, 0.0, 10.0), ("a", 1, 2.5, 20.0),
                         ("a", 2, 7.5, 40.0)])
    hold = _collect(resample(df, 2.5, policy="hold", value_cols=["x"]))
    assert hold == [("a", 0.0, 1, 10.0), ("a", 2.5, 2, 20.0),
                    ("a", 5.0, 2, 20.0), ("a", 7.5, 3, 40.0)]
    lin = _collect(resample(df, 2.5, policy="linear", value_cols=["x"]))
    assert lin[2] == ("a", 5.0, 2, 30.0)          # midpoint of 20 -> 40
    near = _collect(resample(df, 2.5, policy="nearest", value_cols=["x"]))
    assert near[2] == ("a", 5.0, 2, 20.0)         # tie -> earlier sample


def test_equal_ts_highest_order_wins(spark):
    from opensmile_spark.operators import resample

    df = _series(spark, [("b", 0, 1.0, 5.0), ("b", 1, 1.0, 7.0)])
    out = _collect(resample(df, 2.0, policy="hold", value_cols=["x"]))
    assert out == [("b", 1.0, 2, 7.0)]


def test_global_origin_alignment(spark):
    from opensmile_spark.operators import resample

    # min ts 3.0 with origin 0, period 2 -> grid starts at 4.0 (first
    # lattice point >= min), aligned across conversations
    df = _series(spark, [("a", 0, 3.0, 1.0), ("a", 1, 9.0, 7.0),
                         ("c", 0, 5.0, 2.0), ("c", 1, 8.5, 9.0)])
    out = _collect(resample(df, 2.0, policy="linear", value_cols=["x"],
                            origin_epoch=0.0))
    assert [t for c, t, n, v in out if c == "a"] == [4.0, 6.0, 8.0]
    assert [t for c, t, n, v in out if c == "c"] == [6.0, 8.0]
    # interpolation checks on the aligned grid
    a_vals = {t: v for c, t, n, v in out if c == "a"}
    assert a_vals[4.0] == pytest.approx(2.0)
    assert a_vals[6.0] == pytest.approx(4.0)


def test_null_values_interpolate_across(spark):
    from opensmile_spark.operators import resample

    # the middle sample has a NULL x: linear must bridge 0 -> 10 across it
    df = spark.createDataFrame(
        [("a", 0, 0.0, 0.0), ("a", 1, 5.0, None), ("a", 2, 10.0, 10.0)],
        "conv_id string, turn_idx int, sec double, x double",
    ).withColumn("ts", F.timestamp_micros(
        (F.col("sec") * 1e6).cast("long"))).drop("sec")
    out = _collect(resample(df, 5.0, policy="linear", value_cols=["x"]))
    assert [v for _, _, _, v in out] == [0.0, 5.0, 10.0]


def test_array_column_spectra(spark):
    """cSpecResample case: array<double> value columns interpolate
    element-wise under linear and are picked whole under hold."""
    from opensmile_spark.operators import resample

    rows = [("a", 0, 0.0, [0.0, 100.0]), ("a", 1, 10.0, [10.0, 0.0])]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, sec double, spec array<double>"
    ).withColumn("ts", F.timestamp_micros(
        (F.col("sec") * 1e6).cast("long"))).drop("sec")

    lin = resample(df, 5.0, policy="linear", value_cols=["spec"]) \
        .orderBy("ts").collect()
    assert [r.spec for r in lin] == [[0.0, 100.0], [5.0, 50.0],
                                     [10.0, 0.0]]
    hold = resample(df, 5.0, policy="hold", value_cols=["spec"]) \
        .orderBy("ts").collect()
    assert [r.spec for r in hold] == [[0.0, 100.0], [0.0, 100.0],
                                      [10.0, 0.0]]


def test_rejects_bad_args(spark):
    from opensmile_spark.operators import resample

    df = _series(spark, [("a", 0, 0.0, 1.0)])
    with pytest.raises(ValueError):
        resample(df, 0.0)
    with pytest.raises(ValueError):
        resample(df, 1.0, policy="sinc")


def test_single_exchange_plan(spark):
    """The window pass must reuse ONE partition exchange on the key; no
    join node may appear (grid + data resolve via union & windows)."""
    from opensmile_spark.operators import resample

    df = _series(spark, [("a", i, float(i), float(i)) for i in range(10)])
    plan = resample(df, 2.0, value_cols=["x"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
