"""overlap_salt: dense-index fast path and window exactness.

(The driver gate `salted_sma_equivalence` — which since round 5 also
carries the per-conv salted_partial_stats columns — pins the
salt-and-stitch exactness against DuckDB; these tests pin the round-4
dense_index projection path against the row_number path.)
"""

from pyspark.sql import functions as F


def _conv(spark, n):
    rows = [("m", i, float((i * 7) % 13)) for i in range(n)] + \
           [("s", i, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, x double")
    return df.withColumn(
        "ts", F.timestamp_micros((F.col("turn_idx") * 1_000_000).cast("long")))


def test_dense_index_equals_row_number_path(spark):
    from opensmile_spark.operators import overlap_salt

    df = _conv(spark, 97)
    a = overlap_salt(df, max_rows=20, pre=2, post=2).orderBy(
        "conv_id", "salt_bucket", "turn_idx", "is_owner")
    b = overlap_salt(df, max_rows=20, pre=2, post=2,
                     dense_index=True).orderBy(
        "conv_id", "salt_bucket", "turn_idx", "is_owner")
    assert a.collect() == b.collect()


def test_dense_path_has_no_window(spark):
    from opensmile_spark.operators import overlap_salt

    df = _conv(spark, 50)
    plan = overlap_salt(df, max_rows=20, dense_index=True)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan
    plan_win = overlap_salt(df, max_rows=20)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" in plan_win


def test_salted_sma_equals_plain(spark):
    from opensmile_spark.operators import overlap_salt, sma

    df = _conv(spark, 97)
    plain = sma(df, ["x"], 3).select("conv_id", "turn_idx", "x_sma3")
    salted = overlap_salt(df, max_rows=20, pre=1, post=1, dense_index=True)
    stitched = (sma(salted, ["x"], 3,
                    partition_cols=("conv_id", "salt_bucket"))
                .filter(F.col("is_owner"))
                .select("conv_id", "turn_idx", "x_sma3"))
    key = ["conv_id", "turn_idx"]
    a = plain.orderBy(*key).collect()
    b = stitched.orderBy(*key).collect()
    assert a == b
