"""IO wrappers: csv round trip, line ranges, lag-delayed sink, partitioned
sink."""

import os

from pyspark.sql import functions as F

from opensmile_spark.io import (
    csv_sink, csv_source, null_sink, parquet_dump, partitioned_sink,
)
from tests.conftest import make_conv


def test_csv_roundtrip_and_line_range(spark, tmp_path):
    df = make_conv(spark, "c", [1.0, 2.0, 3.0, 4.0, 5.0]).drop("ts")
    p = str(tmp_path / "csv")
    csv_sink(df.orderBy("turn_idx").coalesce(1), p)
    back = csv_source(spark, p)
    assert back.count() == 5
    ranged = csv_source(spark, p, start=1, end=3)
    assert ranged.count() == 3


def test_csv_sink_lag(spark, tmp_path):
    df = make_conv(spark, "c", [1.0, 2.0, 3.0, 4.0]).drop("ts")
    p = str(tmp_path / "lagged")
    csv_sink(df, p, lag=2)
    back = csv_source(spark, p)
    idx = sorted(int(r["turn_idx"]) for r in back.collect())
    assert idx == [0, 1]                     # trailing 2 frames withheld


def test_null_and_parquet_and_partitioned(spark, tmp_path):
    df = make_conv(spark, "a", [1.0, 2.0]).unionByName(
        make_conv(spark, "b", [3.0]))
    null_sink(df)                            # just must not raise
    pq = str(tmp_path / "pq")
    parquet_dump(df, pq)
    assert spark.read.parquet(pq).count() == 3
    ps = str(tmp_path / "parts")
    partitioned_sink(df.withColumn("session_id", F.lit(0)), ps)
    assert os.path.isdir(f"{ps}/conv_id=a/session_id=0")
