"""datagen invariants — the synthetic corpus must stay Arrow/pandas-safe.

The generator is the fixture source for every large-scale measurement
(FIXTURES.md §1); a ts outside pandas' datetime64[ns] range (~year 2262)
would crash any applyInPandas/toPandas operator on a big corpus, which is
exactly the 100 TB path.  Regression for the conv_n*86400 day-offset
overflow found at 400k convs (tools/stage_scaling.py).
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opensmile_spark.datagen import generate_transcripts


def test_ts_within_pandas_ns_range_beyond_wrap(spark):
    # 80k convs crosses the 73k-day wrap; 1 turn each keeps it cheap.
    t = generate_transcripts(spark, n_convs=80_000, turns_per_conv=1,
                             partitions=8)
    mx = t.agg(F.max("ts").alias("mx")).toPandas()["mx"].iloc[0]
    assert pd.Timestamp(mx) < pd.Timestamp.max


def test_ts_strictly_increasing_per_conv(spark):
    t = generate_transcripts(spark, n_convs=50, turns_per_conv=20,
                             partitions=4)
    bad = (
        t.withColumn(
            "prev",
            F.lag("ts").over(
                Window.partitionBy("conv_id").orderBy("turn_idx")),
        )
        .filter(F.col("prev").isNotNull() & (F.col("ts") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_deterministic_same_seed(spark):
    a = generate_transcripts(spark, n_convs=30, turns_per_conv=5,
                             partitions=2).orderBy("conv_id", "turn_idx")
    b = generate_transcripts(spark, n_convs=30, turns_per_conv=5,
                             partitions=2).orderBy("conv_id", "turn_idx")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]
