"""As-of merge + point-in-time backfill: leakage property tests
(FIXTURES.md case conv_late_anchor; north-star zero-leakage requirement)."""

import numpy as np
from pyspark.sql import functions as F

from opensmile_spark.functionals.kernels import compute_all
from opensmile_spark.operators import asof_join, backfill_functionals
from tests.conftest import make_conv


def _anchors(spark, conv_id, epochs):
    df = spark.createDataFrame(
        [(conv_id, float(e)) for e in epochs], "conv_id string, epoch double"
    )
    return df.withColumn("anchor_ts", F.timestamp_seconds("epoch")).drop("epoch")


def test_asof_basic_and_ties(spark):
    t0 = 1_704_067_200.0
    lld = make_conv(spark, "c", [10.0, 20.0, 30.0], gap_s=10.0)  # ts at 0,10,20
    anchors = _anchors(spark, "c", [t0 - 5, t0, t0 + 15, t0 + 100])
    out = asof_join(anchors, lld.select("conv_id", "ts", "x"),
                    value_cols=["x"])
    vals = {r["anchor_ts"].timestamp() - t0: r["x"] for r in out.collect()}
    assert vals[-5.0] is None          # before all turns
    assert vals[0.0] == 10.0           # tie: turn AT anchor is visible
    assert vals[15.0] == 20.0
    assert vals[100.0] == 30.0


def test_asof_strict(spark):
    t0 = 1_704_067_200.0
    lld = make_conv(spark, "c", [10.0, 20.0], gap_s=10.0)
    anchors = _anchors(spark, "c", [t0, t0 + 10])
    out = asof_join(anchors, lld.select("conv_id", "ts", "x"),
                    value_cols=["x"], strict=True)
    vals = {r["anchor_ts"].timestamp() - t0: r["x"] for r in out.collect()}
    assert vals[0.0] is None           # strict: tie NOT visible
    assert vals[10.0] == 10.0


def test_backfill_leakage_property(spark):
    """Perturbing any row with ts > anchor never changes anchor features."""
    t0 = 1_704_067_200.0
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    lld = make_conv(spark, "c", vals, gap_s=10.0)
    anchors = _anchors(spark, "c", [t0 + 25])   # sees turns 0,1,2
    base = backfill_functionals(lld, anchors, ["x"], families=["means",
                                                               "moments"])
    b = base.collect()[0]
    assert b["n_visible"] == 3
    expected = compute_all(np.array(vals[:3]), ["means", "moments"])
    assert abs(b["x_amean"] - expected["amean"]) < 1e-12
    assert abs(b["x_stddev"] - expected["stddev"]) < 1e-12

    # perturb the future
    lld2 = lld.withColumn(
        "x", F.when(F.col("turn_idx") >= 3, F.col("x") * 999 + 1).otherwise(F.col("x"))
    )
    p = backfill_functionals(lld2, anchors, ["x"],
                             families=["means", "moments"]).collect()[0]
    assert p["x_amean"] == b["x_amean"]
    assert p["x_stddev"] == b["x_stddev"]


def test_backfill_empty_window_and_grid_completeness(spark):
    t0 = 1_704_067_200.0
    lld = make_conv(spark, "c", [1.0, 2.0], gap_s=10.0)
    anchors = _anchors(spark, "c", [t0 - 100, t0 + 5, t0 + 1000])
    out = backfill_functionals(lld, anchors, ["x"], families=["means"])
    rows = {r["anchor_ts"].timestamp() - t0: r for r in out.collect()}
    assert len(rows) == 3                      # grid complete
    assert rows[-100.0]["n_visible"] == 0
    assert rows[-100.0]["x_amean"] is None or np.isnan(rows[-100.0]["x_amean"])
    assert rows[5.0]["n_visible"] == 1
    assert rows[1000.0]["n_visible"] == 2


def test_backfill_bounded_trailing_window(spark):
    t0 = 1_704_067_200.0
    lld = make_conv(spark, "c", [1.0, 2.0, 4.0, 8.0], gap_s=10.0)
    anchors = _anchors(spark, "c", [t0 + 30])
    out = backfill_functionals(lld, anchors, ["x"], families=["means"],
                               window_seconds=15.0)
    r = out.collect()[0]
    # window (anchor-15, anchor]: turns at t0+20, t0+30
    assert r["n_visible"] == 2
    assert r["x_amean"] == 6.0


def test_backfill_regression_split_routing(spark):
    """families=['regression'] on an unbounded grid: coefficient/errQ/
    centroid keys come from the O(N+A) prefix path, the two |residual|
    means from the gather — every output must equal the per-window kernel,
    including the N=1 and N=2 guard windows."""
    t0 = 1_704_067_200.0
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    lld = make_conv(spark, "c", vals, gap_s=10.0)
    anchors = _anchors(spark, "c", [t0 + 10.0 * j for j in range(len(vals))])
    out = backfill_functionals(lld, anchors, ["x"], families=["regression"])
    rows = sorted(out.collect(), key=lambda r: r["anchor_ts"])
    for j, r in enumerate(rows):
        assert r["n_visible"] == j + 1
        want = compute_all(np.array(vals[: j + 1]), ["regression"])
        for k, v in want.items():
            assert np.isclose(r[f"x_{k}"], v, rtol=1e-9, atol=1e-12), \
                (j, k, r[f"x_{k}"], v)


def test_asof_multi_conv_no_crosstalk(spark):
    t0 = 1_704_067_200.0
    a = make_conv(spark, "a", [1.0])
    b = make_conv(spark, "b", [2.0])
    lld = a.unionByName(b)
    anchors = _anchors(spark, "a", [t0 + 1]).unionByName(
        _anchors(spark, "b", [t0 + 1]))
    out = asof_join(anchors, lld.select("conv_id", "ts", "x"),
                    value_cols=["x"])
    vals = {r["conv_id"]: r["x"] for r in out.collect()}
    assert vals == {"a": 1.0, "b": 2.0}


def test_incremental_backfill_equals_full(spark):
    """Incremental refresh == full recompute bit-for-bit: run on day-1
    data, append turns to ONE conversation, refresh incrementally, and
    compare against a from-scratch backfill of the day-2 corpus. Also
    pins that untouched convs' rows are literally carried (not
    recomputed): their features survive even if the carried table was
    perturbed out-of-band."""
    from pyspark.sql import functions as F

    from opensmile_spark.operators.asof import (backfill_functionals,
                                                incremental_backfill)
    from tests.conftest import make_conv

    day1 = make_conv(spark, "a", [1, 2, 3, 4]).unionByName(
        make_conv(spark, "b", [10, 20, 30]))
    day1 = day1.withColumnRenamed("x", "char_len")

    def grid(df):
        return df.select("conv_id", F.col("ts").alias("anchor_ts"))

    # the contract: prev_features / prev_max_ts are WRITTEN by the last
    # run and read back (parquet round-trip breaks the lineage the same
    # way a real feature store does)
    import tempfile

    d = tempfile.mkdtemp(prefix="incbf_")
    backfill_functionals(day1, grid(day1), ["char_len"],
                         families=["means", "moments"]) \
        .write.mode("overwrite").parquet(f"{d}/feats")
    day1.groupBy("conv_id").agg(F.max("ts").alias("max_ts")) \
        .write.mode("overwrite").parquet(f"{d}/max")
    feats1 = spark.read.parquet(f"{d}/feats")
    max1 = spark.read.parquet(f"{d}/max")

    # day 2: conv "a" gains two turns; conv "b" untouched
    extra = make_conv(spark, "a", [1, 2, 3, 4, 5, 6]) \
        .withColumnRenamed("x", "char_len").filter(F.col("turn_idx") >= 4)
    day2 = day1.unionByName(extra)

    inc, max2 = incremental_backfill(
        feats1, max1, day2, grid(day2), ["char_len"],
        families=["means", "moments"])
    full = backfill_functionals(day2, grid(day2), ["char_len"],
                                families=["means", "moments"])

    key = ["conv_id", "anchor_ts"]
    a = inc.toPandas().sort_values(key).reset_index(drop=True)
    b = full.toPandas().sort_values(key).reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    for c in sorted(a.columns):
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            import numpy as np
            assert np.allclose(av, bv, equal_nan=True), c
        else:
            assert (av == bv).all(), c

    # watermark advanced only for the stale conv
    m = {r["conv_id"]: r["max_ts"] for r in max2.collect()}
    m1 = {r["conv_id"]: r["max_ts"] for r in max1.collect()}
    assert m["a"] > m1["a"] and m["b"] == m1["b"]


def test_incremental_backfill_detects_deletion(spark):
    """A corrected/deleted row that does NOT move max(ts) must still mark
    the conv stale: the watermark is a (max_ts, n_rows) pair, and the
    count catches row-set changes a max-only watermark misses."""
    from pyspark.sql import functions as F

    from opensmile_spark.operators.asof import (backfill_functionals,
                                                incremental_backfill)
    from tests.conftest import make_conv

    day1 = make_conv(spark, "a", [1, 2, 3, 4]).unionByName(
        make_conv(spark, "b", [10, 20, 30]))
    day1 = day1.withColumnRenamed("x", "char_len")

    def grid(df):
        return df.select("conv_id", F.col("ts").alias("anchor_ts"))

    import tempfile

    d = tempfile.mkdtemp(prefix="incbf_del_")
    backfill_functionals(day1, grid(day1), ["char_len"],
                         families=["means"]) \
        .write.mode("overwrite").parquet(f"{d}/feats")
    # the count-bearing watermark incremental_backfill itself emits
    day1.groupBy("conv_id").agg(F.max("ts").alias("max_ts"),
                                F.count(F.lit(1)).alias("n_rows")) \
        .write.mode("overwrite").parquet(f"{d}/max")
    feats1 = spark.read.parquet(f"{d}/feats")
    max1 = spark.read.parquet(f"{d}/max")

    # day 2: conv "a" loses its SECOND turn (max ts unchanged)
    day2 = day1.filter(~((F.col("conv_id") == "a")
                         & (F.col("turn_idx") == 1)))

    inc, max2 = incremental_backfill(
        feats1, max1, day2, grid(day2), ["char_len"], families=["means"])
    full = backfill_functionals(day2, grid(day2), ["char_len"],
                                families=["means"])

    key = ["conv_id", "anchor_ts"]
    a = inc.toPandas().sort_values(key).reset_index(drop=True)
    b = full.toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    import numpy as np
    for c in sorted(a.columns):
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.allclose(av, bv, equal_nan=True), c
        else:
            assert (av == bv).all(), c
    n2 = {r["conv_id"]: r["n_rows"] for r in max2.collect()}
    assert n2 == {"a": 3, "b": 3}
