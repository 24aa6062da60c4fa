"""Spark functional bank == numpy oracle, per group, allclose at every
conv_id (the parity requirement from BASELINE.json north_star), plus
kernel-path vs SQL-fast-path agreement."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensmile_spark.functionals import (
    DEFAULT_FAMILIES,
    compute_all,
    functionals_kernel,
    functionals_sql,
)
from tests.conftest import make_conv

CASES = {
    "conv_const": [5.0] * 20,
    "conv_ramp": [2.0 * i + 3 for i in range(15)],
    "conv_wave": [0, 4, 0, 4, 0, 4, 0, 4, 0, 4, 0],
    "conv_spiky": [1, 1, 1, 9, 1, 1, 1, 1, 7, 1, 1, 1],
    "conv_zeros": [0, 2, 0, 4, 0, 6, 0, 0, 3, 0],
    "conv_single": [7.0],
    "conv_rand": list(np.random.RandomState(42).rand(40) * 10),
}


@pytest.fixture(scope="module")
def case_df(spark):
    df = None
    for cid, vals in CASES.items():
        d = make_conv(spark, cid, vals)
        df = d if df is None else df.unionByName(d)
    return df.cache()


def test_kernel_matches_oracle_every_conv(spark, case_df):
    out = functionals_kernel(case_df, ["x"], ("conv_id",),
                             families=DEFAULT_FAMILIES)
    rows = {r["conv_id"]: r.asDict() for r in out.collect()}
    assert set(rows) == set(CASES)
    for cid, vals in CASES.items():
        oracle = compute_all(np.array(vals, dtype=np.float64),
                             DEFAULT_FAMILIES)
        got = rows[cid]
        assert got["n_turns"] == len(vals)
        for name, want in oracle.items():
            have = got[f"x_{name}"]
            assert np.isclose(have, want, rtol=1e-6, atol=1e-8), (
                f"{cid} x_{name}: engine={have} oracle={want}")


def test_sql_path_matches_kernel_path(spark, case_df):
    fk = functionals_kernel(case_df, ["x"], ("conv_id",),
                            families=["means", "moments", "extremes",
                                      "percentiles", "regression"])
    fs = functionals_sql(case_df, ["x"])
    shared = sorted(set(fk.columns) & set(fs.columns) - {"conv_id", "n_turns"})
    assert len(shared) >= 20
    a = {r["conv_id"]: r for r in
         fk.select("conv_id", *[F.col(f"`{c}`") for c in shared]).collect()}
    b = {r["conv_id"]: r for r in
         fs.select("conv_id", *[F.col(f"`{c}`") for c in shared]).collect()}
    for cid in CASES:
        for c in shared:
            assert np.isclose(a[cid][c], b[cid][c], rtol=1e-7, atol=1e-9), (
                f"{cid} {c}: kernel={a[cid][c]} sql={b[cid][c]}")


def test_grouping_by_session(spark):
    # two sessions within one conv -> two functional rows
    df = make_conv(spark, "s", [1.0, 2.0, 3.0, 10.0, 20.0, 30.0]) \
        .withColumn("session_id", (F.col("turn_idx") >= 3).cast("int"))
    out = functionals_kernel(df, ["x"], ("conv_id", "session_id"),
                             families=["means"])
    rows = {r["session_id"]: r["x_amean"] for r in out.collect()}
    assert rows[0] == pytest.approx(2.0)
    assert rows[1] == pytest.approx(20.0)


def test_emo_large_style_preset(spark):
    from opensmile_spark.presets import emo_large_style
    from opensmile_spark.transcripts import transcripts_from_events

    out = emo_large_style(
        transcripts_from_events(spark, "/root/testdata/sf0.001"))
    cols = out.columns
    # legacy peaks outputs present, bare-named (no peaks2 in this set)
    assert "char_len_sma3_numPeaks" in cols
    assert "char_len_sma3_peakDistStddev" in cols
    assert "char_len_sma3_de_samplepos0.5" in cols
    assert out.count() > 100
