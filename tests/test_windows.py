"""Window-operator parity vs a literal numpy transcription of the reference
loops (contourSmoother.cpp:84-116, deltaRegression.cpp:102-160) with
PAD_FIRST clamped boundaries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opensmile_spark.operators import delta_regression, sma, preemphasis
from tests.conftest import make_conv


def np_sma(x, win=3, no_zero=False):
    k = win // 2
    N = len(x)
    xc = lambda i: x[min(max(i, 0), N - 1)]  # noqa: E731  clamp = PAD_FIRST
    y = np.empty(N)
    for n in range(N):
        if no_zero:
            if x[n] == 0.0:
                y[n] = 0.0
                continue
            acc, cnt = x[n], 1
            for w in range(1, k + 1):
                if xc(n - w) != 0.0:
                    acc += xc(n - w)
                    cnt += 1
                if xc(n + w) != 0.0:
                    acc += xc(n + w)
                    cnt += 1
            y[n] = acc / cnt
        else:
            acc = x[n]
            for w in range(1, k + 1):
                acc += xc(n - w) + xc(n + w)
            y[n] = acc / win
    return y


def np_delta(x, dw=2):
    N = len(x)
    xc = lambda i: x[min(max(i, 0), N - 1)]  # noqa: E731
    if dw == 0:
        return np.array([x[n] - xc(n - 1) for n in range(N)])
    norm = 2.0 * sum(i * i for i in range(1, dw + 1))
    return np.array([
        sum(i * (xc(n + i) - xc(n - i)) for i in range(1, dw + 1)) / norm
        for n in range(N)
    ])


@pytest.mark.parametrize("win", [3, 5])
def test_sma_matches_reference_loop(spark, win):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = sma(make_conv(spark, "c", vals), ["x"], win)
    got = np.array([r[f"x_sma{win}"] for r in
                    df.orderBy("turn_idx").collect()])
    assert np.allclose(got, np_sma(np.array(vals), win))


def test_sma_nozero(spark):
    vals = [0.0, 2.0, 0.0, 4.0, 6.0, 0.0, 8.0]
    df = sma(make_conv(spark, "c", vals), ["x"], 3, no_zero_sma=True)
    got = np.array([r["x_sma3nz"] for r in df.orderBy("turn_idx").collect()])
    assert np.allclose(got, np_sma(np.array(vals), 3, no_zero=True))
    assert got[0] == 0.0 and got[2] == 0.0 and got[5] == 0.0


@pytest.mark.parametrize("dw", [0, 1, 2])
def test_delta_matches_reference_loop(spark, dw):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = delta_regression(make_conv(spark, "c", vals), ["x"], dw)
    got = np.array([r["x_de"] for r in df.orderBy("turn_idx").collect()])
    assert np.allclose(got, np_delta(np.array(vals), dw))


def test_delta_first_row_zero(spark):
    # deltawin=0 at n=0: x[0]-x[-1 clamped to 0] = 0
    df = delta_regression(make_conv(spark, "c", [5.0, 7.0]), ["x"], 0)
    rows = {r["turn_idx"]: r["x_de"] for r in df.collect()}
    assert rows[0] == 0.0 and rows[1] == 2.0


def test_preemphasis(spark):
    vals = [2.0, 4.0, 8.0]
    df = preemphasis(make_conv(spark, "c", vals), ["x"], k=0.5)
    got = [r["x_pe"] for r in df.orderBy("turn_idx").collect()]
    assert got == [2.0 - 0.5 * 2.0, 4.0 - 0.5 * 2.0, 8.0 - 0.5 * 4.0]


def test_multi_conv_isolation(spark):
    # smoothing must never mix conversations
    a = make_conv(spark, "a", [1.0, 1.0, 1.0])
    b = make_conv(spark, "b", [100.0, 100.0, 100.0])
    df = sma(a.unionByName(b), ["x"], 3)
    vals = {(r["conv_id"], r["turn_idx"]): r["x_sma3"] for r in df.collect()}
    assert all(v == 1.0 for k, v in vals.items() if k[0] == "a")
    assert all(v == 100.0 for k, v in vals.items() if k[0] == "b")
