"""Closed-form validation of the functional kernels (no Spark).

The kernels are the single source of truth shared by the engine and the
oracle, so these tests pin them to independently derived values — hand
computation, numpy built-ins, and the reference formulas' degenerate cases
(FIXTURES.md cases: conv_const, conv_ramp, conv_wave, conv_single,
conv_zeros)."""

import math

import numpy as np
import pytest

from opensmile_spark.functionals.kernels import (
    compute_all,
    f_crossings,
    f_means,
    f_moments,
    f_onset,
    f_peaks2,
    f_percentiles,
    f_regression,
    f_segments,
    f_times,
)


def pre(x):
    x = np.asarray(x, dtype=np.float64)
    return x, np.sort(x), float(x.min()), float(x.max()), float(x.mean())


def test_moments_match_numpy_population():
    x, s, lo, hi, mu = pre([1, 4, 2, 8, 5, 7])
    out = f_moments(x, s, lo, hi, mu)
    assert out["variance"] == pytest.approx(np.var(x))          # population
    assert out["stddev"] == pytest.approx(np.std(x))
    d = x - mu
    assert out["skewness"] == pytest.approx(
        (d ** 3).sum() / (len(x) * np.var(x) * np.std(x)))
    assert out["kurtosis"] == pytest.approx(
        (d ** 4).sum() / (len(x) * np.var(x) ** 2))              # NOT excess
    assert out["stddevNorm"] == pytest.approx(np.std(x) / np.mean(x))


def test_moments_constant_guards():
    # conv_const: stddev=0, skew/kurt guarded to 0 (functionalMoments.cpp:116-127)
    x, s, lo, hi, mu = pre([3.0] * 20)
    out = f_moments(x, s, lo, hi, mu)
    assert out["variance"] == 0.0
    assert out["stddev"] == 0.0
    assert out["skewness"] == 0.0
    assert out["kurtosis"] == 0.0
    assert out["stddevNorm"] == 0.0


def test_moments_zero_mean_stddevnorm():
    # mean==0 -> divide by 1.0 (functionalMoments.cpp:155-158)
    x, s, lo, hi, mu = pre([-1.0, 1.0])
    out = f_moments(x, s, lo, hi, mu)
    assert out["stddevNorm"] == pytest.approx(np.std(x))


def test_percentiles_linear_interp_matches_numpy():
    x, s, lo, hi, mu = pre([10, 2, 35, 7, 19, 3, 42])
    out = f_percentiles(x, s, lo, hi, mu)
    for p, name in [(25, "quartile1"), (50, "quartile2"), (75, "quartile3"),
                    (20, "percentile20.0"), (80, "percentile80.0")]:
        assert out[name] == pytest.approx(
            np.percentile(x, p, method="linear")), name
    assert out["pctlrange0-2"] == pytest.approx(
        abs(np.percentile(x, 80) - np.percentile(x, 20)))


def test_regression_ramp_closed_form():
    # conv_ramp: x = 2i + 5 -> slope 2, offset 5, zero error
    x, s, lo, hi, mu = pre([2 * i + 5 for i in range(12)])
    out = f_regression(x, s, lo, hi, mu)
    assert out["linregc1"] == pytest.approx(2.0)
    assert out["linregc2"] == pytest.approx(5.0)
    assert out["linregerrA"] == pytest.approx(0.0, abs=1e-9)
    assert out["linregerrQ"] == pytest.approx(0.0, abs=1e-9)
    # quadratic fit of a line: a=0, b=slope, c=offset
    assert out["qregc1"] == pytest.approx(0.0, abs=1e-7)
    assert out["qregc2"] == pytest.approx(2.0)
    assert out["qregc3"] == pytest.approx(5.0)


def test_regression_matches_polyfit():
    rng = np.random.RandomState(42)
    x, s, lo, hi, mu = pre(rng.rand(50) * 10)
    out = f_regression(x, s, lo, hi, mu)
    m, t = np.polyfit(np.arange(50), x, 1)
    assert out["linregc1"] == pytest.approx(m)
    assert out["linregc2"] == pytest.approx(t)
    a, b, c = np.polyfit(np.arange(50), x, 2)
    assert out["qregc1"] == pytest.approx(a)
    assert out["qregc2"] == pytest.approx(b)
    assert out["qregc3"] == pytest.approx(c)


def test_regression_n1():
    x, s, lo, hi, mu = pre([7.0])
    out = f_regression(x, s, lo, hi, mu)
    assert out["linregc1"] == 0.0
    assert out["linregc2"] == 7.0


def test_means_with_zeros():
    # conv_zeros: nz* restricted to non-zero subset (functionalMeans.cpp)
    x, s, lo, hi, mu = pre([0, 2, 0, 4, 0, 6])
    out = f_means(x, s, lo, hi, mu)
    assert out["amean"] == pytest.approx(2.0)
    assert out["nzamean"] == pytest.approx(4.0)
    assert out["nnz"] == 3.0                      # frames norm
    assert out["nzgmean"] == pytest.approx((2 * 4 * 6) ** (1 / 3))
    assert out["flatness"] == pytest.approx(out["nzgmean"] / out["absmean"])
    assert out["rqmean"] == pytest.approx(math.sqrt(np.mean(x ** 2)))


def test_means_all_zero():
    x, s, lo, hi, mu = pre([0.0, 0.0, 0.0])
    out = f_means(x, s, lo, hi, mu)
    assert out["nzamean"] == 0.0
    assert out["nnz"] == 0.0
    assert out["flatness"] == 1.0                 # absmean==0 guard


def test_crossings_sign_changes():
    # +,-,+,-: reference counts pairs at i=1..N-2 (functionalCrossings.cpp:106)
    x, s, lo, hi, mu = pre([1, -1, 1, -1, 1])
    out = f_crossings(x, s, lo, hi, mu)
    assert out["zcr"] == pytest.approx(3 / 5)     # pairs (0,1),(1,2),(2,3)
    x, s, lo, hi, mu = pre([5, 5, 5, 5])
    assert f_crossings(x, s, lo, hi, mu)["zcr"] == 0.0


def test_times_ramp():
    # strict ramp: risetime = (N-1)/(N-1) = 1 under segment norm
    x, s, lo, hi, mu = pre(np.arange(10.0))
    out = f_times(x, s, lo, hi, mu)
    assert out["risetime"] == pytest.approx(1.0)
    assert out["falltime"] == pytest.approx(0.0)
    # downleveltime25: fraction of frames <= min + 0.25*range = 2.25 -> 3/10
    assert out["downleveltime25"] == pytest.approx(0.3)
    assert out["upleveltime90"] == pytest.approx(1 / 10)
    assert out["duration"] == 10.0


def test_onset_threshold_crossings():
    x, s, lo, hi, mu = pre([0, 0, 1, 1, 0, 1, 0])
    out = f_onset(x, s, lo, hi, mu)
    assert out["numOnsets"] == 2.0
    assert out["numOffsets"] == 2.0
    assert out["onsetPos"] == pytest.approx(2 / 7)   # segment norm
    assert out["offsetPos"] == pytest.approx(6 / 7)


def test_segments_nonx_runs():
    # runs of non-zero: [1 1 1] (len3 ok), pause [0 0], [2 2 2 2]
    x, s, lo, hi, mu = pre([1, 1, 1, 0, 0, 2, 2, 2, 2])
    out = f_segments(x, s, lo, hi, mu, segMinLng=2, pauseMinLng=2)
    # literal transcription of process_SegNonX: first segment emitted at
    # i=4 (segEnd=2): addNewSegment(4-2=2, 0) -> len 2; final flush:
    # i=9, segEnd=1 -> addNewSegment(8, 5) -> len 3
    assert out["numSegments"] == pytest.approx(2 / 20)   # segment norm /maxNumSeg
    assert out["meanSegLen"] == pytest.approx((2 + 3) / 2 / 9)
    assert out["maxSegLen"] == pytest.approx(3 / 9)
    assert out["minSegLen"] == pytest.approx(2 / 9)


def test_peaks2_triangle_wave():
    # conv_wave: clean triangle — peaks at odd indices (interior only, i>=2)
    x = np.array([0, 4, 0, 4, 0, 4, 0, 4, 0], dtype=np.float64)
    out = f_peaks2(x, np.sort(x), 0.0, 4.0, x.mean())
    # detection range i in [2, N-3]: maxima at 3, 5; minima at 2, 4, 6.
    # Hand-trace of the reference automaton: step 2b drops min@2 (rise from
    # the x[0] pseudo-extremum below absThresh=0.4); surviving list is
    # max@3, min@4, max@5, min@6.
    assert out["numPeaks"] == 2.0
    assert out["meanPeakDist"] == pytest.approx(2.0)
    assert out["peakMean"] == pytest.approx(4.0)
    # rising: x[0]->max@3 = 4/3, min@4->max@5 = 4, min@6->x[8] tail = 0
    assert out["meanRisingSlope"] == pytest.approx((4 / 3 + 4.0 + 0.0) / 3)
    # falling (positive magnitudes in mid-segments, functionalPeaks2.cpp:659):
    # max@3->min@4 = 4, max@5->min@6 = 4
    assert out["meanFallingSlope"] == pytest.approx(4.0)


def test_peaks2_constant_no_peaks():
    x = np.full(10, 3.0)
    out = f_peaks2(x, np.sort(x), 3.0, 3.0, 3.0)
    assert out["numPeaks"] == 0.0
    assert out["meanRisingSlope"] == 0.0
    assert out["meanFallingSlope"] == 0.0


def test_peaks2_monotonic_no_extrema_fallback():
    # lastIsMax == -1 branch: slope = (x[N-1]-x[0])/N
    x = np.arange(8.0)
    out = f_peaks2(x, np.sort(x), 0.0, 7.0, x.mean())
    assert out["numPeaks"] == 0.0
    assert out["meanRisingSlope"] == pytest.approx(7.0 / 8.0)


def test_compute_all_empty_and_single():
    assert compute_all(np.array([])) == {}
    out = compute_all(np.array([5.0]), families=["means", "moments",
                                                 "extremes", "percentiles",
                                                 "regression", "crossings",
                                                 "times", "onset", "segments",
                                                 "peaks2"])
    assert out["amean"] == 5.0
    assert out["stddev"] == 0.0
    assert all(np.isfinite(v) for v in out.values())


def test_acf_amdf_kernels():
    """f_acf normalized autocorrelation; f_amdf transcribes computeAMDF
    (amdf.cpp:134-151): out[j] = sum|x[i]-x[i+j]|/(N-j), out[0]=0."""
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    x = np.array([1.0, 2.0, 3.0, 2.0, 1.0, 2.0, 3.0, 2.0])
    out = compute_all(x, ["acf", "amdf"],
                      {"acf": {"max_lag": 2}, "amdf": {"max_lag": 2}})
    r0 = float((x * x).sum())
    r1 = float((x[:-1] * x[1:]).sum())
    r2 = float((x[:-2] * x[2:]).sum())
    assert np.isclose(out["acf0"], 1.0)
    assert np.isclose(out["acf1"], r1 / r0)
    assert np.isclose(out["acf2"], r2 / r0)
    assert out["amdf0"] == 0.0
    assert np.isclose(out["amdf1"], np.abs(x[:-1] - x[1:]).sum() / 7)
    assert np.isclose(out["amdf2"], np.abs(x[:-2] - x[2:]).sum() / 6)


def test_lsp_kernel_properties():
    """LSPs of a stable LPC polynomial: in (0, pi), sorted ascending, and
    for white-ish input spread across the band; P/Q roots interleave."""
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    rng = np.random.RandomState(3)
    # AR(2) signal: x[t] = 0.7 x[t-1] - 0.2 x[t-2] + e
    e = rng.randn(400)
    x = np.zeros(400)
    for t in range(2, 400):
        x[t] = 0.7 * x[t - 1] - 0.2 * x[t - 2] + e[t]
    out = compute_all(x, ["lsp"], {"lsp": {"order": 4}})
    lsps = [out[f"lsp{i}"] for i in range(4)]
    assert all(0.0 < v < np.pi for v in lsps)
    assert lsps == sorted(lsps)


def test_formants_kernel_recovers_resonance():
    """An AR(2) resonator at normalized frequency f0 must yield a first
    formant near f0 (formantLpc.cpp root->freq/bandwidth mapping)."""
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    rng = np.random.RandomState(5)
    f0 = 0.12     # cycles/frame
    r = 0.95
    a1 = 2 * r * np.cos(2 * np.pi * f0)
    a2 = -r * r
    e = rng.randn(2000)
    x = np.zeros(2000)
    for t in range(2, 2000):
        x[t] = a1 * x[t - 1] + a2 * x[t - 2] + e[t]
    out = compute_all(x, ["formants"],
                      {"formants": {"order": 4, "n_formants": 2}})
    assert abs(out["formantFreq1"] - f0) < 0.02
    assert out["formantBw1"] > 0


def test_compat_flags_oldBuggyQerr_and_buggySecNorm():
    """Reference compat flags: oldBuggyQerr emits UNnormalised quadratic
    errors (functionalRegression.cpp:405-411); buggySecNorm divides frame
    counts by T only (functionalTimes.cpp:241-243)."""
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    x = np.array([1.0, 4.0, 2.0, 8.0, 5.0, 7.0])
    new = compute_all(x, ["regression"])
    old = compute_all(x, ["regression"],
                      {"regression": {"oldBuggyQerr": True}})
    assert np.isclose(old["qregerrA"], new["qregerrA"] * x.size)
    assert np.isclose(old["qregerrQ"], new["qregerrQ"] * x.size)
    assert np.isclose(old["linregerrA"], new["linregerrA"])  # linear untouched

    T = 0.5
    good = compute_all(x, ["times"],
                       {"times": {"timeNorm": "second", "T": T}})
    bug = compute_all(x, ["times"],
                      {"times": {"timeNorm": "second", "T": T,
                                 "buggySecNorm": True}})
    # buggy Norm = N/T vs correct 1/T -> leveltimes differ by factor N
    assert np.isclose(bug["upleveltime25"] * x.size, good["upleveltime25"]) \
        or good["upleveltime25"] == 0.0
    assert np.isclose(bug["risetime"] * x.size, good["risetime"]) \
        or good["risetime"] == 0.0


def test_qreg_extras_vertex_math():
    """qregExtras: on an exact parabola the recovered vertex/endpoints must
    match analytically (x0=b/(-2a), y0=c-b^2/4a, yr=parabola(N-1))."""
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    i = np.arange(11, dtype=float)
    a, b, c = 0.5, -4.0, 10.0             # vertex at x0=4, y0=2
    x = a * i * i + b * i + c
    out = compute_all(x, ["regression"],
                      {"regression": {"qregExtras": True}})
    assert np.isclose(out["qregc1"], a) and np.isclose(out["qregc2"], b)
    assert np.isclose(out["qregx0"], 4.0)
    assert np.isclose(out["qregy0"], 2.0)
    assert np.isclose(out["qregyr"], a * 100 - 40 + 10)
    assert np.isclose(out["qregls"], (2.0 - 10.0) / 4.0)
    assert np.isclose(out["qregrs"], (out["qregyr"] - 2.0) / (10 - 4))
    # zero curvature: x0 clipped by sign rule, y0 -> 0
    out = compute_all(np.arange(8.0), ["regression"],
                      {"regression": {"qregExtras": True}})
    assert out["qregy0"] == 0.0
    assert abs(out["qregx0"]) == 8.0


def test_percentile_interp0_and_peaks2_ratio_outputs():
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    x = np.array([1.0, 2.0, 3.0, 4.0])
    # interp=0: sorted[round(p*(N-1))] — p=0.5 -> round(1.5)=2 (half away)
    out = compute_all(x, ["percentiles"],
                      {"percentiles": {"interp": False}})
    assert out["quartile2"] == 3.0
    out_i = compute_all(x, ["percentiles"])
    assert out_i["quartile2"] == 2.5
    # peaks2 ratio outputs: compat (default) emits the raw quotient; with
    # doRatioLimit the unity clamp and ratioLimit(10,10) engage
    y = np.array([0.0, 1.0, 5.0, 1.0, 0.0, 1.0, 6.0, 1.0, 0.0, 0.5, 0.1])
    raw = compute_all(y, ["peaks2"])
    lim = compute_all(y, ["peaks2"], {"peaks2": {"doRatioLimit": True}})
    assert "peakMeanMeanRatio" in raw and "minMeanMeanRatio" in raw
    assert np.isclose(raw["peakMeanMeanRatio"],
                      raw["peakMean"] / y.mean())
    assert abs(lim["peakRangeRel"]) <= 1.0
    assert abs(lim["mtmAmpMeanRel"]) <= 1.0


def test_segments_old_buggy_variant():
    """useOldBuggyChX: 3-frame running average + exact-equality threshold,
    segMinLng recomputed as N/maxNumSeg-1 (>=2) — hand-traced on a binary
    contour with long zero runs."""
    import numpy as np

    from opensmile_spark.functionals.kernels import compute_all

    # 40 frames: zeros with two bursts of ones
    x = np.zeros(40)
    x[10:14] = 1.0
    x[25:30] = 1.0
    opts = {"segments": {"algorithm": "eqX", "X": 0.0,
                         "useOldBuggyChX": True, "timeNorm": "frames"}}
    out = compute_all(x, ["segments"], opts)
    # eqX buggy: segments start when the 3-avg returns to EXACTLY 0 (i.e.
    # 3 zeros after a burst) and end when it leaves 0; both bursts create
    # detectable zero-segments between them
    assert out["numSegments"] >= 1
    assert out["meanSegLen"] > 2  # segMinLng = 40//20-1 -> min 2 enforced
    # non-buggy on the same input differs (different algorithm entirely)
    out2 = compute_all(x, ["segments"],
                       {"segments": {"algorithm": "eqX", "X": 0.0,
                                     "timeNorm": "frames"}})
    assert out["numSegments"] != out2["numSegments"] or \
        out["meanSegLen"] != out2["meanSegLen"]
