"""Cross-group batched path == per-group reference path, bitwise-close."""

import numpy as np
import pytest

from opensmile_spark.functionals.batched import BATCHED_FAMILIES, compute_batched
from opensmile_spark.functionals.kernels import compute_all

FAMS = sorted(BATCHED_FAMILIES)


def make_groups(rng, n_groups=40):
    sizes = rng.randint(1, 60, n_groups)
    # force edge sizes
    sizes[0] = 1
    sizes[1] = 2
    sizes[2] = 3
    chunks = []
    kind = rng.randint(0, 4, n_groups)
    for i, sz in enumerate(sizes):
        if kind[i] == 0:
            chunks.append(np.full(sz, float(rng.randint(-3, 4))))   # const
        elif kind[i] == 1:
            chunks.append(np.arange(sz, dtype=float) * rng.rand())  # ramp
        elif kind[i] == 2:
            c = rng.randn(sz) * 10
            c[rng.rand(sz) < 0.4] = 0.0                             # zeros
            chunks.append(c)
        else:
            chunks.append(rng.rand(sz) * 1e5 + 1e7)  # large-mean (cancellation)
    x = np.concatenate(chunks)
    ends = np.cumsum(sizes)
    starts = ends - sizes
    return x, starts.astype(np.int64), ends.astype(np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_equals_pergroup(seed):
    rng = np.random.RandomState(seed)
    x, starts, ends = make_groups(rng)
    bat = compute_batched(x, starts, ends, FAMS)
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = compute_all(x[s:e], FAMS)
        for k, v in want.items():
            got = float(bat[k][gi])
            # reduceat accumulates sequentially, ndarray.sum pairwise —
            # identical math, summation order differs; the quadratic normal
            # equations amplify that to ~1e-11 relative on ill-conditioned
            # (large-mean) groups. Gates round to 6 significant digits.
            assert np.isclose(got, v, rtol=1e-8, atol=1e-10), (
                f"group {gi} (n={e - s}) {k}: batched={got} pergroup={v}")


def test_bank_uses_batched_and_matches(spark):
    """End-to-end: the Spark kernel (now batched inside) still equals the
    numpy oracle per group — rerun of the core parity contract."""
    from opensmile_spark.functionals import functionals_kernel
    from tests.conftest import make_conv

    cases = {
        "a": [5.0] * 7,
        "b": [2.0 * i + 3 for i in range(9)],
        "c": [0, 2, 0, 4, 0, 6, 1],
        "d": [7.0],
    }
    df = None
    for cid, vals in cases.items():
        d = make_conv(spark, cid, vals)
        df = d if df is None else df.unionByName(d)
    fams = FAMS + ["peaks2", "segments", "onset"]   # mixed batched + loop
    out = {r["conv_id"]: r for r in
           functionals_kernel(df, ["x"], ("conv_id",),
                              families=fams).collect()}
    for cid, vals in cases.items():
        want = compute_all(np.array(vals, dtype=float), fams)
        for k, v in want.items():
            assert np.isclose(out[cid][f"x_{k}"], v, rtol=1e-9,
                              atol=1e-10), (cid, k)


@pytest.mark.parametrize("seed", [0, 1])
def test_batched_custom_options_stay_fast_and_match(seed):
    """eGeMAPS-style custom percentiles (+quotients) must NOT evict the
    family from the reduceat path, and must equal the per-group kernel."""
    rng = np.random.RandomState(seed)
    x, starts, ends = make_groups(rng)
    opts = {"percentiles": {"percentiles": (0.10, 0.50, 0.90),
                            "pctlranges": ((0, 2), (0, 1)),
                            "pctlquotients": ((0, 1), (2, 0))},
            "means": {"timeNorm": "segment"},
            "times": {"timeNorm": "frames"}}
    fams = ["means", "percentiles", "times"]
    bat = compute_batched(x, starts, ends, fams, opts)
    assert "pctlquotient0-1" in bat and "pctlquotient2-0" in bat
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = compute_all(x[s:e], fams, opts)
        for k, v in want.items():
            assert np.isclose(float(bat[k][gi]), v, rtol=1e-9,
                              atol=1e-12), (gi, k)


def test_bank_keeps_family_batched_with_supported_options(spark):
    """The eviction gate consults BATCHED_SUPPORTED_OPTIONS: supported
    options keep the family on the fast path; unsupported ones fall back
    (and still match the kernel either way)."""
    from opensmile_spark.functionals import functionals_kernel
    from tests.conftest import make_conv

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = make_conv(spark, "a", vals)
    opts = {"percentiles": {"percentiles": (0.10, 0.50, 0.90),
                            "pctlquotients": ((0, 1),)}}
    row = functionals_kernel(df, ["x"], ("conv_id",),
                             families=["percentiles"],
                             options=opts).collect()[0]
    want = compute_all(np.array(vals), ["percentiles"], opts)
    for k, v in want.items():
        assert np.isclose(row[f"x_{k}"], v), k


def test_batched_rejects_empty_groups():
    with pytest.raises(ValueError):
        compute_batched(np.arange(4.0), np.array([0, 2]), np.array([2, 2]),
                        ["means"])


def test_legacy_peaks_family():
    """f_peaks (functionalPeaks.cpp hysteresis automaton): hand-traced
    sequences + quirk pins (empty dist list -> meanPeakDist = N+1;
    lastMin/lastMax init 0)."""
    from opensmile_spark.functionals.kernels import compute_all as ca

    # no peaks at all (monotone): nPeaks=0, meanPeakDist = N+1
    x = np.arange(10.0)
    out = ca(x, ["peaks"])
    assert out["numPeaks"] == 0.0
    assert out["meanPeakDist"] == 11.0
    assert out["peakMean"] == 0.0
    assert out["peakMeanMeanDist"] == -x.mean()
    # QUIRK pin: lastMax is set to in[i] (the value AFTER the local max,
    # functionalPeaks.cpp:139), so a sharp peak dropping straight to ~0
    # never arms the 0.11*range hysteresis -> zero peaks
    x = np.array([0.0, 2.0, 10.0, 1.0, 0.5, 0.2, 0.1, 0.0])
    out = ca(x, ["peaks"])
    assert out["numPeaks"] == 0.0
    # a shoulder peak (high value after the max) arms and fires on the drop:
    # max at i=3 (lastVal=10 > 9), lastMax=in[3]=9, fires at in[4]=1 < 8.1
    x = np.array([0.0, 5.0, 10.0, 9.0, 1.0, 0.0])
    out = ca(x, ["peaks"])
    assert out["numPeaks"] == 1.0
    assert out["peakMean"] == 9.0
    assert out["meanPeakDist"] == 7.0  # no dist pairs -> N+1
    # two such peaks -> one distance (8-3=5), stddev 0
    x = np.array([0.0, 5.0, 10.0, 9.0, 1.0, 0.0, 5.0, 10.0, 9.0, 1.0, 0.0])
    out = ca(x, ["peaks"])
    assert out["numPeaks"] == 2.0
    assert out["peakMean"] == 9.0
    assert out["meanPeakDist"] == 5.0
    assert out["peakDistStddev"] == 0.0


def test_samples_truncation_indexing():
    """(int)((N-1)*p) truncates (functionalSamples.cpp:107) — e.g. N=3,
    p=0.25 -> idx 0 (round would give 1 at p=0.5... pin several)."""
    from opensmile_spark.functionals.kernels import compute_all as ca

    x = np.array([10.0, 20.0, 30.0])
    out = ca(x, ["samples"])
    assert out["samplepos0.25"] == 10.0   # int(2*0.25)=0, round() would be 0
    assert out["samplepos0.5"] == 20.0    # int(1.0)=1
    x = np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0])
    out = ca(x, ["samples"])
    assert out["samplepos0.5"] == 30.0    # int(5*0.5)=int(2.5)=2 (NOT 3)
    assert out["samplepos0.75"] == 40.0   # int(3.75)=3
    assert out["samplepos1"] == 60.0


def test_pctlquotient_numerator_guard():
    """pctlquotient guards on the NUMERATOR only (functionalPercentiles.cpp:
    403-410) and ratio-limits the quotient (50, 100)."""
    from opensmile_spark.functionals.kernels import compute_all as ca

    opts = {"percentiles": {"percentiles": (0.0, 1.0),
                            "pctlranges": ((0, 1),),
                            "pctlquotients": ((1, 0), (0, 1))}}
    # x in [0, 5]: p0=0, p1=5 -> quotient p1/p0 = 5/0 -> inf -> ratioLimit
    # caps at limit1+excess=150; p0/p1 = 0 -> numerator guard -> 0
    x = np.array([0.0, 1.0, 2.0, 5.0])
    out = ca(x, ["percentiles"], opts)
    assert out["pctlquotient0-1"] == 0.0
    assert abs(out["pctlquotient1-0"] - 150.0) < 1e-9
    # in-range quotient passes through linearly
    x = np.array([2.0, 4.0])
    out = ca(x, ["percentiles"], opts)
    assert np.isclose(out["pctlquotient1-0"], 2.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_expanding_equals_pergroup(seed):
    """Prefix-scan expanding path == per-window kernel for means/extremes,
    including ties (first-occurrence argmax/argmin) and all-zero prefixes."""
    from opensmile_spark.functionals.batched import compute_expanding

    rng = np.random.RandomState(seed)
    x = np.concatenate([
        rng.randn(50) * 10,
        np.zeros(5),
        np.array([3.0, 3.0, -3.0, -3.0]),     # ties for extrema positions
        rng.rand(40) * 1e5,
    ])
    his = np.unique(rng.randint(1, x.size + 1, 60))
    ex = compute_expanding(x, his, ["means", "extremes"])
    for gi, h in enumerate(his):
        want = compute_all(x[:h], ["means", "extremes"])
        for k, v in want.items():
            got = float(ex[k][gi])
            assert np.isclose(got, v, rtol=1e-9, atol=1e-12), (h, k, got, v)


def test_expanding_deep_blocks_mega_conversation():
    """The blocked-Chan cumulation across ~80 blocks (a 20k-turn mega
    conversation with epoch-scale drift) must stay pinned to the per-window
    kernel at sampled prefixes — the regime where per-block float error
    could accumulate if the merge were unstable."""
    from opensmile_spark.functionals.batched import (
        EXPANDING_UNSUPPORTED_KEYS, compute_expanding)

    rng = np.random.RandomState(11)
    n = 20_000
    x = 1.6e9 + np.cumsum(rng.randn(n) * 3.0) + 40.0 * rng.rand(n)
    his = np.unique(np.concatenate([
        np.array([1, 2, 3, 255, 256, 257, 512, 513]),
        rng.randint(1, n + 1, 20), np.array([n])]))
    fams = ["means", "extremes", "moments", "percentiles",
            "regression"]
    ex = compute_expanding(x, his, fams)
    scale = float(np.abs(x).max())
    # errQ floor: both engines' residual passes carry eps*scale error per
    # element, whose cross term with the O(spread) residuals bounds the
    # divergence — NOT eps*scale^2 (that would be vacuous at epoch scale)
    spread = max(float(x.max() - x.min()), 1.0)
    eq_atol = 256 * np.finfo(float).eps * scale * spread
    for gi, h in enumerate(his):
        want = compute_all(x[:h], fams)
        for k, v in want.items():
            if k in EXPANDING_UNSUPPORTED_KEYS:
                continue
            if k in ("stddevNorm", "coeffOfVariation", "centroid"):
                # reference formula divides by the mean/sum WHEN nonzero — a
                # discontinuity any summation-order difference can flip when
                # the mean cancels to ~ulp scale; exclude that knife edge
                sabs = float(np.abs(x[:h]).sum())
                if abs(float(np.sum(x[:h]))) < 1e-12 * max(sabs, 1e-300):
                    continue
            got = float(ex[k][gi])
            atol = eq_atol if k.endswith("errQ") else 1e-8 * scale
            assert np.isclose(got, v, rtol=1e-7, atol=atol), (h, k, got, v)


@pytest.mark.parametrize("case", ["randn", "epoch_offset", "constant",
                                  "linear", "quadratic", "drift"])
def test_expanding_moments_regression_equals_pergroup(case):
    """Blocked-Chan expanding path == per-window kernel for moments and
    regression (all keys except the gather-routed |residual| means),
    including the classic killers of raw-moment expansion: epoch-scale
    offsets, constant prefixes, exactly-(anti)fitting contours, and slow
    drift. Spans several Chan blocks (N > 3*B) and pins N=1/N=2 guards."""
    from opensmile_spark.functionals.batched import (
        EXPANDING_UNSUPPORTED_KEYS, compute_expanding)

    rng = np.random.RandomState(7)
    n = 900                                    # > 3 blocks of 256
    i = np.arange(n, dtype=np.float64)
    x = {
        "randn": rng.randn(n) * 10,
        # 1.7e9-scale mean, unit variance: raw expansion loses ~all digits
        "epoch_offset": 1.7e9 + rng.randn(n),
        "constant": np.full(n, 123.25),
        "linear": 3.0 * i - 40.0,              # linreg residuals exactly 0
        "quadratic": 0.5 * i * i - 2.0 * i + 7.0,   # qreg residuals 0
        "drift": 1e4 + np.cumsum(rng.randn(n)),
    }[case]
    his = np.unique(np.concatenate([
        np.array([1, 2, 3, 4]), rng.randint(1, n + 1, 50), np.array([n])]))
    fams = ["moments", "percentiles", "regression"]
    ex = compute_expanding(x, his, fams)
    for gi, h in enumerate(his):
        want = compute_all(x[:h], fams)
        scale = max(abs(float(x[:h].max())), abs(float(x[:h].min())), 1.0)
        spread = max(float(x[:h].max() - x[:h].min()), 1.0)
        for k, v in want.items():
            if k in EXPANDING_UNSUPPORTED_KEYS:
                assert k not in ex
                continue
            if k in ("stddevNorm", "coeffOfVariation", "centroid"):
                # reference formula divides by the mean/sum WHEN nonzero — a
                # discontinuity any summation-order difference can flip when
                # the mean cancels to ~ulp scale; exclude that knife edge
                sabs = float(np.abs(x[:h]).sum())
                if abs(float(np.sum(x[:h]))) < 1e-12 * max(sabs, 1e-300):
                    continue
            got = float(ex[k][gi])
            # errQ keys compare the LS-optimum SSE against the kernel's
            # residual pass: both carry eps*scale per-element error whose
            # cross term with O(spread) residuals bounds the divergence
            atol = 256 * np.finfo(float).eps * scale * spread \
                if k.endswith("errQ") else 1e-9 * scale
            assert np.isclose(got, v, rtol=1e-8, atol=atol), \
                (case, h, k, got, v)


@pytest.mark.parametrize("opts", [
    {"timeNorm": "second", "T": 0.25},
    {"timeNorm": "segment"},
    {"relThresh": 0.02},                      # near-zero: many extrema live
    {"relThresh": 0.45},                      # high: most extrema culled
    {"dynRelThresh": True, "relThresh": 0.1},
    {"absThreshIn": 1.5},
    {"doRatioLimit": True},
    {"dynRelThresh": True, "relThresh": 0.3, "doRatioLimit": True,
     "timeNorm": "second", "T": 0.1},
])
def test_peaks2_batched_option_sweep(opts):
    """peaks2 claims batched support under EVERY option combination
    (BATCHED_SUPPORTED_OPTIONS) — sweep each branch of the automaton's
    thresholding (static/dynamic/absolute), ratio limiting, and time
    normalization against the per-group kernel, on series dense in local
    extrema (the regime where pass-2a/2b/3 culling decisions diverge
    fastest if any lane-parallel branch is wrong)."""
    rng = np.random.RandomState(42)
    chunks, sizes = [], []
    for gi in range(50):
        n = rng.randint(1, 80)
        kind = gi % 4
        if kind == 0:
            arr = np.sin(np.arange(n) * 1.1) * 5 + rng.randn(n)  # oscillating
        elif kind == 1:
            arr = rng.randn(n) * 0.01 + 3.0        # tiny range (thresh edge)
        elif kind == 2:
            arr = np.zeros(n)                      # constant -> range 0
        else:
            arr = rng.randn(n) * 10
            arr[rng.rand(n) < 0.3] = 0.0           # plateaus break extrema
        chunks.append(arr.astype(float))
        sizes.append(n)
    x = np.concatenate(chunks)
    ends = np.cumsum(sizes).astype(np.int64)
    starts = ends - np.array(sizes, dtype=np.int64)
    bat = compute_batched(x, starts, ends, ["peaks2"], {"peaks2": opts})
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = compute_all(x[s:e], ["peaks2"], {"peaks2": opts})
        for k, v in want.items():
            got = float(bat[k][gi])
            assert np.isclose(got, v, rtol=1e-10, atol=1e-12), (
                f"group {gi} (n={e - s}) opts={opts} {k}: "
                f"batched={got} pergroup={v}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_segments_onset_automaton_reduction(seed):
    """Adversarial pin for the round-4 run-length reductions of the
    segments and onset automatons: sparse/zero-heavy series whose gap and
    run lengths cluster AROUND the thresholds (pauseMinLng=2, segMinLng=3),
    where any off-by-one in the cluster algebra flips a segment."""
    rng = np.random.RandomState(seed)
    chunks, sizes = [], []
    for _ in range(60):
        n = rng.randint(1, 40)
        # alternating runs of matches/zeros with lengths 1..4 (straddling
        # both thresholds), occasionally negative values (still matches)
        parts, is_match = [], rng.rand() < 0.5
        while sum(len(p) for p in parts) < n:
            ln = rng.randint(1, 5)
            parts.append((rng.randn(ln) + 2.0) * (1 if is_match else 0.0)
                         if is_match else np.zeros(ln))
            is_match = not is_match
        arr = np.concatenate(parts)[:n]
        # sprinkle sign flips so onset rising/falling edges differ from
        # segment match edges
        flip = rng.rand(n) < 0.2
        arr = np.where(flip, -arr, arr)
        chunks.append(arr)
        sizes.append(n)
    x = np.concatenate(chunks)
    ends = np.cumsum(sizes).astype(np.int64)
    starts = ends - np.array(sizes, dtype=np.int64)
    bat = compute_batched(x, starts, ends, ["segments", "onset"])
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = compute_all(x[s:e], ["segments", "onset"])
        for k, v in want.items():
            got = float(bat[k][gi])
            assert np.isclose(got, v, rtol=1e-12, atol=1e-12), (
                f"group {gi} (n={e - s}) {k}: batched={got} pergroup={v} "
                f"series={x[s:e].tolist()}")


@pytest.mark.parametrize("kind", ["walk", "plateau", "const", "zeros",
                                  "tiny", "spiky"])
def test_lag_and_spectral_families_match_kernels(kind):
    """Round-4d batched families (lpc/acf/amdf via masked lag sums,
    modulation via one batched rfft) against the per-group kernels, over
    shape-adversarial inputs: plateaus (ties), constants (rng=0, r0!=0),
    all-zeros (r0==0 early-exit), 1-4 element groups (N <= order / N <=
    lag), and heavy-tailed spikes."""
    rng = np.random.RandomState(hash(kind) % 2**31)
    fams = ["lpc", "acf", "amdf", "modulation"]
    xs, sizes = [], []
    for _ in range(50):
        n = rng.randint(1, 5) if kind == "tiny" else rng.randint(1, 120)
        v = rng.randn(n)
        if kind == "walk":
            v = np.cumsum(v)
        elif kind == "plateau":
            v = np.round(v * 2) / 2.0
        elif kind == "const":
            v = np.full(n, float(rng.randint(-2, 3)))
        elif kind == "zeros":
            v = np.zeros(n)
        elif kind == "spiky":
            v[rng.rand(n) < 0.3] *= 50
        xs.append(v)
        sizes.append(n)
    x = np.concatenate(xs)
    ends = np.cumsum(sizes).astype(np.int64)
    starts = ends - np.array(sizes, dtype=np.int64)
    bat = compute_batched(x, starts, ends, fams, {})
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = compute_all(x[s:e], fams, {})
        for k, v in want.items():
            got = float(bat[k][gi])
            assert np.isclose(got, v, rtol=1e-9, atol=1e-12), (
                f"group {gi} (n={e - s}) kind={kind} {k}: "
                f"batched={got} pergroup={v}")


@pytest.mark.parametrize("fams,opts", [
    (["lpc"], {"lpc": {"order": 8}}),
    (["lpc"], {"lpc": {"order": 1}}),
    (["acf"], {"acf": {"max_lag": 7, "normalize": False}}),
    (["amdf"], {"amdf": {"max_lag": 9}}),
    (["modulation"], {"modulation": {"fft_win": 32, "n_bins": 4,
                                     "min_freq": 0.0, "max_freq": 0.5}}),
    (["peaks"], {"peaks": {"timeNorm": "second", "T": 0.01}}),
    (["peaks"], {"peaks": {"timeNorm": "segment"}}),
    # the peaks/peaks2 name collision must resolve first-REQUESTED-wins
    (["peaks", "peaks2"], {}),
    (["peaks2", "peaks"], {}),
])
def test_lag_families_options_and_peaks_collision(fams, opts):
    rng = np.random.RandomState(17)
    for trial in range(4):
        sizes = rng.randint(1, 150, size=25)
        xs = [np.cumsum(rng.randn(n)) if trial % 2 == 0
              else np.round(rng.randn(n), 1) for n in sizes]
        x = np.concatenate(xs)
        ends = np.cumsum(sizes).astype(np.int64)
        starts = ends - sizes.astype(np.int64)
        bat = compute_batched(x, starts, ends, fams, opts)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            want = compute_all(x[s:e], fams, opts)
            for k, v in want.items():
                got = float(bat[k][gi])
                assert np.isclose(got, v, rtol=1e-9, atol=1e-12), (
                    f"group {gi} (n={e - s}) fams={fams} {k}: "
                    f"batched={got} pergroup={v}")


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_peaks_legacy_automaton_lattice(seed):
    """Adversarial pin for the legacy f_peaks lattice transcription: series
    engineered so close events fire INSIDE inter-detection runs (slow
    descents through the 0.09*rng hysteresis), at detection indices, and
    via the forced i == N-1 close; plateaus suppress detections while the
    per-element close check keeps running."""
    rng = np.random.RandomState(seed)
    xs, sizes = [], []
    for _ in range(80):
        n = rng.randint(1, 60)
        style = rng.randint(4)
        if style == 0:        # triangle waves: many arm/close cycles
            v = np.abs(((np.arange(n) * rng.uniform(0.2, 2.0)) % 7) - 3.5)
        elif style == 1:      # slow descent after one sharp peak
            v = np.concatenate([np.linspace(0, 10, max(n // 4, 1)),
                                np.linspace(10, 0, n)])[:n]
        elif style == 2:      # plateau-heavy quantized walk
            v = np.round(np.cumsum(rng.randn(n)))
        else:                 # noise
            v = rng.randn(n) * rng.uniform(0.1, 5.0)
        xs.append(v.astype(np.float64))
        sizes.append(n)
    x = np.concatenate(xs)
    ends = np.cumsum(sizes).astype(np.int64)
    starts = ends - np.array(sizes, dtype=np.int64)
    bat = compute_batched(x, starts, ends, ["peaks"], {})
    for gi, (s, e) in enumerate(zip(starts, ends)):
        want = compute_all(x[s:e], ["peaks"], {})
        for k, v in want.items():
            got = float(bat[k][gi])
            assert np.isclose(got, v, rtol=1e-12, atol=1e-12), (
                f"group {gi} (n={e - s}) {k}: batched={got} pergroup={v} "
                f"series={x[s:e].tolist()}")


@pytest.mark.parametrize("fams,opts", [
    (["lsp"], {}),
    (["lsp"], {"lsp": {"order": 6}}),
    (["formants"], {}),
    (["formants"], {"formants": {"order": 4, "n_formants": 2, "T": 0.5}}),
])
def test_lsp_formants_companion_eigvals_match_roots(fams, opts):
    """lsp/formants batched via stacked companion eigvals: both
    polynomials carry leading coefficient 1 (and lsp trailing +-1), so
    np.roots' trim path never fires and per-group results match the
    kernels to eigensolver precision (residual ulp differences come from
    the batched autocorrelation input, bounded ~1e-12 relative)."""
    rng = np.random.RandomState(31)
    for trial in range(5):
        sizes = rng.randint(1, 120, size=30)
        xs = [np.cumsum(rng.randn(n)) if trial % 2 == 0
              else np.zeros(n) if trial == 3 else rng.randn(n)
              for n in sizes]
        x = np.concatenate(xs)
        ends = np.cumsum(sizes).astype(np.int64)
        starts = ends - sizes.astype(np.int64)
        bat = compute_batched(x, starts, ends, fams, opts)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            want = compute_all(x[s:e], fams, opts)
            for k, v in want.items():
                got = float(bat[k][gi])
                assert np.isclose(got, v, rtol=1e-9, atol=1e-12), (
                    f"group {gi} (n={e - s}) fams={fams} {k}: "
                    f"batched={got} pergroup={v}")


def test_expanding_select_dense_matches(monkeypatch):
    """The r6 dense small-input path of _expanding_select must return the
    SAME BITS as the coarse-matrix machinery (both select elements via
    stable ranks; selection performs no float op) — adversarial ties,
    -0.0/0.0 mixes, and NaN included, since the driver's byte hash
    distinguishes -0.0 from 0.0."""
    from opensmile_spark.functionals import batched

    rng = np.random.RandomState(23)
    for n in (1, 2, 7, 66, 250):
        cases = [rng.rand(n)]
        tie = np.repeat(rng.rand(max(1, n // 4)), 4)[:n].copy()
        cases.append(tie)
        z = rng.rand(n).copy()
        z[::3] = 0.0
        z[1::4] = -0.0
        cases.append(z)
        nanx = rng.rand(n).copy()
        nanx[::5] = np.nan
        cases.append(nanx)
        for x in cases:
            his = np.arange(1, x.size + 1, dtype=np.int64)
            targets = []
            for p in (0.25, 0.5, 0.75, 0.2, 0.8):
                idxf = p * (his.astype(float) - 1.0)
                targets.append(
                    np.clip(np.floor(idxf).astype(np.int64), 0, his - 1) + 1)
                targets.append(
                    np.clip(np.ceil(idxf).astype(np.int64), 0, his - 1) + 1)
            monkeypatch.setattr(batched, "_SELECT_DENSE_CUTOFF", 1 << 60)
            dense = batched._expanding_select(x, his, targets)
            monkeypatch.setattr(batched, "_SELECT_DENSE_CUTOFF", -1)
            machinery = batched._expanding_select(x, his, targets)
            for d, m in zip(dense, machinery):
                assert d.tobytes() == m.tobytes(), (n, x[:8])
