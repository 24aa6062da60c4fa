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
