"""Cross-group vectorized functional computation.

The per-group kernels (kernels.py) are the semantic source of truth; this
module computes the SAME formulas for the array-expressible families across
ALL groups of a batch at once with numpy reduceat — removing the per-group
Python dispatch that dominates when groups are small (the common case:
tens of turns per session). Families with sequential automatons (peaks2,
segments, onset) and genuinely per-group transforms (lpc, modulation)
stay on the per-group path; samples (a gather) and dct (per-element basis
+ reduceat) joined the batched set in round 4 — the wide-preset
measurement showed the per-group dispatch of those two dominating at
ComParE-width output.

Numerical discipline: central moments are computed exactly as kernels.py
does (sum((x-mean)^k)), NOT via raw-moment expansion (which catastrophically
cancels for large means like reply-latency epochs). Equality with the
per-group path is pinned by tests/test_batched_kernels.py at rtol 1e-12.
"""

from __future__ import annotations

import numpy as np

BATCHED_FAMILIES = {
    "means", "moments", "extremes", "percentiles", "regression", "crossings",
    "times", "samples", "dct", "onset", "segments", "peaks2",
    "lpc", "acf", "amdf", "modulation", "peaks", "lsp", "formants",
}

# per-family options the batched path implements with kernel-equal results;
# a family with any OTHER option falls back to the per-group reference path
# (bank.py consults this so e.g. eGeMAPS-style custom percentiles keep the
# reduceat fast path instead of evicting the family)
BATCHED_SUPPORTED_OPTIONS = {
    "means": {"timeNorm", "T"},
    "moments": set(),
    "extremes": {"timeNorm"},
    "percentiles": {"percentiles", "pctlranges", "pctlquotients"},
    "regression": set(),
    "crossings": set(),
    "times": {"timeNorm"},
    "samples": {"positions"},
    "dct": {"firstCoeff", "lastCoeff"},
    # onset batches ONLY under the default equal thresholds (the automaton
    # degenerates to edge detection); any threshold/useAbsVal option falls
    # back to the per-group reference path
    "onset": {"timeNorm", "T"},
    # segments batches ONLY under the default nonX/X=0/segMinLng=3/
    # pauseMinLng=2/maxNumSeg=20 config (the automaton reduces to
    # run-length algebra there); any algorithm/threshold/length option
    # falls back to the reference automaton
    "segments": {"timeNorm", "T"},
    # peaks2 batches under EVERY option: the lane-parallel transcription
    # (_peaks2_batched) implements the full automaton, not a reduction
    "peaks2": {"timeNorm", "T", "relThresh", "dynRelThresh",
               "absThreshIn", "doRatioLimit"},
    # legacy peaks batches under every option too (_peaks_batched is the
    # full automaton on the detection lattice)
    "peaks": {"timeNorm", "T"},
    # masked-lag-sum autocorrelation + group-vectorized Levinson
    "lpc": {"order", "timeNorm", "T"},
    "acf": {"max_lag", "normalize", "timeNorm", "T"},
    "amdf": {"max_lag", "timeNorm", "T"},
    # one (n_groups, fft_win) gather + batched rfft
    "modulation": {"fft_win", "n_bins", "min_freq", "max_freq",
                   "timeNorm", "T"},
    # stacked companion-matrix eigvals (leading coefficient is always 1,
    # so np.roots' trim path never fires and results match per group)
    "lsp": {"order", "timeNorm", "T"},
    "formants": {"order", "n_formants", "timeNorm", "T"},
}

_BIG = np.iinfo(np.int64).max


def _seg_sum(v, starts):
    return np.add.reduceat(v, starts)


def _lag_sum(x, starts, pos_in, size_rep, k, kind="prod"):
    """Per-group lagged reduction without cross-group or tail leakage:
    sum over group-local i in [0, N-k) of x[i]*x[i+k] (kind="prod") or
    |x[i] - x[i+k]| (kind="absdiff") — the autocorrelation / AMDF segment
    sum shared by the lpc/acf/amdf batched families. Elementwise lag
    product over the concatenated array, the k trailing slots of every
    group zeroed (they would pair with the NEXT group's head), one
    reduceat. Groups with N <= k contribute an empty term set -> 0.0,
    matching the kernels' `if k < N else 0.0` guard."""
    n = x.size
    y = np.zeros(n)
    if k == 0:
        y = x * x if kind == "prod" else y
    elif k < n:
        if kind == "prod":
            y[: n - k] = x[: n - k] * x[k:]
        else:
            y[: n - k] = np.abs(x[: n - k] - x[k:])
    valid = pos_in < size_rep - k
    return np.add.reduceat(np.where(valid, y, 0.0), starts)


def _levinson_batched(x, starts, ends, pos_in, size_rep, order):
    """Levinson-Durbin over every group at once: returns (a, e, zero, p)
    where a is the (n_groups, order+1) coefficient matrix, e the final
    prediction error, zero the r0==0 early-exit mask, and p the per-group
    effective order min(order, max(N-1, 1)). Per-group scalar op order is
    identical to kernels.f_lpc (loops run over the lag index)."""
    n_groups = starts.size
    Ni = ends - starts
    r = np.stack([_lag_sum(x, starts, pos_in, size_rep, k)
                  for k in range(order + 1)], axis=1)
    zero = r[:, 0] == 0.0
    p = np.minimum(order, np.maximum(Ni - 1, 1))
    a = np.zeros((n_groups, order + 1))
    e = r[:, 0].copy()
    for i in range(1, order + 1):
        active = i <= p
        acc = r[:, i].copy()
        for j in range(1, i):
            acc = acc - a[:, j] * r[:, i - j]
        k_i = np.where(active & (e != 0.0),
                       acc / np.where(e != 0.0, e, 1.0), 0.0)
        a_new = a.copy()
        a_new[:, i] = k_i
        for j in range(1, i):
            a_new[:, j] = a[:, j] - k_i * a[:, i - j]
        a = np.where(active[:, None], a_new, a)
        e = np.where(active, e * (1.0 - k_i * k_i), e)
    return a, e, zero, p


def _lpc_poly_batched(x, starts, ends, pos_in, size_rep, order):
    """A(z) = 1 - sum lpc_k z^-(k+1) as an (n_groups, order+1) matrix,
    built from the SAME clamped lpc outputs the kernels expose (zero mask,
    effective-order cutoff) — the polynomial f_lsp/f_formants factor."""
    a, _e, zero, p = _levinson_batched(x, starts, ends, pos_in,
                                       size_rep, order)
    av = np.zeros((starts.size, order + 1))
    av[:, 0] = 1.0
    for k in range(order):
        av[:, k + 1] = -np.where(zero | (k + 1 > p), 0.0, a[:, k + 1])
    return av


EXPANDING_FAMILIES = {"means", "extremes", "moments", "percentiles",
                      "regression"}

# outputs of an expanding family that are NOT prefix-expressible: per-window
# mean |residual| needs the fitted line/parabola of THAT window applied to
# every element, so these two keys keep the bounded-gather path while the
# rest of the regression family runs O(N + A)
EXPANDING_UNSUPPORTED_KEYS = {"linregerrA", "qregerrA"}

# ---------------------------------------------------------------------------
# exact expanding-window central statistics: blocked two-pass + Chan merge.
#
# Central moments over every prefix x[0:h] cannot use raw-moment expansion
# (module discipline above) and a per-element Welford scan is a Python loop.
# Instead: split the series into blocks of B, compute each block's central
# stats EXACTLY (two-pass, vectorized), cumulate blocks with Chan/Pébay
# parallel combines (N/B-step Python loop over scalars), then for each
# anchor h merge cum-stats of the h//B full blocks with the exact two-pass
# stats of the <=B-element remainder (vectorized across anchors). Work is
# O(N + A*B + N/B); every sum is centered — the same discipline as the
# salted combine in operators/salt.py:82-123.
# ---------------------------------------------------------------------------

_CHAN_B = 256


def _chan_merge(sa, sb, names, m34, pairs):
    """Chan/Pébay parallel combine of central-stat dicts (vectorized or
    scalar): n, ("mean", c), ("M2", c) per col; ("M3"/"M4", c) for m34 cols;
    ("C", a, b) co-moments per pair. Empty sides (n == 0) must carry zeros —
    the formulas then reduce to the other side exactly."""
    na, nb = sa["n"], sb["n"]
    n = na + nb
    safe = np.where(n > 0, n, 1.0)
    out = {"n": n}
    delta = {c: sb[("mean", c)] - sa[("mean", c)] for c in names}
    for c in names:
        out[("mean", c)] = sa[("mean", c)] + delta[c] * nb / safe
    for c in m34:
        d = delta[c]
        M2a, M2b = sa[("M2", c)], sb[("M2", c)]
        M3a, M3b = sa[("M3", c)], sb[("M3", c)]
        out[("M4", c)] = (
            sa[("M4", c)] + sb[("M4", c)]
            + d ** 4 * na * nb * (na * na - na * nb + nb * nb) / safe ** 3
            + 6.0 * d * d * (na * na * M2b + nb * nb * M2a) / safe ** 2
            + 4.0 * d * (na * M3b - nb * M3a) / safe)
        out[("M3", c)] = (
            M3a + M3b + d ** 3 * na * nb * (na - nb) / safe ** 2
            + 3.0 * d * (na * M2b - nb * M2a) / safe)
    for c in names:
        out[("M2", c)] = (sa[("M2", c)] + sb[("M2", c)]
                          + delta[c] ** 2 * na * nb / safe)
    for a, b in pairs:
        out[("C", a, b)] = (sa[("C", a, b)] + sb[("C", a, b)]
                            + delta[a] * delta[b] * na * nb / safe)
    return out


def _two_pass_stats(cols, starts, sizes, names, m34, pairs):
    """Exact central stats of the (non-empty) segments [starts[i],
    starts[i]+sizes[i]) of the concatenated arrays in `cols`."""
    st = {"n": sizes.astype(np.float64)}
    centered = {}
    for c in names:
        v = cols[c]
        mu = np.add.reduceat(v, starts) / st["n"]
        st[("mean", c)] = mu
        d = v - np.repeat(mu, sizes)
        centered[c] = d
        d2 = d * d
        st[("M2", c)] = np.add.reduceat(d2, starts)
        if c in m34:
            st[("M3", c)] = np.add.reduceat(d2 * d, starts)
            st[("M4", c)] = np.add.reduceat(d2 * d2, starts)
    for a, b in pairs:
        st[("C", a, b)] = np.add.reduceat(centered[a] * centered[b], starts)
    return st


# below this n*A product the dense (A, n) path beats the coarse-matrix
# machinery's fixed cost; tests monkeypatch it to force either path
_SELECT_DENSE_CUTOFF = 32768


def _expanding_select(x, his, targets, B=_CHAN_B, W=256, chunk=8192):
    """Exact order statistics over prefixes: for every anchor a, the
    targets[j][a]-th smallest (1-based) element of x[0:his[a]] — the
    selection core of expanding percentiles.

    Offline 2D dominance counting, fully vectorized: global stable ranks g
    (ties by index), a coarse cumulative matrix M[k, v] = |{i < k*B :
    g[i] < v*W}| (N^2/(B*W) cells — a few thousand), per-anchor remainder
    rank-histograms for the <=B elements past the last block boundary, and
    a two-level select per target: coarse bucket via monotone count
    comparison, then the exact member inside the <=W-wide bucket via a
    masked cumulative count over `order`. O(N + A*(B + N/W + W)) work —
    linear like the Chan path, never the O(sum of window sizes) gather.

    Small inputs take a dense path (r6): the coarse-matrix machinery has
    ~2 ms of fixed per-call cost, which dominated point-in-time backfills
    over SHORT conversations (the per-conv kernel calls this once per
    conversation). For n*A below the cutoff, a dense (A, n) in-window
    cumulative count over the SAME stable ranks selects the same
    elements — selection never performs a float operation, and both
    paths order ties by original index (stable argsort), so the returned
    bits are identical by construction (pinned by
    tests/test_batched_kernels.py::test_expanding_select_dense_matches)."""
    n = x.size
    his_arr = np.asarray(his, dtype=np.int64)
    if n * his_arr.size <= _SELECT_DENSE_CUTOFF:
        order = np.argsort(x, kind="stable")
        sorted_vals = x[order]
        valid = order[None, :] < his_arr[:, None]
        cum = np.cumsum(valid, axis=1)
        outs = []
        for tgt in targets:
            t = np.asarray(tgt, dtype=np.int64)
            # first sorted position whose in-window count reaches t — that
            # position is in-window (the count increments only there), so
            # it IS the t-th smallest element of x[0:h]
            j_star = (cum < t[:, None]).sum(axis=1)
            outs.append(sorted_vals[j_star])
        return outs
    order = np.argsort(x, kind="stable")          # rank -> index
    sorted_vals = x[order]
    g = np.empty(n, dtype=np.int64)               # index -> rank
    g[order] = np.arange(n, dtype=np.int64)
    nb = (n + B - 1) // B
    nv = (n + W - 1) // W
    # M[k, v] = count(idx < k*B and g < v*W); build by 2D histogram + cumsum
    hist = np.zeros((nb + 1, nv + 1), dtype=np.int64)
    idx_blk = np.arange(n, dtype=np.int64) // B
    np.add.at(hist, (idx_blk + 1, g // W + 1), 1)
    M = hist.cumsum(axis=0).cumsum(axis=1)

    his = np.asarray(his, dtype=np.int64)
    A = his.size
    outs = [np.empty(A) for _ in targets]
    # pad order/sorted_vals so bucket gathers never index past the end
    order_pad = np.concatenate([order, np.full(W, n, dtype=np.int64)])
    vals_pad = np.concatenate([sorted_vals, np.zeros(W)])

    for c0 in range(0, A, chunk):
        sel = slice(c0, min(c0 + chunk, A))
        h = his[sel]
        kk = h // B
        rr = h - kk * B
        m = h.size
        # remainder coarse histogram: ranks of elements [k*B, h)
        crem = np.zeros((m, nv + 1), dtype=np.int64)
        nzr = np.flatnonzero(rr > 0)
        if nzr.size:
            sizes = rr[nzr]
            so = np.zeros(nzr.size, dtype=np.int64)
            so[1:] = np.cumsum(sizes)[:-1]
            gather = (np.arange(int(sizes.sum()), dtype=np.int64)
                      + np.repeat(kk[nzr] * B - so, sizes))
            rows = np.repeat(nzr, sizes)
            np.add.at(crem, (rows, g[gather] // W + 1), 1)
        ccoarse = M[kk] + np.cumsum(crem, axis=1)   # (m, nv+1) monotone rows
        for j, tgt in enumerate(targets):
            t = np.asarray(tgt[sel], dtype=np.int64)
            # smallest v with ccoarse[:, v] >= t  (rows monotone)
            v_star = (ccoarse < t[:, None]).sum(axis=1)
            t_res = t - np.take_along_axis(
                ccoarse, (v_star - 1)[:, None], axis=1)[:, 0]
            rstart = (v_star - 1) * W
            member_idx = order_pad[rstart[:, None]
                                   + np.arange(W, dtype=np.int64)]
            inwin = (member_idx < h[:, None]).cumsum(axis=1)
            j_star = (inwin < t_res[:, None]).sum(axis=1)
            outs[j][sel] = vals_pad[rstart + j_star]
    return outs


def _expanding_stats(cols, his, m34=(), pairs=(), B=_CHAN_B):
    """Exact central stats over every prefix x[0:h], h in his (h >= 1)."""
    names = list(cols)
    n = next(iter(cols.values())).size
    nb = (n + B - 1) // B
    bstarts = (np.arange(nb) * B).astype(np.int64)
    bsizes = np.minimum(bstarts + B, n) - bstarts
    blk = _two_pass_stats(cols, bstarts, bsizes, names, m34, pairs)

    keys = [k for k in blk if k != "n"]
    cum = {k: np.zeros(nb + 1) for k in keys}
    cum["n"] = np.zeros(nb + 1)
    run = {k: 0.0 for k in keys}
    run["n"] = 0.0
    for i in range(nb):
        sb = {k: blk[k][i] for k in blk}
        run = _chan_merge(run, sb, names, m34, pairs)
        for k in run:
            cum[k][i + 1] = run[k]

    his = np.asarray(his, dtype=np.int64)
    kk = his // B
    rr = his - kk * B
    A = his.size
    rem = {k: np.zeros(A) for k in keys}
    rem["n"] = rr.astype(np.float64)
    nz = np.flatnonzero(rr > 0)
    if nz.size:
        sizes = rr[nz]
        starts_out = np.zeros(nz.size, dtype=np.int64)
        starts_out[1:] = np.cumsum(sizes)[:-1]
        gather = (np.arange(int(sizes.sum()), dtype=np.int64)
                  + np.repeat(kk[nz] * B - starts_out, sizes))
        gcols = {c: cols[c][gather] for c in names}
        rs = _two_pass_stats(gcols, starts_out, sizes, names, m34, pairs)
        for k in keys:
            rem[k][nz] = rs[k]
    sa = {k: cum[k][kk] for k in cum}
    return _chan_merge(sa, rem, names, m34, pairs)


def compute_expanding(x: np.ndarray, his: np.ndarray,
                      families, options=None) -> dict[str, np.ndarray]:
    """Expanding-window functionals: window j = x[0:his[j]] (his >= 1,
    ascending not required). O(N + A*B) prefix/blocked scans instead of the
    O(sum his) gather — the difference between linear and quadratic work
    for point-in-time backfills with unbounded lookback.

    means/extremes are pure raw sums / running extrema (plain prefix
    scans); moments and regression use the exact blocked-Chan central-stat
    machinery above (variance/skew/kurtosis from centered M2/M3/M4;
    regression coefficients and quadratic errors from centered co-moments
    Cuy/Cvy/Cuv with u=i, v=i^2 — valid because every expanding window
    shares origin 0, so the regressors are global prefixes too). The two
    mean-|residual| outputs (EXPANDING_UNSUPPORTED_KEYS) are irreducibly
    per-window and are NOT returned — the caller routes them to the gather.
    Percentiles use the exact offline order-statistic machinery
    (_expanding_select) — bit-identical to sorting each window, never the
    gather. Same output names, guards, and formulas as kernels.py
    f_moments / f_percentiles / f_regression
    (functionalRegression.cpp:219-246 closed forms expressed via the
    algebraically-identical centered normal equations)."""
    options = options or {}
    if not (np.asarray(his) >= 1).all():
        raise ValueError("compute_expanding: windows must be non-empty")
    n = x.size
    j = np.asarray(his, dtype=np.int64) - 1     # inclusive end index
    N = his.astype(np.float64)
    out: dict[str, np.ndarray] = {}

    def pref(v):
        return np.cumsum(v)[j]

    if "means" in families:
        absx = np.abs(x)
        nz = x != 0.0
        pos = x > 0.0
        neg = x < 0.0
        mean = pref(x) / N
        nnz = pref(nz.astype(np.float64))
        npos = pref(pos.astype(np.float64))
        nneg = pref(neg.astype(np.float64))
        absmean = pref(absx) / N
        qmean = pref(x * x) / N
        with np.errstate(divide="ignore", invalid="ignore"):
            logabs = np.where(nz, np.log(np.where(nz, absx, 1.0)), 0.0)
        nz_s = pref(np.where(nz, x, 0.0))
        nzabs_s = pref(np.where(nz, absx, 0.0))
        nzq_s = pref(np.where(nz, x * x, 0.0))
        nzlog_s = pref(logabs)
        pos_s = pref(np.where(pos, x, 0.0))
        posq_s = pref(np.where(pos, x * x, 0.0))
        neg_s = pref(np.where(neg, x, 0.0))
        negq_s = pref(np.where(neg, x * x, 0.0))
        safe_nnz = np.where(nnz > 0, nnz, 1.0)
        safe_np = np.where(npos > 0, npos, 1.0)
        safe_nn = np.where(nneg > 0, nneg, 1.0)
        out["amean"] = mean
        out["absmean"] = absmean
        out["qmean"] = qmean
        out["nzamean"] = np.where(nnz > 0, nz_s / safe_nnz, 0.0)
        out["nzabsmean"] = np.where(nnz > 0, nzabs_s / safe_nnz, 0.0)
        out["nzqmean"] = np.where(nnz > 0, nzq_s / safe_nnz, 0.0)
        nzgmean = np.where(nnz > 0, np.exp(nzlog_s / safe_nnz), 0.0)
        out["nzgmean"] = nzgmean
        tn = options.get("means", {}).get("timeNorm", "frames")
        if tn == "segment":
            out["nnz"] = nnz / N
        elif tn == "second":
            out["nnz"] = nnz / options.get("means", {}).get("T", 1.0)
        else:
            out["nnz"] = nnz
        out["flatness"] = np.where(absmean != 0.0, nzgmean
                                   / np.where(absmean != 0, absmean, 1.0),
                                   1.0)
        posqmean = np.where(npos > 0, posq_s / safe_np, 0.0)
        negqmean = np.where(nneg > 0, negq_s / safe_nn, 0.0)
        out["posamean"] = np.where(npos > 0, pos_s / safe_np, 0.0)
        out["negamean"] = np.where(nneg > 0, neg_s / safe_nn, 0.0)
        out["posqmean"] = posqmean
        out["posrqmean"] = np.sqrt(posqmean)
        out["negqmean"] = negqmean
        out["negrqmean"] = np.sqrt(negqmean)
        out["rqmean"] = np.sqrt(qmean)
        out["nzrqmean"] = np.sqrt(out["nzqmean"])

    if "extremes" in families:
        rmax = np.maximum.accumulate(x)
        rmin = np.minimum.accumulate(x)
        gmax = rmax[j]
        gmin = rmin[j]
        idx = np.arange(n, dtype=np.int64)
        # first index achieving each running max/min: strict-update points,
        # then running max of the update positions (monotone by construction)
        prev_max = np.empty(n)
        prev_max[0] = -np.inf
        prev_max[1:] = rmax[:-1]
        prev_min = np.empty(n)
        prev_min[0] = np.inf
        prev_min[1:] = rmin[:-1]
        argmax_run = np.maximum.accumulate(np.where(x > prev_max, idx, 0))
        argmin_run = np.maximum.accumulate(np.where(x < prev_min, idx, 0))
        maxpos = argmax_run[j].astype(np.float64)
        minpos = argmin_run[j].astype(np.float64)
        tn = options.get("extremes", {}).get("timeNorm", "frames")
        if tn == "segment":
            maxpos = maxpos / N
            minpos = minpos / N
        mean = pref(x) / N
        out["max"] = gmax
        out["min"] = gmin
        out["range"] = gmax - gmin
        out["maxPos"] = maxpos
        out["minPos"] = minpos
        if "amean" not in out:
            out["amean"] = mean
        out["maxameandist"] = gmax - mean
        out["minameandist"] = mean - gmin

    if "percentiles" in families:
        popts = options.get("percentiles", {})
        plist = list(popts.get("percentiles", (0.20, 0.50, 0.80)))
        pranges = list(popts.get("pctlranges", ((0, 2),)))
        pquots = list(popts.get("pctlquotients", ()))
        fracs = [0.25, 0.50, 0.75] + plist
        hl = np.asarray(his, dtype=np.int64)
        targets, meta = [], []
        for p in fracs:
            idxf = p * (N - 1.0)
            i1 = np.clip(np.floor(idxf).astype(np.int64), 0, hl - 1)
            i2 = np.clip(np.ceil(idxf).astype(np.int64), 0, hl - 1)
            meta.append((idxf, i1, i2, len(targets)))
            targets.append(i1 + 1)
            targets.append(i2 + 1)
        got = _expanding_select(x, hl, targets)
        pct = {}
        for p, (idxf, i1, i2, base) in zip(fracs, meta):
            v1, v2 = got[base], got[base + 1]
            w1 = idxf - i1
            w2 = i2 - idxf
            pct[p] = np.where(i1 != i2, v1 * w2 + v2 * w1, v1)
        q1, q2, q3 = pct[0.25], pct[0.50], pct[0.75]
        out["quartile1"] = q1
        out["quartile2"] = q2
        out["quartile3"] = q3
        out["iqr1-2"] = q2 - q1
        out["iqr2-3"] = q3 - q2
        out["iqr1-3"] = q3 - q1
        pvals = []
        for p in plist:
            v = pct[p]
            out[f"percentile{p * 100:.1f}"] = v
            pvals.append(v)
        for a, b in pranges:
            out[f"pctlrange{a}-{b}"] = np.abs(pvals[b] - pvals[a])
        for a, b in pquots:
            # identical quirks to compute_batched: numerator-only guard +
            # smileMath_ratioLimit(q, 50, 100)
            va, vb = pvals[a], pvals[b]
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.where(vb != 0.0, va / np.where(vb != 0.0, vb, 1.0),
                             np.where(va > 0, np.inf, -np.inf))
                hi = q > 50.0
                lo = q < -50.0
                qh = np.tanh((np.sqrt(np.where(hi, q, 50.0) - 49.0) - 1.0)
                             / 50.0) * 100.0 + 50.0
                ql = np.tanh(-(np.sqrt(-np.where(lo, q, -50.0) - 49.0) - 1.0)
                             / 50.0) * 100.0 - 50.0
            q = np.where(hi, qh, np.where(lo, ql, q))
            out[f"pctlquotient{a}-{b}"] = np.where(va != 0.0, q, 0.0)

    if "moments" in families or "regression" in families:
        scols = {"y": x}
        m34 = ("y",) if "moments" in families else ()
        pairs = []
        if "regression" in families:
            u = np.arange(n, dtype=np.float64)
            scols["u"] = u
            scols["v"] = u * u
            pairs = [("u", "y"), ("v", "y"), ("u", "v")]
        st = _expanding_stats(scols, his, m34=m34, pairs=pairs)

    if "moments" in families:
        m2 = st[("M2", "y")] / N
        sqm2 = np.where(m2 > 0, np.sqrt(np.where(m2 > 0, m2, 1.0)), 0.0)
        m3 = st[("M3", "y")]
        m4 = st[("M4", "y")]
        out["variance"] = m2
        out["stddev"] = sqm2
        d3 = N * m2 * sqm2
        d4 = N * m2 * m2
        out["skewness"] = np.where(d3 > 0, m3 / np.where(d3 > 0, d3, 1.0), 0.0)
        out["kurtosis"] = np.where(d4 > 0, m4 / np.where(d4 > 0, d4, 1.0), 0.0)
        mean = st[("mean", "y")]
        if "amean" not in out:
            out["amean"] = mean
        mean1 = np.where(mean != 0.0, mean, 1.0)
        out["stddevNorm"] = np.where(m2 > 0, sqm2 / mean1, 0.0)
        amean1 = np.where(mean != 0.0, np.abs(mean), 1.0)
        out["coeffOfVariation"] = np.where(m2 > 0, sqm2 / amean1, 0.0)

    if "regression" in families:
        mean_y = st[("mean", "y")]
        mean_u = st[("mean", "u")]
        mean_v = st[("mean", "v")]
        M2u, M2v, M2y = st[("M2", "u")], st[("M2", "v")], st[("M2", "y")]
        Cuy, Cvy, Cuv = (st[("C", "u", "y")], st[("C", "v", "y")],
                         st[("C", "u", "v")])
        multi = N > 1
        x0 = x[0] if n else 0.0
        safeM2u = np.where(M2u > 0, M2u, 1.0)
        m = np.where(multi & (M2u > 0), Cuy / safeM2u, 0.0)
        t = np.where(multi, mean_y - m * mean_u, x0)
        # SSE at the LS optimum (= kernel residual pass to 2nd order in eps)
        leq = np.where(multi, np.maximum(M2y - m * Cuy, 0.0) / N, 0.0)
        # quadratic 2x2 centered normal equations; det is a pure function of
        # N: exactly 0 for N == 2 (the kernel's closed-form det is exactly 0
        # there too -> a=b=c=0), strictly positive for N >= 3
        det = M2u * M2v - Cuv * Cuv
        det_ok = multi & (N > 2) & (det > 0)
        safed = np.where(det_ok, det, 1.0)
        b = np.where(det_ok, (Cuy * M2v - Cvy * Cuv) / safed, 0.0)
        a = np.where(det_ok, (Cvy * M2u - Cuy * Cuv) / safed, 0.0)
        c = np.where(multi,
                     np.where(det_ok, mean_y - a * mean_v - b * mean_u, 0.0),
                     x0)
        # residual vs the zero-fit (a=b=c=0) when the kernel emits zeros
        qeq = np.where(
            det_ok, np.maximum(M2y - b * Cuy - a * Cvy, 0.0) / N,
            np.where(multi, M2y / N + mean_y * mean_y, 0.0))
        asum = N * mean_y
        num = Cuy + N * mean_u * mean_y
        centroid = np.where(asum != 0.0,
                            num / np.where(asum != 0.0, asum, 1.0), 0.0)

        def fin(v):
            return np.where(np.isfinite(v), v, 0.0)

        out["linregc1"] = fin(m)
        out["linregc2"] = fin(t)
        out["linregerrQ"] = fin(leq)
        out["qregc1"] = fin(a)
        out["qregc2"] = fin(b)
        out["qregc3"] = fin(c)
        out["qregerrQ"] = fin(qeq)
        out["centroid"] = fin(centroid)

    return out


def _peaks2_batched(x, starts, ends, gmin, gmax, gmean, opts):
    """Cross-group vectorized f_peaks2 (functionalPeaks2.cpp:314-919) —
    the LAST per-group family moved to the batched path. The 3-pass
    extremum automaton and 4 stats passes are transcribed lane-parallel:
    each group's scalar state (lastVal/lastMin/lastMax/minFlag/backref
    indices) becomes an (n_groups,) array and the sequential loop runs
    over the PADDED extremum index — step j touches extremum j of every
    group at once, so per-group operation order (and therefore float
    accumulation order) is IDENTICAL to kernels.f_peaks2. Cost per batch
    is O(M_max) numpy steps over all groups instead of O(sum M_g) Python
    steps; equality is pinned by tests/test_batched_kernels.py."""
    n_groups = starts.size
    sizes = ends - starts
    Nf = sizes.astype(np.float64)
    timeNorm = opts.get("timeNorm", "frames")
    T = opts.get("T", 1.0)
    relThresh = opts.get("relThresh", 0.1)
    dynRelThresh = opts.get("dynRelThresh", False)
    absThreshIn = opts.get("absThreshIn", None)
    doRatioLimit = opts.get("doRatioLimit", False)

    rng_ = gmax - gmin
    absThresh = (np.full(n_groups, float(absThreshIn))
                 if absThreshIn is not None else relThresh * rng_)

    if dynRelThresh:
        def below(diff, base):
            safe = np.where(base == 0.0, 1.0, base)
            return np.where(base == 0.0, diff != 0.0,
                            np.abs(diff / safe) < relThresh)
    else:
        def below(diff, base):
            return diff < absThresh

    x0 = x[starts].astype(np.float64)
    xl = x[ends - 1].astype(np.float64)

    # --- step 1: local extrema at group-local i in [2, N-3] ---
    n_el = x.size
    rep_starts = np.repeat(starts, sizes)
    iig = np.arange(n_el, dtype=np.int64) - rep_starts
    size_rep = np.repeat(sizes, sizes)
    interior = (iig >= 2) & (iig <= size_rep - 3)
    xm1 = np.empty_like(x)
    xp1 = np.empty_like(x)
    xm1[1:] = x[:-1]
    xm1[0] = np.inf
    xp1[:-1] = x[1:]
    xp1[-1] = np.inf
    is_max_el = interior & (x > xm1) & (x > xp1)
    is_min_el = interior & (x < xm1) & (x < xp1)
    e_idx = np.flatnonzero(is_max_el | is_min_el)
    grp_rep = np.repeat(np.arange(n_groups, dtype=np.int64), sizes)
    e_grp = grp_rep[e_idx]
    Mg = np.bincount(e_grp, minlength=n_groups)
    M_max = int(Mg.max()) if e_idx.size else 0
    W = max(M_max, 1)
    # lattice is (W, n_groups) so step j reads CONTIGUOUS rows (the
    # (n_groups, W) layout makes every per-step slice a strided gather —
    # measured ~10x slower at 10k groups)
    Ev = np.zeros((W, n_groups))
    Et = np.zeros((W, n_groups), dtype=bool)
    Ep = np.zeros((W, n_groups))
    Va = np.zeros((W, n_groups), dtype=bool)
    if e_idx.size:
        first = np.concatenate(([0], np.cumsum(Mg)[:-1]))
        jr = np.arange(e_idx.size) - first[e_grp]
        Ev[jr, e_grp] = x[e_idx]
        Et[jr, e_grp] = is_max_el[e_idx]
        Ep[jr, e_grp] = iig[e_idx].astype(np.float64)
        Va[jr, e_grp] = True
    alive = Va.copy()

    # --- pass 2a (no alive guard: the scalar loop visits every extremum) ---
    lastVal = x0.copy()
    lastMin = x0.copy()
    lastMax = x0.copy()
    minFlag = np.zeros(n_groups, dtype=bool)
    lmi = np.full(n_groups, -1, dtype=np.int64)
    for j in range(M_max):
        act = Va[j]
        y = Ev[j]
        bel1 = below(np.abs(y - lastVal), np.minimum(y, lastVal))
        mx = act & Et[j]
        mn = act & ~Et[j]
        mb = mx & bel1
        bel2 = below(y - lastMin, lastMin)
        alive[j, mb & bel2] = False
        grow = mb & ~bel2
        big = grow & (y > lastMax * 1.05)
        rows = np.flatnonzero(big & (lmi >= 0))
        alive[lmi[rows], rows] = False
        take2 = grow & ~big & minFlag
        alive[j, grow & ~big & ~minFlag] = False
        mnb = mx & ~bel1                      # not-below max branch
        upd = big | take2 | mnb
        lastMax = np.where(upd, y, lastMax)
        lmi = np.where(upd, j, lmi)
        # minFlag=0 only on the not-bel2 and not-bel1 max branches — a max
        # killed via bel2 leaves minFlag UNCHANGED (kernels.py:1119 sits
        # inside the else:, not at the below(d,base) level)
        minFlag = minFlag & ~(grow | mnb)
        mnnb = mn & ~bel1                     # min branch, not below
        minFlag = minFlag | mnnb
        lastMin = np.where(mnnb, y, lastMin)
        lastVal = np.where(act, y, lastVal)

    # --- pass 2b ---
    lastMax = x0.copy()
    for j in range(M_max):
        act = Va[j] & alive[j, :]
        y = Ev[j]
        mn = act & ~Et[j]
        alive[j, mn & below(lastMax - y, y)] = False
        mx = act & Et[j]
        lastMax = np.where(mx, y, lastMax)

    # --- pass 3: alternation ---
    lastMax = x0.copy()
    lastMin = x0.copy()
    minFlag = np.zeros(n_groups, dtype=bool)
    init = np.ones(n_groups, dtype=bool)
    lni = np.full(n_groups, -1, dtype=np.int64)
    lmi = np.full(n_groups, -1, dtype=np.int64)
    for j in range(M_max):
        act = Va[j] & alive[j, :]
        y = Ev[j]
        mn = act & ~Et[j]
        mx = act & Et[j]
        take = mn & (~minFlag | init)
        other = mn & ~(~minFlag | init)
        alive[j, other & (y >= lastMin)] = False
        better = other & (y < lastMin)
        rows = np.flatnonzero(better & (lni != j) & (lni >= 0))
        alive[lni[rows], rows] = False
        updn = take | better
        lastMin = np.where(updn, y, lastMin)
        lni = np.where(updn, j, lni)
        minFlag = minFlag | take
        init = init & ~take
        takex = mx & (minFlag | init)
        otherx = mx & ~(minFlag | init)
        alive[j, otherx & (y <= lastMax)] = False
        betterx = otherx & (y > lastMax)
        rows = np.flatnonzero(betterx & (lmi != j) & (lmi >= 0))
        alive[lmi[rows], rows] = False
        updx = takex | betterx
        lastMax = np.where(updx, y, lastMax)
        lmi = np.where(updx, j, lmi)
        minFlag = minFlag & ~takex
        init = init & ~takex

    fin = Va & alive

    # --- stats pass 1 ---
    z = np.zeros
    peakMax, peakMin = z(n_groups), z(n_groups)
    peakDist, peakDiff = z(n_groups), z(n_groups)
    nPeakDist, peakMean, nPeaks = z(n_groups), z(n_groups), z(n_groups)
    minMax, minMin = z(n_groups), z(n_groups)
    minDist, minDiff = z(n_groups), z(n_groups)
    nMinDist, minMean, nMins = z(n_groups), z(n_groups), z(n_groups)
    lmx, lmy = z(n_groups), z(n_groups)
    lnx, lny = z(n_groups), z(n_groups)
    has_lm = np.zeros(n_groups, dtype=bool)
    has_ln = np.zeros(n_groups, dtype=bool)
    for j in range(M_max):
        act = fin[j]
        y = Ev[j]
        pos = Ep[j]
        mn = act & ~Et[j]
        firstn = mn & ~has_ln
        minMin = np.where(firstn, y, minMin)
        minMax = np.where(firstn, y, minMax)
        restn = mn & has_ln
        nMinDist += restn
        minDist += np.where(restn, pos - lnx, 0.0)
        minDiff += np.where(restn, np.abs(y - lny), 0.0)
        minMin = np.where(restn & (y < minMin), y, minMin)
        minMax = np.where(restn & (y > minMax), y, minMax)
        lnx = np.where(mn, pos, lnx)
        lny = np.where(mn, y, lny)
        minMean += np.where(mn, y, 0.0)
        nMins += mn
        has_ln |= mn
        mx = act & Et[j]
        firstm = mx & ~has_lm
        peakMin = np.where(firstm, y, peakMin)
        peakMax = np.where(firstm, y, peakMax)
        restm = mx & has_lm
        nPeakDist += restm
        peakDist += np.where(restm, pos - lmx, 0.0)
        peakDiff += np.where(restm, np.abs(y - lmy), 0.0)
        peakMin = np.where(restm & (y < peakMin), y, peakMin)
        peakMax = np.where(restm & (y > peakMax), y, peakMax)
        lmx = np.where(mx, pos, lmx)
        lmy = np.where(mx, y, lmy)
        peakMean += np.where(mx, y, 0.0)
        nPeaks += mx
        has_lm |= mx

    pm_div = nPeaks > 1
    peakMean = np.where(pm_div,
                        peakMean / np.where(pm_div, nPeaks, 1.0), peakMean)
    pd_div = nPeakDist > 1          # implies nPeaks > 1 (reference nesting)
    peakDist = np.where(pd_div,
                        peakDist / np.where(pd_div, nPeakDist, 1.0), peakDist)
    peakDiff = np.where(pd_div,
                        peakDiff / np.where(pd_div, nPeakDist, 1.0), peakDiff)
    mm_div = nMins > 0
    minMean = np.where(mm_div,
                       minMean / np.where(mm_div, nMins, 1.0), minMean)
    md_div = nMinDist > 1
    minDist = np.where(md_div,
                       minDist / np.where(md_div, nMinDist, 1.0), minDist)
    minDiff = np.where(md_div,
                       minDiff / np.where(md_div, nMinDist, 1.0), minDiff)

    # --- stats pass 2 (reference quirk kept: max branch refs last MIN) ---
    peakSDist, peakSDiff = z(n_groups), z(n_groups)
    minSDist, minSDiff = z(n_groups), z(n_groups)
    lmx2, lmy2 = z(n_groups), z(n_groups)
    lnx2, lny2 = z(n_groups), z(n_groups)
    has_lm2 = np.zeros(n_groups, dtype=bool)
    has_ln2 = np.zeros(n_groups, dtype=bool)
    for j in range(M_max):
        act = fin[j]
        y = Ev[j]
        pos = Ep[j]
        mn = act & ~Et[j]
        c = mn & has_ln2
        dd = pos - lnx2 - minDist
        minSDist += np.where(c, dd * dd, 0.0)
        ddf = np.abs(y - lny2) - minDiff
        minSDiff += np.where(c, ddf * ddf, 0.0)
        mx = act & Et[j]
        cm = mx & has_lm2
        rx = np.where(has_ln2, lnx2, lmx2)
        ry = np.where(has_ln2, lny2, lmy2)
        dd = pos - rx - peakDist
        peakSDist += np.where(cm, dd * dd, 0.0)
        ddf = np.abs(y - ry) - peakDiff
        peakSDiff += np.where(cm, ddf * ddf, 0.0)
        lnx2 = np.where(mn, pos, lnx2)
        lny2 = np.where(mn, y, lny2)
        has_ln2 |= mn
        lmx2 = np.where(mx, pos, lmx2)
        lmy2 = np.where(mx, y, lmy2)
        has_lm2 |= mx

    peakSDist = np.where(pd_div,
                         peakSDist / np.where(pd_div, nPeakDist, 1.0),
                         peakSDist)
    peakSDiff = np.where(pd_div,
                         peakSDiff / np.where(pd_div, nPeakDist, 1.0),
                         peakSDiff)
    peakSDist = np.where(peakSDist > 0,
                         np.sqrt(np.where(peakSDist > 0, peakSDist, 1.0)),
                         0.0)
    peakSDiff = np.where(peakSDiff > 0,
                         np.sqrt(np.where(peakSDiff > 0, peakSDiff, 1.0)),
                         0.0)
    minSDist = np.where(md_div,
                        minSDist / np.where(md_div, nMinDist, 1.0), minSDist)
    minSDiff = np.where(md_div,
                        minSDiff / np.where(md_div, nMinDist, 1.0), minSDiff)
    minSDist = np.where(minSDist > 0,
                        np.sqrt(np.where(minSDist > 0, minSDist, 1.0)), 0.0)
    minSDiff = np.where(minSDiff > 0,
                        np.sqrt(np.where(minSDiff > 0, minSDiff, 1.0)), 0.0)

    # --- slopes ---
    meanRS, meanFS = z(n_groups), z(n_groups)
    nRising, nFalling = z(n_groups), z(n_groups)
    minRS, maxRS = z(n_groups), z(n_groups)
    minFS, maxFS = z(n_groups), z(n_groups)
    lastIsMax = np.full(n_groups, -1, dtype=np.int64)
    lastMaxV = x0.copy()
    lastMaxPos = z(n_groups)
    lastMinV = x0.copy()
    lastMinPos = z(n_groups)

    def _acc_slope(c, slope, mean_, n_, mn_, mx_):
        mean_ += np.where(c, slope, 0.0)
        first = c & (n_ == 0)
        mn_ = np.where(first, slope, mn_)
        mx_ = np.where(first, slope, mx_)
        rest = c & (n_ > 0)
        mn_ = np.where(rest & (slope < mn_), slope, mn_)
        mx_ = np.where(rest & (slope > mx_), slope, mx_)
        n_ = n_ + c
        return mean_, n_, mn_, mx_

    for j in range(M_max):
        act = fin[j]
        y = Ev[j]
        pos = Ep[j]
        mn = act & ~Et[j]
        lastMinV = np.where(mn, y, lastMinV)
        lastMinPos = np.where(mn, pos, lastMinPos)
        dpos = lastMinPos - lastMaxPos
        c = mn & (dpos > 0)
        slope = (lastMaxV - lastMinV) / np.where(c, dpos * T, 1.0)
        meanFS, nFalling, minFS, maxFS = _acc_slope(
            c, slope, meanFS, nFalling, minFS, maxFS)
        lastIsMax = np.where(c, 0, lastIsMax)
        mx = act & Et[j]
        lastMaxV = np.where(mx, y, lastMaxV)
        lastMaxPos = np.where(mx, pos, lastMaxPos)
        dpos = lastMaxPos - lastMinPos
        c = mx & (dpos > 0)
        slope = (lastMaxV - lastMinV) / np.where(c, dpos * T, 1.0)
        meanRS, nRising, minRS, maxRS = _acc_slope(
            c, slope, meanRS, nRising, minRS, maxRS)
        lastIsMax = np.where(c, 1, lastIsMax)

    # trailing element closes the last half-slope
    c = (lastIsMax == 1) & (Nf - 1 - lastMaxPos > 0)
    slope = (xl - lastMaxV) / np.where(c, (Nf - 1 - lastMaxPos) * T, 1.0)
    meanFS, nFalling, minFS, maxFS = _acc_slope(
        c, slope, meanFS, nFalling, minFS, maxFS)
    c = (lastIsMax == 0) & (Nf - 1 - lastMinPos > 0)
    slope = (xl - lastMinV) / np.where(c, (Nf - 1 - lastMinPos) * T, 1.0)
    meanRS, nRising, minRS, maxRS = _acc_slope(
        c, slope, meanRS, nRising, minRS, maxRS)
    cneg = lastIsMax == -1
    slope = (xl - x0) / Nf
    rpos = cneg & (slope > 0)
    meanRS = np.where(rpos, slope, meanRS)
    maxRS = np.where(rpos, slope, maxRS)
    minRS = np.where(rpos, slope, minRS)
    nRising = np.where(rpos, 1.0, nRising)
    rneg = cneg & (slope < 0)
    meanFS = np.where(rneg, slope, meanFS)
    maxFS = np.where(rneg, slope, maxFS)
    minFS = np.where(rneg, slope, minFS)
    nFalling = np.where(rneg, 1.0, nFalling)

    r_div = nRising > 1
    meanRS = np.where(r_div, meanRS / np.where(r_div, nRising, 1.0), meanRS)
    f_div = nFalling > 1
    meanFS = np.where(f_div, meanFS / np.where(f_div, nFalling, 1.0), meanFS)

    # --- slope stddev (reference quirk kept: rising tests dpos != 0) ---
    stddevRS, stddevFS = z(n_groups), z(n_groups)
    lastMaxV = x0.copy()
    lastMaxPos = z(n_groups)
    lastMinV = x0.copy()
    lastMinPos = z(n_groups)
    for j in range(M_max):
        act = fin[j]
        y = Ev[j]
        pos = Ep[j]
        mn = act & ~Et[j]
        lastMinV = np.where(mn, y, lastMinV)
        lastMinPos = np.where(mn, pos, lastMinPos)
        dpos = lastMinPos - lastMaxPos
        c = mn & (dpos > 0)
        slope = (lastMaxV - lastMinV) / np.where(c, dpos * T, 1.0)
        dd = slope - meanFS
        stddevFS += np.where(c, dd * dd, 0.0)
        mx = act & Et[j]
        lastMaxV = np.where(mx, y, lastMaxV)
        lastMaxPos = np.where(mx, pos, lastMaxPos)
        dpos = lastMaxPos - lastMinPos
        c = mx & (dpos != 0)
        slope = (lastMaxV - lastMinV) / np.where(c, dpos * T, 1.0)
        dd = slope - meanRS
        stddevRS += np.where(c, dd * dd, 0.0)
    stddevRS = np.where(r_div,
                        stddevRS / np.where(r_div, nRising, 1.0), stddevRS)
    stddevFS = np.where(f_div,
                        stddevFS / np.where(f_div, nFalling, 1.0), stddevFS)
    stddevRS = np.where(stddevRS > 0,
                        np.sqrt(np.where(stddevRS > 0, stddevRS, 1.0)), 0.0)
    stddevFS = np.where(stddevFS > 0,
                        np.sqrt(np.where(stddevFS > 0, stddevFS, 1.0)), 0.0)

    if timeNorm == "second":
        peakDist = peakDist * T
        peakSDist = peakSDist * T
        minDist = minDist * T
        minSDist = minSDist * T
    elif timeNorm == "segment":
        peakDist = peakDist / Nf
        peakSDist = peakSDist / Nf
        minDist = minDist / Nf
        minSDist = minSDist / Nf
    numPeaks = nPeaks / (Nf * T) if timeNorm == "second" else nPeaks

    def unity(v):
        return np.clip(v, -1.0, 1.0) if doRatioLimit else v

    def ratio_limit_vec(q, limit1, excess):
        out_ = q.copy()
        hi = q > limit1
        if hi.any():
            out_[hi] = np.tanh(
                (np.sqrt(q[hi] - limit1 + 1.0) - 1.0)
                / (excess * 0.5)) * excess + limit1
        lo = q < -limit1
        if lo.any():
            out_[lo] = np.tanh(
                -(np.sqrt(-(q[lo] + limit1) + 1.0) - 1.0)
                / (excess * 0.5)) * excess - limit1
        return out_

    def mean_ratio(v):
        nz = gmean != 0.0
        q = np.where(nz, v / np.where(nz, gmean, 1.0), 0.0)
        if doRatioLimit:
            return np.where(nz, ratio_limit_vec(q, 10.0, 10.0), 20.0)
        return np.where(nz, q, v)

    rnz = rng_ != 0.0
    srng = np.where(rnz, rng_, 1.0)

    return {
        "numPeaks": numPeaks,
        "meanPeakDist": peakDist,
        "peakDistStddev": peakSDist,
        "peakRangeAbs": peakMax - peakMin,
        "peakRangeRel": np.where(
            rnz, unity(np.abs((peakMax - peakMin) / srng)),
            peakMax - peakMin),
        "peakMean": peakMean,
        "peakMeanMeanDist": peakMean - gmean,
        "peakMeanMeanRatio": mean_ratio(peakMean),
        "ptpAmpMeanAbs": peakDiff,
        "ptpAmpMeanRel": np.where(rnz, unity(peakDiff / srng), peakDiff),
        "ptpAmpStddevAbs": peakSDiff,
        "ptpAmpStddevRel": np.where(rnz, unity(peakSDiff / srng), peakSDiff),
        "minRangeAbs": minMax - minMin,
        "minRangeRel": np.where(
            rnz, unity(np.abs((minMax - minMin) / srng)), minMax - minMin),
        "minMean": minMean,
        "minMeanMeanDist": gmean - minMean,
        "minMeanMeanRatio": mean_ratio(minMean),
        "mtmAmpMeanAbs": minDiff,
        "mtmAmpMeanRel": np.where(rnz, unity(minDiff / srng), minDiff),
        "mtmAmpStddevAbs": minSDiff,
        "mtmAmpStddevRel": np.where(rnz, unity(minSDiff / srng), minSDiff),
        "meanRisingSlope": meanRS,
        "maxRisingSlope": maxRS,
        "minRisingSlope": minRS,
        "stddevRisingSlope": stddevRS,
        "meanFallingSlope": meanFS,
        "maxFallingSlope": maxFS,
        "minFallingSlope": minFS,
        "stddevFallingSlope": stddevFS,
        "covFallingSlope": np.where(
            meanFS > 0.0, stddevFS / np.where(meanFS > 0.0, meanFS, 1.0),
            0.0),
        "covRisingSlope": np.where(
            meanRS > 0.0, stddevRS / np.where(meanRS > 0.0, meanRS, 1.0),
            0.0),
    }


def _peaks_batched(x, starts, ends, gmin, gmax, gmean, opts):
    """Cross-group vectorized f_peaks (functionals.cpp legacy peak picker,
    kernels.py:1468) — lane-parallel transcription of the single-pass
    hysteresis automaton. Unlike peaks2 (whose loop visits only extrema),
    the reference loop visits EVERY element i in [2, N) because the close
    condition `cur < lastMax - 0.09*rng or i == N-1` is re-checked per
    element. The state, however, only CHANGES at strict-local-extremum
    detections (element q = i-1 with x[q-1] < x[q] > x[q+1] or the mirror),
    so the loop is re-expressed on the detection lattice: step j handles
    detection j of every group at once (branch updates + the same-index
    close check), then the run of plain elements before detection j+1 is
    folded into one precomputed per-run minimum — a run fires the close
    check iff `min(run) < lastMax - 0.09*rng` (the per-element check fires
    at the first crossing; peakflag then drops to 0 and cannot re-arm
    inside a run, so at most one emission per run and its position is
    never used). Per-group operation order is IDENTICAL to kernels.f_peaks;
    equality pinned by tests/test_batched_kernels.py."""
    n_groups = starts.size
    sizes = ends - starts
    Nf = sizes.astype(np.float64)
    timeNorm = opts.get("timeNorm", "frames")
    T = opts.get("T", 1.0)
    rng_ = gmax - gmin

    n_el = x.size
    rep_starts = np.repeat(starts, sizes)
    iig = np.arange(n_el, dtype=np.int64) - rep_starts
    size_rep = np.repeat(sizes, sizes)
    grp_rep = np.repeat(np.arange(n_groups, dtype=np.int64), sizes)
    xm1 = np.empty_like(x)
    xp1 = np.empty_like(x)
    xm1[1:] = x[:-1]
    xm1[0] = np.inf
    xp1[:-1] = x[1:]
    xp1[-1] = np.inf
    # detection at loop index i=q+1 needs i in [2, N): q in [1, N-2]
    okq = (iig >= 1) & (iig <= size_rep - 2)
    is_max_el = okq & (xm1 < x) & (x > xp1)
    is_min_el = okq & (xm1 > x) & (x < xp1)
    ev_el = is_max_el | is_min_el
    e_idx = np.flatnonzero(ev_el)
    e_grp = grp_rep[e_idx]
    Mg = np.bincount(e_grp, minlength=n_groups)
    M_max = int(Mg.max()) if e_idx.size else 0
    Wl = max(M_max, 1)
    # (W, n_groups) lattice — step j reads contiguous rows (see peaks2)
    Ecur = np.zeros((Wl, n_groups))              # cur = x[q+1] at the event
    Et = np.zeros((Wl, n_groups), dtype=bool)    # detection is a local max
    Ei = np.zeros((Wl, n_groups))                # loop index i = q+1 (local)
    Va = np.zeros((Wl, n_groups), dtype=bool)
    Rmin = np.full((Wl, n_groups), np.inf)       # min over run AFTER event j
    Rlast = np.zeros((Wl, n_groups), dtype=bool)  # run contains i == N-1
    if e_idx.size:
        first = np.concatenate(([0], np.cumsum(Mg)[:-1]))
        jr = np.arange(e_idx.size) - first[e_grp]
        Ecur[jr, e_grp] = x[e_idx + 1]           # q <= N-2 -> q+1 in-group
        Et[jr, e_grp] = is_max_el[e_idx]
        Ei[jr, e_grp] = (iig[e_idx] + 1).astype(np.float64)
        Va[jr, e_grp] = True
        # runs: element at loop index i belongs to the run after its
        # group's latest event with q+1 <= i; event positions themselves
        # are handled in the lattice step
        ev_pos = np.zeros(n_el, dtype=bool)
        ev_pos[e_idx + 1] = True
        cum_ev = np.cumsum(ev_pos)
        base = cum_ev[starts] - ev_pos[starts]   # q >= 1 -> no event at s
        j_rep = cum_ev - np.repeat(base, sizes)  # events at local pos <= i
        run_m = ~ev_pos & (j_rep >= 1)
        idx_m = np.flatnonzero(run_m)
        if idx_m.size:
            key = grp_rep[idx_m] * np.int64(Wl) + (j_rep[idx_m] - 1)
            seg = np.ones(idx_m.size, dtype=bool)
            seg[1:] = key[1:] != key[:-1]
            seg_starts = np.flatnonzero(seg)
            mins = np.minimum.reduceat(x[idx_m], seg_starts)
            Rmin[(j_rep[idx_m[seg_starts]] - 1),
                 grp_rep[idx_m[seg_starts]]] = mins
        # the final run (after the group's LAST event) reaches i = N-1 iff
        # the last event sits before it; the forced `i == N-1` close then
        # fires inside that run
        gl = np.flatnonzero(Mg > 0)
        lp = Ei[Mg[gl] - 1, gl]                  # last event's local i
        Rlast[Mg[gl] - 1, gl] = lp < (sizes[gl] - 1)

    lastMin = np.zeros(n_groups)
    lastMax = np.zeros(n_groups)
    curmaxPos = np.zeros(n_groups)
    lastmaxPos = np.full(n_groups, -1.0)
    peakflag = np.zeros(n_groups, dtype=bool)
    nPeaks = np.zeros(n_groups)
    peakMeanSum = np.zeros(n_groups)
    nd = np.zeros(n_groups, dtype=np.int64)      # emitted distance count
    Dist = np.zeros((Wl + 1, n_groups))
    thr_hi = 0.11 * rng_
    thr_lo = 0.09 * rng_

    def emit(m):
        rows = np.flatnonzero(m)
        if rows.size == 0:
            return
        nPeaks[rows] += 1.0
        peakMeanSum[rows] += lastMax[rows]
        r2 = rows[lastmaxPos[rows] >= 0.0]
        Dist[nd[r2], r2] = curmaxPos[r2] - lastmaxPos[r2]
        nd[r2] += 1
        lastmaxPos[rows] = curmaxPos[rows]
        peakflag[rows] = False

    for j in range(M_max):
        act = Va[j]
        cur = Ecur[j]
        ismx = act & Et[j]
        ismn = act & ~Et[j]
        # local max branch (kernels.py:1485-1492): lastMax takes CUR (the
        # element after the extremum — reference quirk), the >0.11*rng
        # check can re-arm and re-point curmaxPos even when already set
        nf = ismx & ~peakflag
        up = ismx & peakflag & (cur > lastMax)
        lastMax = np.where(nf | up, cur, lastMax)
        curmaxPos = np.where(up, Ei[j], curmaxPos)
        trig = ismx & (lastMax - lastMin > thr_hi)
        peakflag = peakflag | trig
        curmaxPos = np.where(trig, Ei[j], curmaxPos)
        # local min branch
        lastMin = np.where(ismn, cur, lastMin)
        # close check at the event's own loop index
        emit(act & peakflag
             & ((cur < lastMax - thr_lo) | (Ei[j] == Nf - 1.0)))
        # close check folded over the run before the next event (peakflag
        # just cleared by the event-index close cannot re-fire here)
        emit(act & peakflag & ((Rmin[j] < lastMax - thr_lo) | Rlast[j]))

    nPeakDist = nd.astype(np.float64)
    has_d = nd > 0
    safe_d = np.where(has_d, nPeakDist, 1.0)
    peakDist = np.where(has_d, Dist.sum(axis=0) / safe_d, Nf + 1.0)
    live = np.arange(Wl + 1)[:, None] < nd[None, :]
    dev2 = np.where(live, (Dist - peakDist[None, :]) ** 2, 0.0)
    stddev = np.where(has_d, np.sqrt(dev2.sum(axis=0) / safe_d), 0.0)
    if timeNorm == "second":
        peakDist = peakDist * T
        stddev = stddev * T
    elif timeNorm == "segment":
        peakDist = peakDist / Nf
        stddev = stddev / Nf
    has_p = nPeaks > 0
    peakMean = np.where(has_p, peakMeanSum / np.where(has_p, nPeaks, 1.0),
                        0.0)
    return {
        "numPeaks": nPeaks,
        "meanPeakDist": peakDist,
        "peakMean": peakMean,
        "peakMeanMeanDist": peakMean - gmean,
        "peakDistStddev": stddev,
    }


def compute_batched(x: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                    families, options=None) -> dict[str, np.ndarray]:
    """x: concatenated values; [starts[i], ends[i]) are group slices that
    must tile x, and every group must be NON-EMPTY (ends[i] > starts[i]) —
    np.add.reduceat silently returns x[starts[i]] for an empty segment (and
    raises for starts[i] == x.size), so empty groups are rejected here
    rather than producing wrong numbers. Returns {functional_name:
    per-group array} for the requested subset of BATCHED_FAMILIES, names
    identical to kernels.py outputs."""
    options = options or {}
    if not (ends > starts).all():
        raise ValueError("compute_batched: empty group slice "
                         "(ends[i] <= starts[i]) — groups must be non-empty")
    n_groups = starts.size
    sizes = (ends - starts).astype(np.float64)
    N = sizes
    rep_starts = np.repeat(starts, (ends - starts))
    ii = np.arange(x.size, dtype=np.float64) - rep_starts  # 0..N-1 per group

    out: dict[str, np.ndarray] = {}

    s1 = _seg_sum(x, starts)
    mean = s1 / N
    mean_rep = np.repeat(mean, (ends - starts))

    gmax = np.maximum.reduceat(x, starts)
    gmin = np.minimum.reduceat(x, starts)

    need_sorted = "percentiles" in families
    if need_sorted:
        xs = x.copy()
        for s, e in zip(starts, ends):
            xs[s:e].sort()

    if "means" in families:
        absx = np.abs(x)
        nz = x != 0.0
        pos = x > 0.0
        neg = x < 0.0
        nnz = _seg_sum(nz.astype(np.float64), starts)
        npos = _seg_sum(pos.astype(np.float64), starts)
        nneg = _seg_sum(neg.astype(np.float64), starts)
        absmean = _seg_sum(absx, starts) / N
        qsum = _seg_sum(x * x, starts)
        qmean = qsum / N
        with np.errstate(divide="ignore", invalid="ignore"):
            logabs = np.where(nz, np.log(np.where(nz, absx, 1.0)), 0.0)
        nz_s = _seg_sum(np.where(nz, x, 0.0), starts)
        nzabs_s = _seg_sum(np.where(nz, absx, 0.0), starts)
        nzq_s = _seg_sum(np.where(nz, x * x, 0.0), starts)
        nzlog_s = _seg_sum(logabs, starts)
        pos_s = _seg_sum(np.where(pos, x, 0.0), starts)
        posq_s = _seg_sum(np.where(pos, x * x, 0.0), starts)
        neg_s = _seg_sum(np.where(neg, x, 0.0), starts)
        negq_s = _seg_sum(np.where(neg, x * x, 0.0), starts)

        safe_nnz = np.where(nnz > 0, nnz, 1.0)
        safe_np = np.where(npos > 0, npos, 1.0)
        safe_nn = np.where(nneg > 0, nneg, 1.0)
        out["amean"] = mean
        out["absmean"] = absmean
        out["qmean"] = qmean
        out["nzamean"] = np.where(nnz > 0, nz_s / safe_nnz, 0.0)
        out["nzabsmean"] = np.where(nnz > 0, nzabs_s / safe_nnz, 0.0)
        out["nzqmean"] = np.where(nnz > 0, nzq_s / safe_nnz, 0.0)
        nzgmean = np.where(nnz > 0, np.exp(nzlog_s / safe_nnz), 0.0)
        out["nzgmean"] = nzgmean
        tn = options.get("means", {}).get("timeNorm", "frames")
        if tn == "segment":
            out["nnz"] = nnz / N
        elif tn == "second":
            out["nnz"] = nnz / options.get("means", {}).get("T", 1.0)
        else:
            out["nnz"] = nnz
        out["flatness"] = np.where(absmean != 0.0, nzgmean
                                   / np.where(absmean != 0, absmean, 1.0), 1.0)
        posamean = np.where(npos > 0, pos_s / safe_np, 0.0)
        posqmean = np.where(npos > 0, posq_s / safe_np, 0.0)
        negamean = np.where(nneg > 0, neg_s / safe_nn, 0.0)
        negqmean = np.where(nneg > 0, negq_s / safe_nn, 0.0)
        out["posamean"] = posamean
        out["negamean"] = negamean
        out["posqmean"] = posqmean
        out["posrqmean"] = np.sqrt(posqmean)
        out["negqmean"] = negqmean
        out["negrqmean"] = np.sqrt(negqmean)
        out["rqmean"] = np.sqrt(qmean)
        out["nzrqmean"] = np.sqrt(out["nzqmean"])

    if "moments" in families:
        d = x - mean_rep
        d2 = d * d
        m2 = _seg_sum(d2, starts) / N
        m3 = _seg_sum(d2 * d, starts)
        m4 = _seg_sum(d2 * d2, starts)
        sqm2 = np.where(m2 > 0, np.sqrt(np.where(m2 > 0, m2, 1.0)), 0.0)
        out["variance"] = m2
        out["stddev"] = sqm2
        d3 = N * m2 * sqm2
        d4 = N * m2 * m2
        out["skewness"] = np.where(d3 > 0, m3 / np.where(d3 > 0, d3, 1.0), 0.0)
        out["kurtosis"] = np.where(d4 > 0, m4 / np.where(d4 > 0, d4, 1.0), 0.0)
        if "amean" not in out:
            out["amean"] = mean
        mean1 = np.where(mean != 0.0, mean, 1.0)
        out["stddevNorm"] = np.where(m2 > 0, sqm2 / mean1, 0.0)
        amean1 = np.where(mean != 0.0, np.abs(mean), 1.0)
        out["coeffOfVariation"] = np.where(m2 > 0, sqm2 / amean1, 0.0)

    if "extremes" in families:
        idx = np.arange(x.size, dtype=np.int64)
        maxpos = (np.minimum.reduceat(
            np.where(x == np.repeat(gmax, (ends - starts)), idx, _BIG), starts)
            - starts).astype(np.float64)
        minpos = (np.minimum.reduceat(
            np.where(x == np.repeat(gmin, (ends - starts)), idx, _BIG), starts)
            - starts).astype(np.float64)
        tn = options.get("extremes", {}).get("timeNorm", "frames")
        if tn == "segment":
            maxpos = maxpos / N
            minpos = minpos / N
        out["max"] = gmax
        out["min"] = gmin
        out["range"] = gmax - gmin
        out["maxPos"] = maxpos
        out["minPos"] = minpos
        if "amean" not in out:
            out["amean"] = mean
        out["maxameandist"] = gmax - mean
        out["minameandist"] = mean - gmin

    if "percentiles" in families:
        popts = options.get("percentiles", {})
        plist = list(popts.get("percentiles", (0.20, 0.50, 0.80)))
        pranges = list(popts.get("pctlranges", ((0, 2),)))
        pquots = list(popts.get("pctlquotients", ()))

        def interp(p):
            idxf = p * (N - 1.0)
            i1 = np.floor(idxf).astype(np.int64)
            i2 = np.ceil(idxf).astype(np.int64)
            np.clip(i1, 0, (N - 1).astype(np.int64), out=i1)
            np.clip(i2, 0, (N - 1).astype(np.int64), out=i2)
            v1 = xs[starts + i1]
            v2 = xs[starts + i2]
            w1 = idxf - i1
            w2 = i2 - idxf
            return np.where(i1 != i2, v1 * w2 + v2 * w1, v1)

        q1, q2, q3 = interp(0.25), interp(0.50), interp(0.75)
        out["quartile1"] = q1
        out["quartile2"] = q2
        out["quartile3"] = q3
        out["iqr1-2"] = q2 - q1
        out["iqr2-3"] = q3 - q2
        out["iqr1-3"] = q3 - q1
        pvals = []
        for p in plist:
            v = interp(p)
            out[f"percentile{p * 100:.1f}"] = v
            pvals.append(v)
        for a, b in pranges:
            out[f"pctlrange{a}-{b}"] = np.abs(pvals[b] - pvals[a])
        for a, b in pquots:
            # vectorized f_percentiles pctlquotient: numerator-only guard +
            # smileMath_ratioLimit(q, 50, 100) — same quirks as kernels.py
            va, vb = pvals[a], pvals[b]
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.where(vb != 0.0, va / np.where(vb != 0.0, vb, 1.0),
                             np.where(va > 0, np.inf, -np.inf))
                hi = q > 50.0
                lo = q < -50.0
                qh = np.tanh((np.sqrt(np.where(hi, q, 50.0) - 49.0) - 1.0)
                             / 50.0) * 100.0 + 50.0
                ql = np.tanh(-(np.sqrt(-np.where(lo, q, -50.0) - 49.0) - 1.0)
                             / 50.0) * 100.0 - 50.0
            q = np.where(hi, qh, np.where(lo, ql, q))
            out[f"pctlquotient{a}-{b}"] = np.where(va != 0.0, q, 0.0)

    if "regression" in families:
        num = _seg_sum(x * ii, starts)
        num2 = _seg_sum(x * ii * ii, starts)
        asum = mean * N
        with np.errstate(divide="ignore", invalid="ignore"):
            centroid = np.where(asum != 0.0, num / np.where(asum != 0, asum, 1), 0.0)
        centroid = np.where(np.isfinite(centroid), centroid, 0.0)
        NNm1 = N * (N - 1.0)
        S1 = NNm1 / 2.0
        S2 = NNm1 * (2.0 * N - 1.0) / 6.0
        safeS2 = np.where(S2 != 0, S2, 1.0)
        S1dS2 = S1 / safeS2
        tmp = N - S1 * S1dS2
        first_vals = x[starts]
        t_off = np.where(
            N > 1,
            np.where(tmp != 0, (asum - num * S1dS2) / np.where(tmp != 0, tmp, 1), 0.0),
            first_vals)
        m = np.where(N > 1, (num - t_off * S1) / safeS2, 0.0)
        S3 = S1 * S1
        N1 = N - 1.0
        S4 = S2 * (3.0 * (N1 * N1 + N1) - 1.0) / 5.0
        S3S3 = S3 * S3
        S2S2 = S2 * S2
        S1S2 = S1 * S2
        det = S4 * S2 * N + 2.0 * S3 * S1S2 - S2S2 * S2 - S3S3 * N - S3 * S4
        safed = np.where(det != 0, det, 1.0)
        a = np.where((N > 1) & (det != 0),
                     ((S2 * N - S3) * num2 + (S1S2 - S3 * N) * num
                      + (S3 * S1 - S2S2) * asum) / safed, 0.0)
        b = np.where((N > 1) & (det != 0),
                     ((S1S2 - S3 * N) * num2 + (S4 * N - S2S2) * num
                      + (S3 * S2 - S4 * S1) * asum) / safed, 0.0)
        c = np.where(N > 1,
                     np.where(det != 0,
                              ((S3 * S1 - S2S2) * num2 + (S3 * S2 - S4 * S1) * num
                               + (S4 * S2 - S3S3) * asum) / safed, 0.0),
                     first_vals)
        m_rep = np.repeat(m, (ends - starts))
        t_rep = np.repeat(t_off, (ends - starts))
        e = x - (m_rep * ii + t_rep)
        lea = _seg_sum(np.abs(e), starts) / N
        leq = _seg_sum(e * e, starts) / N
        a_rep = np.repeat(a, (ends - starts))
        b_rep = np.repeat(b, (ends - starts))
        c_rep = np.repeat(c, (ends - starts))
        eq = x - (a_rep * ii * ii + b_rep * ii + c_rep)
        qea = _seg_sum(np.abs(eq), starts) / N
        qeq = _seg_sum(eq * eq, starts) / N

        def fin(v):
            return np.where(np.isfinite(v), v, 0.0)

        out["linregc1"] = fin(m)
        out["linregc2"] = fin(t_off)
        out["linregerrA"] = fin(lea)
        out["linregerrQ"] = fin(leq)
        out["qregc1"] = fin(a)
        out["qregc2"] = fin(b)
        out["qregc3"] = fin(c)
        out["qregerrA"] = fin(qea)
        out["qregerrQ"] = fin(qeq)
        out["centroid"] = centroid

    if "crossings" in families or "times" in families:
        # interior masks: position-within-group helpers
        pos_in = ii
        size_rep = np.repeat(sizes, (ends - starts))

    if "crossings" in families:
        # i in [1, N-2]: x[i-1], x[i], x[i+1] with group-interior mask
        xm1 = np.empty_like(x)
        xp1 = np.empty_like(x)
        xm1[1:] = x[:-1]
        xm1[0] = 0.0
        xp1[:-1] = x[1:]
        xp1[-1] = 0.0
        interior = (pos_in >= 1) & (pos_in <= size_rep - 2)
        zc = interior & (((xm1 * xp1 <= 0.0) & (x == 0.0)) | (xm1 * x < 0.0))
        am1 = xm1 - mean_rep
        a0 = x - mean_rep
        ap1 = xp1 - mean_rep
        mc = interior & (((am1 * ap1 <= 0.0) & (a0 == 0.0)) | (am1 * a0 < 0.0))
        out["zcr"] = _seg_sum(zc.astype(np.float64), starts) / N
        out["mcr"] = _seg_sum(mc.astype(np.float64), starts) / N
        if "amean" not in out:
            out["amean"] = mean

    if "times" in families:
        tn = options.get("times", {}).get("timeNorm", "segment")
        if tn == "segment":
            Norm, Norm1, Norm2 = N, N - 1.0, N - 2.0
        else:  # frames
            Norm = np.ones_like(N)
            Norm1 = (N - 1.0) / N
            Norm2 = (N - 2.0) / N
        rng = gmax - gmin
        for frac, nm in ((0.25, "25"), (0.50, "50"), (0.75, "75"),
                         (0.90, "90")):
            lvl = np.repeat(frac * rng + gmin, (ends - starts))
            nle = _seg_sum((x <= lvl).astype(np.float64), starts)
            out[f"upleveltime{nm}"] = (N - nle) / Norm
            out[f"downleveltime{nm}"] = nle / Norm
        xm1 = np.empty_like(x)
        xm1[1:] = x[:-1]
        xm1[0] = 0.0
        not_first = pos_in >= 1
        rise = not_first & (xm1 < x)
        fall = not_first & (xm1 > x)
        nR = _seg_sum(rise.astype(np.float64), starts)
        nF = _seg_sum(fall.astype(np.float64), starts)
        safe1 = np.where(Norm1 != 0, Norm1, 1.0)
        out["risetime"] = np.where(Norm1 != 0, nR / safe1, 0.0)
        out["falltime"] = np.where(Norm1 != 0, nF / safe1, 0.0)
        xp1 = np.empty_like(x)
        xp1[:-1] = x[1:]
        xp1[-1] = 0.0
        interior = (pos_in >= 1) & (pos_in <= np.repeat(sizes, (ends - starts)) - 2)
        dd = (xp1 - x) - (x - xm1)
        nRC = _seg_sum((interior & (dd < 0)).astype(np.float64), starts)
        nLC = _seg_sum((interior & (dd > 0)).astype(np.float64), starts)
        safe2 = np.where(Norm2 != 0, Norm2, 1.0)
        out["leftctime"] = np.where(Norm2 != 0, nLC / safe2, 0.0)
        out["rightctime"] = np.where(Norm2 != 0, nRC / safe2, 0.0)
        out["duration"] = N

    if "samples" in families:
        # f_samples (functionalSamples.cpp:107): si = (int)((N-1)*p) — the
        # C cast TRUNCATES; (N-1)*p >= 0 so int64 astype matches exactly.
        # Pure per-group gather -> one fancy-index across all groups.
        positions = options.get("samples", {}).get(
            "positions", (0.0, 0.25, 0.5, 0.75, 1.0))
        Ni = (ends - starts).astype(np.int64)
        for p in positions:
            idx = ((Ni - 1).astype(np.float64) * p).astype(np.int64)
            np.clip(idx, 0, Ni - 1, out=idx)
            out[f"samplepos{p:g}"] = x[starts + idx]

    if "segments" in families:
        # f_segments under the DEFAULT config (nonX, X=0, segMinLng=3,
        # pauseMinLng=2, maxNumSeg=20; any explicit algorithm/threshold
        # option falls back to the reference automaton). The state machine
        # reduces exactly to run-length algebra: consecutive non-match
        # runs of length >= pauseMinLng split a group into CLUSTERS
        # (shorter gaps never reset the match counter — state 1/2 only
        # advance segEnd); a cluster emits one segment iff its cumulative
        # match count reaches segMinLng, with the reference's length
        # quirk length = last_match_pos - first_match_pos (the close
        # formula i - segEnd - segStartIndex, both at gap-close and at
        # EOF); only the first maxNumSeg emitted segments per group are
        # recorded (add_segment's cap).
        segMinLng, pauseMinLng, maxNumSeg = 3, 2, 20
        m = x != 0.0
        n_el = x.size
        n_groups_i = starts.size
        grp_rep = np.repeat(np.arange(n_groups_i, dtype=np.int64),
                            (ends - starts))
        new_run = np.ones(n_el, dtype=bool)
        if n_el > 1:
            new_run[1:] = (m[1:] != m[:-1]) | (grp_rep[1:] != grp_rep[:-1])
        r_start = np.flatnonzero(new_run)
        r_len = np.diff(np.append(r_start, n_el))
        r_match = m[r_start]
        r_grp = grp_rep[r_start]
        n_runs = r_start.size
        breaking = (~r_match) & (r_len >= pauseMinLng)
        new_cluster = np.ones(n_runs, dtype=bool)
        if n_runs > 1:
            new_cluster[1:] = (r_grp[1:] != r_grp[:-1]) | breaking[:-1]
        c_start = np.flatnonzero(new_cluster)
        n_clusters = c_start.size
        c_matches = np.add.reduceat(np.where(r_match, r_len, 0), c_start)
        first_m = np.minimum.reduceat(
            np.where(r_match, r_start, _BIG), c_start)
        last_m = np.maximum.reduceat(
            np.where(r_match, r_start + r_len - 1, -1), c_start)
        c_grp = r_grp[c_start]
        emitted = c_matches >= segMinLng
        seg_len_c = np.where(emitted, last_m - first_m, 0).astype(np.float64)
        # first maxNumSeg emitted clusters per group (clusters are in
        # group-contiguous order, so a per-group running count is the
        # global cumsum minus its value at the group's first cluster)
        new_grp_c = np.ones(n_clusters, dtype=bool)
        if n_clusters > 1:
            new_grp_c[1:] = c_grp[1:] != c_grp[:-1]
        gfirst = np.flatnonzero(new_grp_c)
        cum = np.cumsum(emitted)
        base = np.where(gfirst > 0, cum[gfirst - 1], 0)
        g_sizes = np.diff(np.append(gfirst, n_clusters))
        rank = cum - np.repeat(base, g_sizes)
        kept = emitted & (rank <= maxNumSeg)

        nSeg = np.add.reduceat(kept.astype(np.float64), gfirst)
        sumLen = np.add.reduceat(np.where(kept, seg_len_c, 0.0), gfirst)
        maxLen = np.maximum.reduceat(
            np.where(kept, seg_len_c, -np.inf), gfirst)
        minLen = np.minimum.reduceat(
            np.where(kept, seg_len_c, np.inf), gfirst)
        maxLen = np.where(nSeg > 0, maxLen, 0.0)
        minLen = np.where(nSeg > 0, minLen, 0.0)
        safe_n = np.where(nSeg > 0, nSeg, 1.0)
        meanL = np.where(nSeg > 1, sumLen / safe_n, sumLen)
        mean_rep_c = np.repeat(meanL, g_sizes)
        dev = np.add.reduceat(
            np.where(kept, (seg_len_c - mean_rep_c) ** 2, 0.0), gfirst)
        lenDev = np.where(nSeg > 1, np.sqrt(dev / safe_n), 0.0)

        sopts = options.get("segments", {})
        tn = sopts.get("timeNorm", "segment")
        T = sopts.get("T", 1.0)
        if tn == "second":
            out["numSegments"] = nSeg / (N * T if T != 0.0 else N)
            Norm = T if T != 0.0 else 1.0
            out["meanSegLen"] = meanL * Norm
            out["maxSegLen"] = maxLen * Norm
            out["minSegLen"] = minLen * Norm
            out["segLenStddev"] = lenDev * Norm
        elif tn == "segment":
            out["numSegments"] = nSeg / maxNumSeg
            out["meanSegLen"] = meanL / N
            out["maxSegLen"] = maxLen / N
            out["minSegLen"] = minLen / N
            out["segLenStddev"] = lenDev / N
        else:
            out["numSegments"] = nSeg
            out["meanSegLen"] = meanL
            out["maxSegLen"] = maxLen
            out["minSegLen"] = minLen
            out["segLenStddev"] = lenDev

    if "onset" in families:
        # f_onset with the DEFAULT equal thresholds (0.0/0.0, no abs):
        # with thresholdOnset == thresholdOffset the automaton state after
        # element i is exactly (x[i] > t), so onsets are the rising edges
        # of the boolean series and offsets the falling ones — pure
        # vectorized edge detection. Any explicit threshold/useAbsVal
        # option routes the family back to the per-group reference path
        # (BATCHED_SUPPORTED_OPTIONS).
        b = x > 0.0
        bm1 = np.empty_like(b)
        bm1[1:] = b[:-1]
        bm1[0] = False
        not_first = ii >= 1.0
        up = not_first & b & ~bm1
        down = not_first & ~b & bm1
        idx = np.arange(x.size, dtype=np.int64)
        n_on = _seg_sum(up.astype(np.float64), starts)
        n_off = _seg_sum(down.astype(np.float64), starts)
        first_up = np.minimum.reduceat(
            np.where(up, idx, _BIG), starts) - starts
        last_down = np.maximum.reduceat(
            np.where(down, idx, -1), starts) - starts
        onset_pos = np.where(n_on > 0, first_up, 0).astype(np.float64)
        offset_pos = np.where(n_off > 0, last_down,
                              (ends - starts) - 1).astype(np.float64)
        oopts = options.get("onset", {})
        tn = oopts.get("timeNorm", "segment")
        T = oopts.get("T", 1.0)
        if tn == "segment":
            op, fp = onset_pos / N, offset_pos / N
        elif tn == "second":
            op, fp = onset_pos * T, offset_pos * T
        else:
            op, fp = onset_pos, offset_pos
        out["onsetPos"] = op
        out["offsetPos"] = fp
        out["numOnsets"] = n_on
        out["numOffsets"] = n_off
        out["onsetRate"] = n_on / (N * T)

    if "dct" in families:
        # f_dct (functionalDCT.cpp:38-40): c_k = sqrt(2/N) *
        # sum_n x[n] cos(pi*k/N*(n+0.5)) — per-element basis with the
        # group-local index ii and per-group N, one reduceat per k.
        dopts = options.get("dct", {})
        first_c = dopts.get("firstCoeff", 1)
        last_c = dopts.get("lastCoeff", 6)
        N_rep = np.repeat(N, (ends - starts))
        factor = np.sqrt(2.0 / N)
        for k in range(first_c, last_c + 1):
            basis = np.cos(np.pi * k / N_rep * (ii + 0.5))
            out[f"dct{k}"] = factor * _seg_sum(x * basis, starts)

    if {"lpc", "acf", "amdf", "lsp", "formants"} & set(families):
        size_rep_f = np.repeat(N, (ends - starts))

    if "lpc" in families:
        # f_lpc (functionalLpc.cpp:20-22, kernels.py:1574): autocorrelation
        # via masked lag sums, then Levinson-Durbin vectorized ACROSS
        # groups — the recursion's per-group scalar op order is unchanged
        # (loops run over the lag index, numpy over the group axis)
        order = options.get("lpc", {}).get("order", 4)
        a, e, zero, p = _levinson_batched(x, starts, ends, ii,
                                          size_rep_f, order)
        out["lpgain"] = np.where(zero, 0.0, e)
        for k in range(order):
            out[f"lpc{k}"] = np.where(zero | (k + 1 > p), 0.0, a[:, k + 1])

    if "lsp" in families:
        # f_lsp (lsp.cpp analogue, kernels.py:1649): sum/difference
        # polynomials of A(z) both have LEADING AND TRAILING coefficient
        # +-1, so np.roots never trims — the stacked companion eigvals are
        # the identical LAPACK call per group
        order = options.get("lsp", {}).get("order", 4)
        av = _lpc_poly_batched(x, starts, ends, ii, size_rep_f, order)
        pp = np.concatenate([av, np.zeros((n_groups, 1))], axis=1) \
            + np.concatenate([np.zeros((n_groups, 1)), av[:, ::-1]], axis=1)
        qq = np.concatenate([av, np.zeros((n_groups, 1))], axis=1) \
            - np.concatenate([np.zeros((n_groups, 1)), av[:, ::-1]], axis=1)
        angs = []
        for poly in (pp, qq):
            deg = poly.shape[1] - 1
            comp = np.zeros((n_groups, deg, deg))
            comp[:, np.arange(1, deg), np.arange(deg - 1)] = 1.0
            comp[:, 0, :] = -poly[:, 1:] / poly[:, :1]
            ang = np.angle(np.linalg.eigvals(comp))
            ang = np.where((ang > 1e-9) & (ang < np.pi - 1e-9), ang, np.inf)
            angs.append(ang)
        allang = np.sort(np.concatenate(angs, axis=1), axis=1)
        for i in range(order):
            v = allang[:, i]
            out[f"lsp{i}"] = np.where(np.isfinite(v), v, 0.0)

    if "formants" in families:
        # f_formants (formantLpc.cpp analogue, kernels.py:1681): LPC-root
        # frequencies/bandwidths; A(z) has leading 1 so the full-size
        # companion matches np.roots except when trailing coefficients are
        # exactly zero (roots at 0 — filtered out either way)
        fopts = options.get("formants", {})
        order = fopts.get("order", 6)
        n_formants = fopts.get("n_formants", 3)
        T_f = fopts.get("T", 1.0)
        av = _lpc_poly_batched(x, starts, ends, ii, size_rep_f, order)
        trivial = np.all(np.abs(av[:, 1:]) <= 1e-8, axis=1)  # allclose(,0)
        comp = np.zeros((n_groups, order, order))
        comp[:, np.arange(1, order), np.arange(order - 1)] = 1.0
        comp[:, 0, :] = -av[:, 1:]
        roots = np.linalg.eigvals(comp)
        fs = 1.0 / T_f if T_f != 0.0 else 1.0
        ang = np.angle(roots)
        mag = np.abs(roots)
        okr = ((ang > 1e-9) & (ang < np.pi - 1e-9) & (mag > 1e-12)
               & ~trivial[:, None])
        freq = np.where(okr, ang / (2.0 * np.pi) * fs, np.inf)
        with np.errstate(divide="ignore"):
            bw = np.where(okr, -np.log(np.where(mag > 0, mag, 1.0))
                          / np.pi * fs, np.inf)
        sidx = np.lexsort((bw, freq), axis=1)     # tuple sort (freq, bw)
        freq_s = np.take_along_axis(freq, sidx, axis=1)
        bw_s = np.take_along_axis(bw, sidx, axis=1)
        for i in range(n_formants):
            if i < freq_s.shape[1]:
                fv, bv = freq_s[:, i], bw_s[:, i]
                ok = np.isfinite(fv)
                out[f"formantFreq{i + 1}"] = np.where(ok, fv, 0.0)
                out[f"formantBw{i + 1}"] = np.where(ok, bv, 0.0)
            else:
                out[f"formantFreq{i + 1}"] = np.zeros(n_groups)
                out[f"formantBw{i + 1}"] = np.zeros(n_groups)

    if "acf" in families:
        aopts = options.get("acf", {})
        max_lag = aopts.get("max_lag", 4)
        do_norm = aopts.get("normalize", True)
        r0 = _lag_sum(x, starts, ii, size_rep_f, 0)
        safe_r0 = np.where(r0 != 0.0, r0, 1.0)
        for k in range(max_lag + 1):
            rk = r0 if k == 0 else _lag_sum(x, starts, ii, size_rep_f, k)
            if do_norm:
                out[f"acf{k}"] = np.where(r0 != 0.0, rk / safe_r0, 0.0)
            else:
                out[f"acf{k}"] = rk

    if "amdf" in families:
        # f_amdf (amdf.cpp:134-151 method=LIMIT): mean |x[i]-x[i+j]| over
        # the N-j valid pairs; lag >= N -> 0
        max_lag = options.get("amdf", {}).get("max_lag", 4)
        out["amdf0"] = np.zeros(n_groups)
        Ni = ends - starts
        for j in range(1, max_lag + 1):
            s = _lag_sum(x, starts, ii, size_rep_f, j, kind="absdiff")
            ok = j < Ni
            out[f"amdf{j}"] = np.where(ok, s / np.where(ok, Ni - j, 1), 0.0)

    if "modulation" in families:
        # f_modulation (kernels.py:1716): per-group head gather into one
        # (n_groups, fft_win) matrix — truncate-or-zero-pad + hann + one
        # batched rfft; the fixed freq grid makes each modSpec bin a fixed
        # 2-point linear blend of magnitude columns
        mo = options.get("modulation", {})
        fft_win = mo.get("fft_win", 64)
        n_bins = mo.get("n_bins", 6)
        min_freq = mo.get("min_freq", 0.01)
        max_freq = mo.get("max_freq", 0.4)
        T_m = mo.get("T", 1.0)
        Ni = ends - starts
        col = np.arange(fft_win)
        gidx = np.minimum(starts[:, None] + col[None, :], x.size - 1)
        validm = col[None, :] < Ni[:, None]
        xc = np.where(validm, x[gidx] - mean[:, None], 0.0)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * col / fft_win)
        mag = np.abs(np.fft.rfft(xc * win, axis=1)) / fft_win
        freqs = np.fft.rfftfreq(fft_win, d=T_m)
        centers = np.linspace(min_freq, max_freq, n_bins)
        for i, f in enumerate(centers):
            jhi = int(np.searchsorted(freqs, f))
            if jhi <= 0:
                out[f"modSpec{i}"] = mag[:, 0]
            elif jhi >= freqs.size:
                out[f"modSpec{i}"] = mag[:, -1]
            else:
                slope = ((mag[:, jhi] - mag[:, jhi - 1])
                         / (freqs[jhi] - freqs[jhi - 1]))
                out[f"modSpec{i}"] = (slope * (f - freqs[jhi - 1])
                                      + mag[:, jhi - 1])

    # peaks and peaks2 output names collide BY DESIGN (the reference
    # distinguishes instances by component name); compute_all resolves the
    # collision first-REQUESTED-wins, so write them in request order here
    for fam in families:
        if fam == "peaks2":
            vals = _peaks2_batched(x, starts, ends, gmin, gmax, mean,
                                   options.get("peaks2", {}))
        elif fam == "peaks":
            vals = _peaks_batched(x, starts, ends, gmin, gmax, mean,
                                  options.get("peaks", {}))
        else:
            continue
        for k, v in vals.items():
            if k not in out:        # first-writer-wins like compute_all
                out[k] = v

    return out
