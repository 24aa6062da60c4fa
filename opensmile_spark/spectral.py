"""Spectral-analogue LLDs over token-distribution vectors.

cSpectral (/root/reference/src/lldcore/spectral.cpp:31-63) computes band
energies, rolloff points, centroid, entropy, flatness, moments of the
magnitude spectrum; cMelspec (melspec.cpp) is the bucketed filterbank
projection feeding it. The transcript analogue: per turn, hash tokens into
`n_buckets` counts (the "spectrum" of the turn's vocabulary — melspec's
bucketed projection), then compute the same distribution statistics with
built-in array expressions (F.aggregate / F.transform — zero Python).

All formulas mirrored in DuckDB list expressions for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_spectrum(df: DataFrame, text_col: str = "text",
                   n_buckets: int = 16,
                   out_col: str = "spec") -> DataFrame:
    """Hash-bucketed token counts per row: spec[b] = #tokens with
    md5-bucket b (md5-based so DuckDB reproduces it exactly)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bucket_of = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets))
    spec = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda b: F.size(F.filter(toks, lambda t: bucket_of(t) == b.cast("long")))
        .cast("double"),
    )
    return df.withColumn(out_col, spec)


def spectral_stats(df: DataFrame, spec_col: str = "spec",
                   rolloff: float = 0.9) -> DataFrame:
    """Distribution statistics of the bucket vector (spectral.cpp analogue):
    entropy, centroid, flatness, rolloff point, energy — built-ins only."""
    v = F.col(spec_col)
    n = F.size(v)
    total = F.aggregate(v, F.lit(0.0), lambda a, x: a + x)
    # normalized distribution p_i (guard empty)
    p = F.transform(v, lambda x: F.when(total > 0, x / total).otherwise(0.0))
    entropy = -F.aggregate(
        p, F.lit(0.0),
        lambda a, x: a + F.when(x > 0, x * F.log2(x)).otherwise(0.0))
    # value-weighted mean bucket index (spectral centroid analogue)
    idx_weighted = F.zip_with(
        p, F.sequence(F.lit(0), n - 1),
        lambda x, i: x * i.cast("double"))
    centroid = F.aggregate(idx_weighted, F.lit(0.0), lambda a, x: a + x)
    # geometric/arithmetic flatness over positive buckets
    npos = F.size(F.filter(v, lambda x: x > 0))
    log_sum = F.aggregate(
        v, F.lit(0.0), lambda a, x: a + F.when(x > 0, F.log(x)).otherwise(0.0))
    amean_pos = F.when(
        npos > 0,
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x) / npos.cast("double"),
    ).otherwise(F.lit(0.0))
    flatness = F.when(
        (npos > 0) & (amean_pos > 0),
        F.exp(log_sum / npos.cast("double")) / amean_pos,
    ).otherwise(F.lit(0.0))
    # rolloff: first index where the cumulative sum reaches rolloff*total
    cum = F.aggregate(
        v,
        F.struct(F.lit(0.0).alias("acc"), F.lit(-1).alias("idx"),
                 F.lit(0).alias("i")),
        lambda st, x: F.struct(
            (st["acc"] + x).alias("acc"),
            F.when((st["idx"] < 0) & (st["acc"] + x >= rolloff * total),
                   st["i"]).otherwise(st["idx"]).alias("idx"),
            (st["i"] + 1).alias("i"),
        ),
        lambda st: st["idx"],
    )
    energy = F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
    return (
        df.withColumn("spec_entropy", entropy)
        .withColumn("spec_centroid", centroid)
        .withColumn("spec_flatness", flatness)
        .withColumn("spec_rolloff", cum.cast("int"))
        .withColumn("spec_energy", energy)
    )


def plp_style(df: DataFrame, spec_col: str = "spec",
              compression: float = 0.33,
              bucket_hz: float = 250.0) -> DataFrame:
    """cPlp auditory-spectrum analogue (/root/reference/src/lldcore/plp.cpp:
    16,51-64): equal-loudness weighting of each band + the 'power law of
    hearing' compression x^0.33 — the SQL-expressible stages 3-4 of PLP.
    The equal-loudness curve is the HTK variant
    (smileDsp_equalLoudnessWeight_htk, smileUtil.c: fs^2*(f^2+1.44e6)/
    (f^2+9.61e6), fs=f^2/(f^2+1.6e5)), evaluated at a nominal center
    frequency `bucket_hz*(b+1)` per bucket. The downstream IDFT->LPC->ceps
    stages are the lpc kernel family (functionals/kernels.f_lpc) applied to
    the compressed spectrum (kernel path; not SQL-expressible)."""
    v = F.col(spec_col)
    n_idx = F.sequence(F.lit(0), F.size(v) - 1)

    def eql(i):
        f = (i.cast("double") + 1.0) * F.lit(bucket_hz)
        f2 = f * f
        fs = f2 / (f2 + 1.6e5)
        return fs * fs * ((f2 + 1.44e6) / (f2 + 9.61e6))

    aud = F.zip_with(
        v, n_idx,
        lambda x, i: F.pow(x * eql(i), F.lit(compression)),
    )
    return df.withColumn(spec_col + "_aud", aud)


def harmonics_style(df: DataFrame, spec_col: str = "spec",
                    n_harmonics: int = 3) -> DataFrame:
    """cHarmonics analogue (/root/reference/src/lld/harmonics.cpp:550-588):
    fundamental bucket = argmax magnitude (bucket >= 1 so multiples exist),
    harmonic magnitudes at integer multiples, log-relative-to-H0 dB
    magnitudes 20*(log10(Hk)-log10(H0)) clamped at -200 (-200 for missing/
    zero harmonics, -201 when H0 == 0 — the logRelMagnitude=false marker,
    harmonics.cpp:563-576)."""
    v = F.col(spec_col)
    n = F.size(v)
    # argmax over buckets 1..n-1 (first on ties, like the C scan)
    f0 = F.aggregate(
        F.sequence(F.lit(1), n - 1),
        F.struct(F.lit(-1.0).alias("best"), F.lit(0).alias("arg")),
        lambda st, i: F.struct(
            F.greatest(st["best"], F.element_at(v, i + 1)).alias("best"),
            F.when(F.element_at(v, i + 1) > st["best"], i)
            .otherwise(st["arg"]).alias("arg"),
        ),
        lambda st: st["arg"],
    )
    out = df.withColumn("f0_bucket", f0)
    h0 = F.element_at(v, F.col("f0_bucket") + 1)
    for k in range(2, n_harmonics + 1):
        bucket_k = F.col("f0_bucket") * k
        hk = F.when(bucket_k < n, F.element_at(v, bucket_k + 1)) \
            .otherwise(F.lit(0.0))
        db = (
            F.when(h0 <= 0, F.lit(-201.0))
            .when(hk > 0,
                  F.greatest(20.0 * (F.log10(hk) - F.log10(h0)),
                             F.lit(-200.0)))
            .otherwise(F.lit(-200.0))
        )
        out = out.withColumn(f"harmMagRelF0dB_{k}", db)
    return out


def spec_scale(df: DataFrame, spec_col: str = "spec", n_out: int = 8,
               lo: float = 1.0, hi: float | None = None,
               out_col: str | None = None) -> DataFrame:
    """cSpecScale analogue (/root/reference/src/dsp/specScale.cpp): warp the
    bucket axis onto a logarithmic grid — n_out target bins placed
    log-uniformly over source positions [lo, hi], each linearly
    interpolated between its two neighbouring source buckets (the
    reference's spline/linear axis remap). Grid positions are computed
    driver-side and embedded as literals, so the row work is pure column
    expressions."""
    import math as _m

    v = F.col(spec_col)
    n_src = None  # static literal grid needs hi; default to 15 (16 buckets)
    hi = hi if hi is not None else 15.0
    positions = [
        _m.exp(_m.log(lo) + (_m.log(hi) - _m.log(lo)) * i / (n_out - 1))
        for i in range(n_out)
    ]
    outs = []
    for p in positions:
        i1 = int(_m.floor(p))
        i2 = min(i1 + 1, int(hi))
        w2 = p - i1
        e1 = F.element_at(v, i1 + 1)
        e2 = F.element_at(v, i2 + 1)
        outs.append(e1 * F.lit(1.0 - w2) + e2 * F.lit(w2))
    return df.withColumn(out_col or f"{spec_col}_log", F.array(*outs))


def spectral_moments(df: DataFrame, spec_col: str = "spec",
                     split_bucket: int | None = None) -> DataFrame:
    """The rest of the cSpectral surface (/root/reference/src/lldcore/
    spectral.cpp:31-63): distribution moments over the bucket axis
    (variance/skewness/kurtosis around the centroid), the spectral SLOPE
    (least-squares fit of magnitude over bucket index), the alpha-ratio
    analogue (low-band / high-band energy) and the Hammarberg-index
    analogue (low-band peak / high-band peak), split at `split_bucket`
    (default: half the spectrum). Pure array expressions."""
    v = F.col(spec_col)
    n = F.size(v)
    nd = n.cast("double")
    idx = F.sequence(F.lit(0), n - 1)
    total = F.aggregate(v, F.lit(0.0), lambda a, x: a + x)
    p = F.transform(v, lambda x: F.when(total > 0, x / total).otherwise(0.0))

    def pmom(k, mu):
        return F.aggregate(
            F.zip_with(p, idx,
                       lambda pi, i: pi * F.pow(i.cast("double") - mu, k)),
            F.lit(0.0), lambda a, x: a + x)

    mu = F.aggregate(
        F.zip_with(p, idx, lambda pi, i: pi * i.cast("double")),
        F.lit(0.0), lambda a, x: a + x)
    m2 = pmom(2, mu)
    m3 = pmom(3, mu)
    m4 = pmom(4, mu)
    var_ = m2
    skew = F.when(m2 > 0, m3 / F.pow(m2, 1.5)).otherwise(0.0)
    kurt = F.when(m2 > 0, m4 / (m2 * m2)).otherwise(0.0)

    # least-squares slope of magnitude over bucket index
    si = (nd - 1.0) * nd / 2.0
    si2 = (nd - 1.0) * nd * (2.0 * nd - 1.0) / 6.0
    sxy = F.aggregate(
        F.zip_with(v, idx, lambda x, i: x * i.cast("double")),
        F.lit(0.0), lambda a, x: a + x)
    denom = nd * si2 - si * si
    slope = F.when(denom != 0, (nd * sxy - si * total) / denom) \
        .otherwise(0.0)

    split = F.lit(split_bucket).cast("int") if split_bucket is not None \
        else (n / 2).cast("int")
    low = F.slice(v, 1, split)
    high = F.slice(v, split + 1, n - split)
    e_low = F.aggregate(low, F.lit(0.0), lambda a, x: a + x * x)
    e_high = F.aggregate(high, F.lit(0.0), lambda a, x: a + x * x)
    alpha = F.when(e_high > 0, e_low / e_high).otherwise(0.0)
    hamm = F.when(F.array_max(high) > 0,
                  F.array_max(low) / F.array_max(high)).otherwise(0.0)

    return (
        df.withColumn("spec_variance", var_)
        .withColumn("spec_skewness", skew)
        .withColumn("spec_kurtosis", kurt)
        .withColumn("spec_slope", slope)
        .withColumn("spec_alpha_ratio", alpha)
        .withColumn("spec_hammarberg", hamm)
    )
