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
