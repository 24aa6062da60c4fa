"""Deterministic sampling / domain mixing for training-data pipelines.

A 100 TB corpus is rarely trained on verbatim: domains are re-weighted
(e.g. up-sample books, down-sample crawl) and splits must be REPRODUCIBLE
across reruns and engines. Random `df.sample` is neither (rerun => new
rows, no per-row audit trail), so everything here derives the keep/drop
decision from a content-independent hash of a stable key:

  keep(row)  <=>  hash32(key ':' seed) < floor(rate * 2^32)

with hash32 = first 8 hex chars of md5 — the same portable construction
the minhash/winnowing ops use, so every decision replays bit-identically
in any engine with md5 (the DuckDB oracle twin included). Sampling is a
pure filter: no shuffle, no state, pushes down past column pruning, and
composes with any downstream operator.

  hash_sample        uniform rate over the whole table
  stratified_sample  per-stratum rates (a CASE over literal thresholds —
                     never a join for a handful of strata)
  domain_mix         target mixture weights -> the largest feasible
                     subsample with exactly those proportions (rates
                     derived from per-stratum counts; one tiny count agg)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 32


def _hash32(key: Column, seed: int) -> Column:
    """Uniform 32-bit hash of key:seed, portable across engines via md5."""
    s = F.concat_ws(":", key.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def rate_threshold(rate: float) -> int:
    """The integer keep-threshold for a sampling rate in [0, 1]. Exposed so
    oracle twins can inline the EXACT same literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * _HASH_SPACE)


def hash_sample(df: DataFrame, rate: float, key_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, keyed on `key_col`."""
    return df.filter(_hash32(F.col(key_col), seed)
                     < F.lit(rate_threshold(rate)))


def assign_splits(df: DataFrame, splits: dict[str, float],
                  key_col: str = "conv_id", seed: int = 0,
                  out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment keyed on `key_col` — every
    row with the same key (e.g. all turns of one conversation) lands in
    the SAME split, so no conversation leaks across the boundary.
    `splits` maps name -> fraction (must sum to <= 1; any remainder is
    assigned NULL, i.e. held out). Pure projection: no shuffle, no
    state, bit-identical on rerun and in the md5 oracle twin. Buckets
    are contiguous hash ranges in `splits`' insertion order, so growing
    one split only ever takes keys from its right neighbour."""
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    h = _hash32(F.col(key_col), seed)
    expr = F.lit(None).cast("string")
    hi = 0.0
    # build the CASE from the LAST range backwards so earlier whens win
    bounds = []
    for name, frac in splits.items():
        hi = hi + frac
        bounds.append((name, rate_threshold(min(hi, 1.0))))
    for name, upper in reversed(bounds):
        expr = F.when(h < F.lit(upper), F.lit(name)).otherwise(expr)
    # reversed + when-chains: the FIRST matching upper bound in insertion
    # order must win, and when() chains evaluate outermost-first
    out = df.withColumn(out_col, expr)
    return out


def stratified_sample(df: DataFrame, strata_col: str | Column,
                      rates: dict[str, float], key_col: str = "doc_id",
                      seed: int = 0,
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling. `rates` maps stratum value ->
    keep rate; strata absent from the map fall back to `default_rate`.
    The per-row threshold is a literal CASE chain (broadcast-free;
    whole-stage codegen) — the right shape for the handful of domains a
    mixture has. The same key at the same seed is kept or dropped
    CONSISTENTLY across strata rates, so raising a rate only ever ADDS
    rows (nested samples — handy for scaling-law subsets)."""
    strata = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(strata == value, F.lit(rate_threshold(rate))) \
               .otherwise(thr)
    return df.filter(_hash32(F.col(key_col), seed) < thr)


def domain_mix(df: DataFrame, strata_col: str,
               weights: dict[str, float], key_col: str = "doc_id",
               seed: int = 0) -> tuple[DataFrame, dict[str, float]]:
    """Largest feasible subsample matching the target mixture `weights`
    (stratum -> share). With n_s rows per stratum and normalized target
    w_s, the max total size is T = min_s n_s / w_s; each stratum keeps
    rate_s = w_s * T / n_s (the binding stratum keeps everything).

    The count aggregate is map-side-combinable and its result is a
    handful of rows (one per domain) — driver-side math on it is tiny
    metadata, not a data path. Returns (sampled_df, rates)."""
    total_w = sum(weights.values())
    w = {k: v / total_w for k, v in weights.items()}
    counts = {r[0]: r[1]
              for r in df.groupBy(strata_col).count().collect()}
    missing = [s for s in w if s not in counts]
    if missing:
        raise ValueError(f"strata absent from data: {missing}")
    t_max = min(counts[s] / w[s] for s in w if w[s] > 0)
    rates = {s: min(1.0, w[s] * t_max / counts[s]) for s in w}
    return stratified_sample(df, strata_col, rates, key_col, seed), rates
