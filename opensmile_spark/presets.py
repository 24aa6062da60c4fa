"""Named feature-set presets — the analogue of the reference's versioned
config sets (config/egemaps/v02, config/compare16 — its de-facto regression
corpus, SURVEY.md §5).

egemaps_style: the eGeMAPS functional recipe (GeMAPSv01b_core.func.conf.inc:
19-37,161-167,191-198) applied to smoothed transcript LLDs — amean,
stddevNorm, percentile 20/50/80, pctlrange0-2, rising/falling slope
mean+stddev per sma3-smoothed LLD, plus voiced-segment-style stats on the
nz-gated channel.

compare_style: the ComParE-2016-style exhaustive bank — every family, every
output, sma-smoothed + delta channels (ComParE_2016_core.func.conf.inc
enables the full set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opensmile_spark.functionals import functionals_kernel
from opensmile_spark.lld import compute_lld
from opensmile_spark.operators import delta_regression, sessionize, sma

EGEMAPS_FUNCTIONALS = [
    "amean", "stddevNorm", "percentile20.0", "percentile50.0",
    "percentile80.0", "pctlrange0-2",
    "meanRisingSlope", "stddevRisingSlope",
    "meanFallingSlope", "stddevFallingSlope",
]

EGEMAPS_SEGMENT_FUNCTIONALS = [
    "numSegments", "meanSegLen", "maxSegLen", "minSegLen", "segLenStddev",
]


def egemaps_style(
    transcripts: DataFrame,
    gap_seconds: float = 43200.0,
    lld_cols=("char_len", "token_cnt", "punct_density", "ttr",
              "reply_latency"),
) -> DataFrame:
    """Transcripts -> per-(conv, session) eGeMAPS-style vector.

    Exactly the recipe shape of eGeMAPSv02: sma3-smoothed LLDs -> 10
    functionals each, plus segment statistics of the nz-gated tool channel
    (the voiced-segment analogue, GeMAPSv01b_core.func.conf.inc:47-56)."""
    lld = compute_lld(transcripts)
    lld = sma(lld, list(lld_cols), 3)
    lld = sma(lld, ["is_tool"], 3, no_zero_sma=True)
    lld = sessionize(lld, gap_seconds=gap_seconds)

    smoothed = [c + "_sma3" for c in lld_cols]
    core = functionals_kernel(
        lld, smoothed, ("conv_id", "session_id"),
        families=["means", "moments", "percentiles", "peaks2"],
        repartition_cols=("conv_id",),
    )
    keep = ["conv_id", "session_id", "n_turns"] + [
        f"{c}_{f}" for c in smoothed for f in EGEMAPS_FUNCTIONALS
    ]
    core = core.select(*[F.col(f"`{k}`") for k in keep])

    seg = functionals_kernel(
        lld, ["is_tool_sma3nz"], ("conv_id", "session_id"),
        families=["segments"],
        options={"segments": {"algorithm": "nonX", "X": 0.0}},
        repartition_cols=("conv_id",),
    ).select(
        "conv_id", "session_id",
        *[F.col(f"`is_tool_sma3nz_{f}`") for f in EGEMAPS_SEGMENT_FUNCTIONALS],
    )
    return core.join(seg, ["conv_id", "session_id"])


def compare_style(
    transcripts: DataFrame,
    gap_seconds: float = 43200.0,
    lld_cols=("char_len", "token_cnt", "punct_density", "caps_ratio",
              "ttr", "reply_latency"),
) -> DataFrame:
    """Exhaustive bank: all families over sma3 + delta channels of every
    LLD — the ComParE-style 'compute everything' sweep."""
    lld = compute_lld(transcripts)
    lld = sma(lld, list(lld_cols), 3)
    smoothed = [c + "_sma3" for c in lld_cols]
    lld = delta_regression(lld, smoothed, 2)
    lld = sessionize(lld, gap_seconds=gap_seconds)
    channels = smoothed + [c + "_de" for c in smoothed]
    core = functionals_kernel(
        lld, channels, ("conv_id", "session_id"),
        families=["means", "moments", "extremes", "percentiles",
                  "regression", "crossings", "times", "onset", "segments",
                  "peaks2", "samples", "dct", "lpc", "lsp", "acf", "amdf",
                  "modulation"],
        repartition_cols=("conv_id",),
    )
    # legacy cFunctionalPeaks shares output names with peaks2 (the reference
    # distinguishes them by component instance); run it as its own bank call
    # and join, prefixing the columns — mirroring a second cFunctionals
    # instance in an emo_large-style config (config/misc/emo_large.conf:265)
    legacy = functionals_kernel(
        lld, [channels[0]], ("conv_id", "session_id"), families=["peaks"],
    )
    ren = [F.col(c).alias(f"legacy_{c}") for c in legacy.columns
           if c not in ("conv_id", "session_id", "n_turns")]
    legacy = legacy.select("conv_id", "session_id", *ren)
    return core.join(legacy, ["conv_id", "session_id"])


def emo_large_style(
    transcripts: DataFrame,
    gap_seconds: float = 43200.0,
    lld_cols=("char_len", "token_cnt", "punct_density", "ttr",
              "reply_latency"),
) -> DataFrame:
    """emo_large-style set (config/misc/emo_large.conf): the classic
    large-scale emotion bank — means/extremes/moments/percentiles/
    crossings/regression/times/onset/segments/samples plus the LEGACY
    Peaks family (emo_large.conf:265 enables cFunctionalPeaks, not
    Peaks2), over sma-smoothed + delta LLD channels per session. Since
    peaks2 is absent here, the legacy peak names carry no collision."""
    lld = compute_lld(transcripts)
    lld = sma(lld, list(lld_cols), 3)
    smoothed = [c + "_sma3" for c in lld_cols]
    lld = delta_regression(lld, smoothed, 2)
    lld = sessionize(lld, gap_seconds=gap_seconds)
    channels = smoothed + [c + "_de" for c in smoothed]
    return functionals_kernel(
        lld, channels, ("conv_id", "session_id"),
        families=["means", "moments", "extremes", "percentiles",
                  "regression", "crossings", "times", "onset", "segments",
                  "peaks", "samples"],
        repartition_cols=("conv_id",),
    )
