"""LLD (low-level descriptor) layer — the cVectorProcessor analogue.

The reference computes per-frame descriptors from windows of raw signal
(cEnergy /root/reference/src/lldcore/energy.cpp:36-44, cIntensity
intensity.cpp, cMZcr mzcr.cpp:33-37, cSpectral spectral.cpp:31-63, pitch via
pitchBase.cpp:41-58). For the transcript payload each acoustic LLD has a
text-domain analogue computed per turn with *built-in* column expressions —
JVM-side, whole-stage-codegen'd, zero Python in the hot path:

    char_len       energy analogue          length(text)
    token_cnt      loudness analogue        whitespace token count
    punct_density  intensity analogue       punctuation chars / char_len
    caps_ratio     intensity analogue       uppercase chars / char_len
    ttr            spectral-flatness analog type-token ratio
    reply_latency  pitch analogue           ts - lag(ts) seconds
    role_change    crossings analogue       role != lag(role)
    is_tool        voicing-gate analogue    role == 'tool'

Every formula is mirrored in LLD_SQL (DuckDB dialect) for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opensmile_spark.exprcache import expr_memo
from opensmile_spark.util import epoch_seconds

LLD_COLS = [
    "char_len", "token_cnt", "punct_density", "caps_ratio",
    "ttr", "reply_latency", "role_change", "is_tool",
]

# DuckDB-dialect LLD over a `transcripts` CTE (columns per input_hint).
LLD_SQL = """
SELECT
    conv_id, turn_idx, ts,
    CAST(length(text) AS DOUBLE)                                  AS char_len,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)   AS token_cnt,
    CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE)                            AS punct_density,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
        / CAST(length(text) AS DOUBLE)                            AS caps_ratio,
    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
        / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)  AS ttr,
    COALESCE(epoch(ts) - epoch(lag(ts) OVER w), 0.0)              AS reply_latency,
    CASE WHEN role <> COALESCE(lag(role) OVER w, role) THEN 1.0 ELSE 0.0 END
                                                                  AS role_change,
    CASE WHEN role = 'tool' THEN 1.0 ELSE 0.0 END                 AS is_tool
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
"""


def compute_lld(transcripts: DataFrame, keep_text: bool = False) -> DataFrame:
    """transcripts (input_hint schema) -> LLD table keyed (conv_id, turn_idx, ts).

    Single narrow projection + one window (lag) — the lag shuffles by conv_id
    once; everything else stays in whole-stage codegen. At scale the input
    should already be bucketed/partitioned by conv_id so the lag window
    reuses that distribution. The projection Columns are memoized
    (exprcache): they are parameter-pure and py4j-priced.
    """
    return transcripts.select(*_lld_cols(keep_text))


@expr_memo
def _lld_cols(keep_text: bool):
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    char_len = F.length("text").cast("double")

    return (
        "conv_id",
        "turn_idx",
        "ts",
        *(["text", "role", "tool"] if keep_text else []),
        char_len.alias("char_len"),
        F.size(toks).cast("double").alias("token_cnt"),
        (F.length(F.regexp_replace("text", r"[^.,!?;:]", "")).cast("double")
         / char_len).alias("punct_density"),
        (F.length(F.regexp_replace("text", r"[^A-Z]", "")).cast("double")
         / char_len).alias("caps_ratio"),
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks).cast("double")).alias("ttr"),
        F.coalesce(
            epoch_seconds("ts") - F.lag(epoch_seconds("ts")).over(
                Window.partitionBy("conv_id").orderBy("turn_idx")),
            F.lit(0.0),
        ).alias("reply_latency"),
        F.when(
            F.col("role") != F.coalesce(F.lag("role").over(w), F.col("role")),
            1.0,
        ).otherwise(0.0).alias("role_change"),
        F.when(F.col("role") == "tool", 1.0).otherwise(0.0).alias("is_tool"),
    )
