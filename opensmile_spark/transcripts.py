"""Transcript-table derivation from the driver's `events` table.

The correctness gate (driver) compares Spark queries against DuckDB SQL over
the shared parquet tables (region..embeddings). There is no transcripts table
in that set, so we derive one *deterministically* from `events` with logic
expressible identically in Spark and ANSI/DuckDB SQL — both engines then see
byte-identical transcript rows and every engine operator can be oracle-checked.

Mapping (pure, deterministic, no floats in strings):
    conv_id  = 'u' || user_id
    turn_idx = row_number over (partition by user_id order by ts, event_id) - 1
    role     = click->user, view->assistant, purchase->tool, signup->user,
               error->system
    text     = repeat(event_type || ' ', 1 + event_id % 7) || props
    tool     = event_type when role='tool' else NULL
    ts       = ts

This mirrors the reference's source abstraction: cWaveSource /
cCsvSource are just scans that materialize a time-indexed level
(/root/reference/src/iocore/waveSource.cpp:37-48, csvSource.cpp:43-51);
here the scan is a parquet read plus deterministic column exprs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# DuckDB-compatible CTE body; the driver pre-registers `events` as a view.
TRANSCRIPTS_SQL = """
SELECT
    'u' || CAST(user_id AS VARCHAR)                               AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
         AS INTEGER)                                              AS turn_idx,
    CASE event_type
        WHEN 'click' THEN 'user'
        WHEN 'view' THEN 'assistant'
        WHEN 'purchase' THEN 'tool'
        WHEN 'signup' THEN 'user'
        ELSE 'system'
    END                                                           AS role,
    repeat(event_type || ' ', 1 + CAST(event_id % 7 AS INTEGER)) || props
                                                                  AS text,
    CASE WHEN event_type = 'purchase' THEN 'checkout' END         AS tool,
    ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of TRANSCRIPTS_SQL over {sf_dir}/events.parquet.

    turn_idx's window partitions by the DERIVED conv_id (a bijection of
    user_id, so the numbering is identical to the SQL's PARTITION BY
    user_id) — this makes every downstream conv_id window/groupBy reuse
    THE SAME hash exchange, so the whole LLD -> smooth -> delta ->
    sessionize chain runs on one shuffle instead of two (asserted by
    tools/plan_audit.py)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "conv_id", F.concat(F.lit("u"), F.col("user_id").cast("string")))
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    role = (
        F.when(F.col("event_type") == "click", "user")
        .when(F.col("event_type") == "view", "assistant")
        .when(F.col("event_type") == "purchase", "tool")
        .when(F.col("event_type") == "signup", "user")
        .otherwise("system")
    )
    return ev.select(
        F.col("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.repeat(F.concat(F.col("event_type"), F.lit(" ")),
                     (F.lit(1) + F.col("event_id") % 7).cast("int")),
            F.col("props"),
        ).alias("text"),
        F.when(F.col("event_type") == "purchase", F.lit("checkout"))
        .otherwise(F.lit(None).cast("string")).alias("tool"),
        F.col("ts"),
    )
