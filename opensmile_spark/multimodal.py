"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data table carries image/audio/video as `binary` columns
with typed metadata; the engine's job is the Spark-side plumbing — schema,
partition-friendly batch processing, Arrow-batched UDF signatures — while
the codec work happens in a vectorized kernel. The actual decoders (PIL,
soundfile, av) are NOT in this container, so the decode step is a clearly
marked stub with a deterministic fake behind `fake=True` for tests: the
batch shapes, schemas and partitioning are real and tested; only the codec
call is replaced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),       # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
    payload = F.unhex(F.md5(F.concat(F.lit(seed), F.col("id"))))
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.when(kind == "image", (F.pmod(F.col("id"), F.lit(4)) * 128 + 256)
               .cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.col("id"), F.lit(3)) * 128 + 256)
               .cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind != "image", (F.pmod(F.col("id"), F.lit(30)) + 1)
               .cast("double")).alias("duration_s"),
    )


def extract_media_features(
    df: DataFrame,
    n_features: int = 8,
    fake: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched bytes).

    Real path: decode `payload` per `mime` (PIL/soundfile/av), resize /
    frame-sample, run the featurizer — NotImplementedError here because the
    codec libraries are not in this image. fake=True substitutes a
    deterministic featurizer (md5-seeded) so the distributed plumbing —
    binary Arrow transfer, per-batch iteration, output schema — is fully
    exercised in tests and benchmarks.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    feat_cols = [f"feat_{i}" for i in range(n_features)]
    schema = "media_id long, kind string, n_bytes long, " + \
        ", ".join(f"{c} double" for c in feat_cols)

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/soundfile/av — not available "
                    "in this image; pass fake=True for the deterministic "
                    "plumbing test path")
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0),
            }
            feats = np.empty((len(pdf), n_features))
            for r, payload in enumerate(pdf["payload"]):
                h = hashlib.md5(payload or b"").digest()
                feats[r] = [h[i] / 255.0 for i in range(n_features)]
            for i, c in enumerate(feat_cols):
                out[c] = feats[:, i]
            yield pd.DataFrame(out)

    proj = df.select("media_id", "kind", "payload")
    return proj.mapInPandas(run, schema=schema)


def frame_sample_plan(df: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) — pure
    metadata expansion (sequence + explode), no decode; feeds the decoder
    UDF above at scale so each task pulls only the frames it owns."""
    n_frames = F.greatest(
        (F.col("duration_s") * fps).cast("int"), F.lit(1))
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
        )
        .withColumn("frame_ts", F.col("frame_no") / fps)
    )


def audio_chunk_plan(df: DataFrame, chunk_s: float = 5.0,
                     hop_s: float = 2.5) -> DataFrame:
    """Audio chunking plan: one row per (media_id, chunk_start_s) with
    overlap hop — metadata-only expansion (sequence + explode) so the
    decode UDF pulls exactly the byte ranges it owns; the audio twin of
    frame_sample_plan."""
    n_chunks = F.greatest(
        F.ceil((F.col("duration_s") - chunk_s) / hop_s).cast("int") + 1,
        F.lit(1))
    return (
        df.filter(F.col("kind") == "audio")
        .select(
            "media_id", "sample_rate", "duration_s",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no"),
        )
        .withColumn("chunk_start_s", F.col("chunk_no") * hop_s)
        .withColumn(
            "chunk_end_s",
            F.least(F.col("chunk_start_s") + chunk_s, F.col("duration_s")))
    )
