"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data table carries image/audio/video as `binary` columns
with typed metadata; the engine's job is the Spark-side plumbing — schema,
partition-friendly batch processing, Arrow-batched UDF signatures — while
the codec work happens in a vectorized kernel.

AUDIO decode is REAL: WAV/PCM payloads are parsed with the stdlib `wave`
module (the cWaveSource analogue — header fields + PCM normalization per
/root/reference/src/iocore/waveSource.cpp:298-361, multi-channel collapsed
like cMonoMixdown) and featurized with numpy (RMS/ZCR/spectral moments —
the cEnergy/cMZcr/cSpectral LLD shapes). IMAGE decode is REAL for
uncompressed 24-bit BMP (pure-struct header parse + numpy pixel view;
channel means / luma stats / edge energy / histogram entropy). Video and
compressed-image decoders (PIL, av) are NOT in this container, so those
payloads remain a clearly marked stub with a deterministic fake behind
`fake=True`: batch shapes, schemas and partitioning are real and tested;
only the codec call is replaced.
"""

from __future__ import annotations

import pandas as pd
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


def synthesize_wav_bytes(media_id: int, sr: int = 16000,
                         dur_s: float = 0.5) -> bytes:
    """Deterministic PCM16 mono WAV (stdlib `wave`): two seeded tones +
    low-level noise, so real-decode tests see a nontrivial spectrum."""
    import io
    import wave

    import numpy as np

    rng = np.random.RandomState(int(media_id) % (2 ** 31))
    t = np.arange(int(sr * dur_s)) / sr
    f1 = 220.0 * (1 + media_id % 7)
    f2 = 333.0 * (1 + media_id % 5)
    x = (0.6 * np.sin(2 * np.pi * f1 * t)
         + 0.3 * np.sin(2 * np.pi * f2 * t)
         + 0.05 * rng.randn(t.size))
    pcm = (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """stdlib WAV/PCM decode — the cWaveSource read path (header fields +
    sample normalization, waveSource.cpp:298-361): returns (mono float64
    array in [-1, 1], sample_rate). Multi-channel input is averaged
    (cMonoMixdown policy)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:                        # unsigned 8-bit PCM
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr


def wav_features(x, sr: int, n_features: int = 8):
    """Vectorized audio LLDs of one decoded clip: duration, RMS energy,
    ZCR, spectral centroid/rolloff(0.9)/flatness, peak amplitude, log
    energy (dB) — the cEnergy/cMZcr/cSpectral shapes, truncated or
    zero-padded to n_features."""
    import numpy as np

    n = x.size
    if n == 0:
        return [0.0] * n_features
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(x[1:] * x[:-1] < 0)) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    tot = float(mag.sum())
    centroid = float((mag * freqs).sum() / tot) if tot > 0 else 0.0
    if tot > 0:
        cum = np.cumsum(mag)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.9 * tot))])
    else:
        rolloff = 0.0
    pos = mag[mag > 0]
    flatness = float(np.exp(np.mean(np.log(pos))) / np.mean(pos)) \
        if pos.size else 0.0
    feats = [n / float(sr), rms, zcr, centroid, rolloff, flatness,
             float(np.abs(x).max()),
             float(10.0 * np.log10(max(np.mean(x * x), 1e-12)))]
    feats = feats[:n_features]
    return feats + [0.0] * (n_features - len(feats))


def synthesize_bmp_bytes(media_id: int, width: int = 64,
                         height: int = 48) -> bytes:
    """Deterministic 24-bit uncompressed BMP (pure struct): a seeded
    two-axis gradient + one bright rectangle, so real-decode tests see
    nontrivial channel means, edges, and histogram."""
    import struct

    import numpy as np

    rng = np.random.RandomState(int(media_id) % (2 ** 31))
    yy, xx = np.mgrid[0:height, 0:width]
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[..., 0] = (xx * 255 // max(width - 1, 1)).astype(np.uint8)
    img[..., 1] = (yy * 255 // max(height - 1, 1)).astype(np.uint8)
    img[..., 2] = int(rng.randint(0, 256))
    x0, y0 = int(rng.randint(0, width // 2)), int(rng.randint(0, height // 2))
    img[y0:y0 + height // 4, x0:x0 + width // 4] = 255
    row_pad = (-(width * 3)) % 4
    # bottom-up rows, BGR order, each row padded to a 4-byte boundary
    rows = b"".join(
        img[r, :, ::-1].tobytes() + b"\x00" * row_pad
        for r in range(height - 1, -1, -1))
    pixel_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_off + len(rows), 0, 0,
                         pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def decode_bmp(payload: bytes):
    """Pure-struct decode of uncompressed 24-bit BMP (BITMAPINFOHEADER):
    returns an (height, width, 3) uint8 RGB array. Handles bottom-up and
    top-down row order and 4-byte row padding."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1].copy()          # BGR -> RGB


def image_features(img, n_features: int = 8):
    """Vectorized image features of one decoded RGB frame: channel means,
    luminance mean/std, gradient (edge) energy, 16-bin luma-histogram
    entropy, aspect ratio — the decode/resize/featurize stage shape."""
    import numpy as np

    x = img.astype(np.float64)
    luma = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    gy = np.abs(np.diff(luma, axis=0)).mean() if luma.shape[0] > 1 else 0.0
    gx = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
    hist, _ = np.histogram(luma, bins=16, range=(0.0, 255.0001))
    p = hist / max(hist.sum(), 1)
    p = p[p > 0]
    feats = [float(x[..., 0].mean()), float(x[..., 1].mean()),
             float(x[..., 2].mean()), float(luma.mean()),
             float(luma.std()), float(gx + gy),
             float(-(p * np.log2(p)).sum()),
             float(img.shape[1]) / float(img.shape[0])]
    feats = feats[:n_features]
    return feats + [0.0] * (n_features - len(feats))


def synthetic_media(spark, n: int = 64, seed: int = 42,
                    real_audio: bool = False,
                    real_images: bool = False) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes).
    real_audio=True replaces audio payloads with actual synthesized WAV
    bytes (Arrow-batched pandas UDF — synthesis runs on the executors, so
    the fixture itself scales) and stamps mime='audio/wav'."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
    payload = F.unhex(F.md5(F.concat(F.lit(seed), F.col("id"))))
    out = df.select(
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
    if real_audio:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("binary")
        def _wav(mid: pd.Series) -> pd.Series:
            return mid.map(lambda i: synthesize_wav_bytes(int(i)))

        is_audio = F.col("kind") == "audio"
        out = out.withColumn(
            "payload",
            F.when(is_audio, _wav("media_id")).otherwise(F.col("payload")),
        ).withColumn(
            "mime",
            F.when(is_audio, F.lit("audio/wav")).otherwise(F.col("mime")))
    if real_images:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("binary")
        def _bmp(mid: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
            return pd.Series([
                synthesize_bmp_bytes(int(m), int(wv), int(hv))
                for m, wv, hv in zip(mid, w, h)])

        is_img = F.col("kind") == "image"
        out = out.withColumn(
            "payload",
            F.when(is_img, _bmp("media_id", "width", "height"))
            .otherwise(F.col("payload")),
        ).withColumn(
            "mime",
            F.when(is_img, F.lit("image/bmp")).otherwise(F.col("mime")))
    return out


def extract_media_features(
    df: DataFrame,
    n_features: int = 8,
    fake: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched bytes).

    WAV/PCM payloads (RIFF magic) are decoded FOR REAL with the stdlib
    `wave` reader and featurized with numpy (`wav_features`). Other kinds:
    fake=True substitutes a deterministic md5-seeded featurizer so the
    distributed plumbing — binary Arrow transfer, per-batch iteration,
    output schema — is fully exercised; fake=False raises
    NotImplementedError for them (PIL/av are not in this image).
    """
    import hashlib

    import numpy as np
    import pandas as pd

    feat_cols = [f"feat_{i}" for i in range(n_features)]
    schema = "media_id long, kind string, n_bytes long, " + \
        ", ".join(f"{c} double" for c in feat_cols)

    def run(batches):
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0),
            }
            feats = np.empty((len(pdf), n_features))
            for r, payload in enumerate(pdf["payload"]):
                payload = payload or b""
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    x, sr = decode_wav(bytes(payload))
                    feats[r] = wav_features(x, sr, n_features)
                elif payload[:2] == b"BM":
                    feats[r] = image_features(decode_bmp(bytes(payload)),
                                              n_features)
                elif fake:
                    h = hashlib.md5(payload).digest()
                    feats[r] = [h[i % 16] / 255.0 for i in range(n_features)]
                else:
                    raise NotImplementedError(
                        "this codec needs PIL/av — not available in this "
                        "image; pass fake=True for the deterministic "
                        "plumbing path (WAV audio and BMP images decode "
                        "for real either way)")
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
