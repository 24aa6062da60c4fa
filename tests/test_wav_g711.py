"""Non-PCM WAV decode: G.711 mu-law/A-law (telephony speech corpora)
and IEEE-float fmt tags, which the stdlib wave module rejects."""

import struct

import numpy as np
import pytest


def _wav_bytes(tag, bits, payload, nch=1, sr=8000):
    block = max(1, nch * bits // 8)
    fmt = struct.pack("<HHIIHH", tag, nch, sr, sr * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_g711_tables_match_reference():
    """Expansion tables byte-exact vs CPython's audioop (the ITU G.711
    reference implementation); skipped where audioop is removed."""
    audioop = pytest.importorskip("audioop")
    from opensmile_spark.multimodal import (
        _g711_alaw_table, _g711_ulaw_table,
    )

    all_bytes = bytes(range(256))
    np.testing.assert_array_equal(
        _g711_ulaw_table(),
        np.frombuffer(audioop.ulaw2lin(all_bytes, 2), "<i2"))
    np.testing.assert_array_equal(
        _g711_alaw_table(),
        np.frombuffer(audioop.alaw2lin(all_bytes, 2), "<i2"))


@pytest.mark.parametrize("tag", [6, 7])
def test_g711_wav_decode(tag):
    audioop = pytest.importorskip("audioop")
    from opensmile_spark.multimodal import decode_wav

    rng = np.random.default_rng(tag)
    pcm = rng.normal(0, 8000, 2000).astype("<i2")
    enc = (audioop.lin2alaw if tag == 6 else audioop.lin2ulaw)(
        pcm.tobytes(), 2)
    dec = (audioop.alaw2lin if tag == 6 else audioop.ulaw2lin)(enc, 2)
    x, sr = decode_wav(_wav_bytes(tag, 8, enc))
    assert sr == 8000
    want = np.frombuffer(dec, "<i2").astype(np.float64) / 32768.0
    np.testing.assert_allclose(x, want)


def test_float_wav_decode():
    from opensmile_spark.multimodal import decode_wav

    rng = np.random.default_rng(3)
    f32 = rng.normal(0, 0.3, 1500).astype("<f4")
    x, sr = decode_wav(_wav_bytes(3, 32, f32.tobytes()))
    np.testing.assert_allclose(x, f32.astype(np.float64))
    f64 = rng.normal(0, 0.3, 700)
    x, _ = decode_wav(_wav_bytes(3, 64, f64.astype("<f8").tobytes()))
    np.testing.assert_allclose(x, f64)


def test_stereo_mulaw_mixdown():
    audioop = pytest.importorskip("audioop")
    from opensmile_spark.multimodal import decode_wav

    rng = np.random.default_rng(4)
    pcm = rng.normal(0, 8000, 4000).astype("<i2")
    enc = audioop.lin2ulaw(pcm.tobytes(), 2)
    x, _ = decode_wav(_wav_bytes(7, 8, enc, nch=2))
    assert x.shape == (2000,)       # cMonoMixdown average
    dec = np.frombuffer(audioop.ulaw2lin(enc, 2),
                        "<i2").astype(np.float64) / 32768.0
    np.testing.assert_allclose(x, dec.reshape(-1, 2).mean(axis=1))


def test_unknown_tag_raises():
    from opensmile_spark.multimodal import decode_wav

    with pytest.raises(ValueError, match="format tag"):
        decode_wav(_wav_bytes(2, 4, b"\x00" * 64))   # MS-ADPCM


def test_g711_through_multimodal(spark):
    audioop = pytest.importorskip("audioop")
    from opensmile_spark.multimodal import (
        decode_wav, extract_media_features, wav_features,
    )

    rng = np.random.default_rng(5)
    pcm = rng.normal(0, 9000, 6000).astype("<i2")
    payload = _wav_bytes(7, 8, audioop.lin2ulaw(pcm.tobytes(), 2))
    media = spark.createDataFrame(
        [(0, "audio", bytearray(payload))],
        "media_id long, kind string, payload binary")
    out = extract_media_features(media, n_features=5,
                                 fake=False).toPandas()
    x, sr = decode_wav(payload)
    want = wav_features(x, sr, 5)
    np.testing.assert_allclose(
        [out.loc[0, f"feat_{i}"] for i in range(5)], want, rtol=1e-9)
