"""Multimodal tests: binary schema, Arrow round-trip of raw bytes, the
REAL pure-numpy PGM/WAV codecs, vectorized stats/sampling, the
deterministic fake decode, and the NotImplementedError gate for formats
whose codecs aren't installed."""

import numpy as np
import pandas as pd
import pytest

from faiss_metal_spark.operators.multimodal import (
    THUMB_TAPS,
    attach_audio_payload,
    attach_image_payload,
    attach_payload,
    byte_stats,
    decode_audio,
    decode_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["abcdefgh" * 4, "z", ""],
            }
        ),
        schema="doc_id long, text string",
    )


@pytest.fixture(scope="module")
def mm(docs):
    return attach_payload(docs)


def test_payload_schema(mm):
    d = dict(mm.dtypes)
    assert d["payload"] == "binary"
    assert d["meta"].startswith("struct<format:string,n_bytes:bigint")
    metas = {r["doc_id"]: r["meta"] for r in mm.collect()}
    assert metas[0]["n_bytes"] == 32 and metas[0]["format"] == "txt"
    assert metas[2]["n_bytes"] == 0


def test_byte_stats_exact(mm):
    out = {r["doc_id"]: r for r in byte_stats(mm).collect()}
    # 'abcdefgh' codes 97..104, mean 100.5
    assert out[0]["n_bytes"] == 32
    assert out[0]["mean_byte"] == pytest.approx(100.5)
    assert out[0]["max_byte"] == ord("h")
    assert out[1]["mean_byte"] == pytest.approx(ord("z"))
    assert out[2]["n_bytes"] == 0 and out[2]["mean_byte"] == 0.0


def test_sample_frames(mm):
    rows = sample_frames(mm, stride=8).collect()
    f0 = sorted((r["frame_idx"], r["frame_byte"]) for r in rows if r["doc_id"] == 0)
    # bytes 0, 8, 16, 24 of 'abcdefgh'*4 are all 'a'
    assert f0 == [(i, ord("a")) for i in range(4)]
    assert not any(r["doc_id"] == 2 for r in rows)  # empty payload → no frames


def test_unknown_codec_gate(mm):
    with pytest.raises(NotImplementedError):
        decode_image(mm, fmt="jpeg")


def test_fake_decode_deterministic(mm):
    a = decode_image(mm, fake=True).orderBy("doc_id", "px_idx").collect()
    b = decode_image(mm, fake=True).orderBy("doc_id", "px_idx").collect()
    assert a == b
    d1 = [r["px"] for r in a if r["doc_id"] == 1]
    assert d1 == [ord("z")] * THUMB_TAPS  # single-byte payload: every tap hits it
    assert len([r for r in a if r["doc_id"] == 0]) == THUMB_TAPS


def test_pgm_payload_is_real_pgm(docs):
    """The generated payload must be a spec-valid binary PGM a third
    party could read: header tokens + exactly w·h raster bytes."""
    rows = {r["doc_id"]: bytes(r["payload"]) for r in
            attach_image_payload(docs, width=16, height=8).collect()}
    assert 2 not in rows  # empty doc → no image
    p = rows[0]
    assert p.startswith(b"P5\n16 8\n255\n")
    raster = p[len(b"P5\n16 8\n255\n"):]
    assert len(raster) == 16 * 8
    # pixel plane is the text bytes cycled
    want = np.resize(np.frombuffer(("abcdefgh" * 4).encode(), np.uint8), 128)
    assert raster == want.tobytes()


def test_pgm_decode_real_pixels(docs):
    """decode_image(fmt='pgm') parses the header and taps real raster
    positions: tap i of a 128-pixel image reads pixel 8i = text byte
    (8i mod len)."""
    img = attach_image_payload(docs, width=16, height=8)
    out = decode_image(img, fmt="pgm").orderBy("doc_id", "px_idx").collect()
    txt = "abcdefgh" * 4
    d0 = [r["px"] for r in out if r["doc_id"] == 0]
    assert d0 == [ord(txt[(8 * i) % 32]) for i in range(THUMB_TAPS)]
    d1 = [r["px"] for r in out if r["doc_id"] == 1]
    assert d1 == [ord("z")] * THUMB_TAPS


def test_pgm_decode_rejects_garbage(mm):
    with pytest.raises(Exception, match="PGM"):
        decode_image(mm, fmt="pgm").collect()  # txt payload is not P5


def test_pgm_decode_rejects_truncated_raster(spark):
    """A header that claims more raster bytes than the payload holds must
    error, not silently bleed pixels from the next row's payload."""
    good = b"P5\n4 2\n255\n" + bytes(range(8))
    bad = b"P5\n16 8\n255\n" + bytes(range(8))  # claims 128, has 8
    df = spark.createDataFrame(
        [(0, bytearray(good), "x"), (1, bytearray(bad), "x")],
        "doc_id long, payload binary, meta string",
    )
    with pytest.raises(Exception, match="truncated"):
        decode_image(df, fmt="pgm").collect()


def test_wav_roundtrip_stats(docs, spark):
    """attach_audio_payload writes a spec-valid RIFF PCM16 file (the
    stdlib wave module can read it back) and decode_audio recovers the
    amplitude stats exactly."""
    import io
    import wave

    wav = attach_audio_payload(docs, sample_rate=8000)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in wav.collect()}
    with wave.open(io.BytesIO(payloads[0])) as w:
        assert w.getnchannels() == 1 and w.getsampwidth() == 2
        assert w.getframerate() == 8000 and w.getnframes() == 32
        frames = np.frombuffer(w.readframes(32), np.int16)
    want = (np.frombuffer(("abcdefgh" * 4).encode(), np.uint8).astype(np.int16) - 128) * 256
    np.testing.assert_array_equal(frames, want)

    out = {r["doc_id"]: r for r in decode_audio(wav).collect()}
    assert out[0]["n_samples"] == 32 and out[0]["sample_rate"] == 8000
    assert out[0]["mean_abs"] == pytest.approx(np.abs(want.astype(np.int64)).mean())
    assert out[0]["peak"] == int(np.abs(want.astype(np.int64)).max())
    assert out[1]["n_samples"] == 1
    assert out[1]["peak"] == abs((ord("z") - 128) * 256)
    assert 2 not in out  # empty doc → no clip


def test_image_ahash_and_dup_groups(docs, spark):
    """aHash packs (tap > mean) bits MSB-first; identical images (same
    text bytes) land in one dup group with keeper = min id."""
    from faiss_metal_spark.operators.multimodal import (
        ahash_dup_groups,
        attach_image_payload,
        decode_image,
        image_ahash,
    )

    img = attach_image_payload(docs, width=16, height=8)
    taps = decode_image(img, fmt="pgm")
    tp = taps.toPandas()
    hp = image_ahash(taps).toPandas().set_index("doc_id")
    for did, grp in tp.groupby("doc_id"):
        px = grp.sort_values("px_idx").px.to_numpy(np.float64)
        exp = 0
        mean = px.sum() / len(px)
        for v in px:
            exp = exp * 2 + (1 if v > mean else 0)
        assert hp.loc[did].ahash == exp
    # plant two identical images → one group, keeper = min id
    dup = spark.createDataFrame(
        [(100, "same bytes here"), (200, "same bytes here"), (300, "different")],
        "doc_id long, text string",
    )
    g = ahash_dup_groups(
        image_ahash(decode_image(attach_image_payload(dup, 16, 8), fmt="pgm"))
    ).toPandas()
    assert len(g) == 1 and g.keeper[0] == 100 and g.n_dups[0] == 2


def test_audio_fingerprint_bits(docs, spark):
    """afp packs |s[j+1]|>|s[j]| MSB-first over the first 33 samples; a
    1-sample clip fingerprints to 0; identical clips collide exactly."""
    wav = attach_audio_payload(docs, sample_rate=8000)
    out = {r["doc_id"]: r for r in decode_audio(wav).collect()}
    amps = np.abs((np.frombuffer(("abcdefgh" * 4).encode(), np.uint8).astype(np.int64) - 128) * 256)
    exp = 0
    for j in range(min(len(amps), 33) - 1):
        exp = (exp << 1) | (1 if amps[j + 1] > amps[j] else 0)
    exp <<= 32 - (min(len(amps), 33) - 1)
    assert out[0]["afp"] == exp
    assert out[1]["afp"] == 0  # single sample, no deltas
