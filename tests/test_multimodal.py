"""Multimodal plumbing tests: binary schema, Arrow round-trip of raw
bytes, deterministic fake decode, and the NotImplementedError gate for
the real codec path."""

import pandas as pd
import pytest

from faiss_metal_spark.operators.multimodal import (
    THUMB_TAPS,
    attach_payload,
    byte_stats,
    decode_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def mm(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["abcdefgh" * 4, "z", ""],
            }
        ),
        schema="doc_id long, text string",
    )
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


def test_decode_image_stub_gate(mm):
    with pytest.raises(NotImplementedError):
        decode_image(mm)


def test_fake_decode_deterministic(mm):
    a = decode_image(mm, fake=True).orderBy("doc_id", "px_idx").collect()
    b = decode_image(mm, fake=True).orderBy("doc_id", "px_idx").collect()
    assert a == b
    d1 = [r["px"] for r in a if r["doc_id"] == 1]
    assert d1 == [ord("z")] * THUMB_TAPS  # single-byte payload: every tap hits it
    assert len([r for r in a if r["doc_id"] == 0]) == THUMB_TAPS
