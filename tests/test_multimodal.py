"""Multimodal plumbing: schemas, batch shapes, and deterministic
stub transforms (decode itself is a marked stub)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bireme_spark.operators.multimodal import (
    FRAME_SIZE,
    attach_binary_payload,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)


@pytest.fixture()
def packed(spark):
    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 600), (3, "")], "doc_id long, text string"
    )
    return attach_binary_payload(df, "doc_id", "text")


def test_decode_stub_raises_for_media_modes():
    assert decode_media(b"xy", "bytes") == b"xy"
    with pytest.raises(NotImplementedError):
        decode_media(b"xy", "image")


def test_extract_features_shapes(packed):
    rows = {r.doc_id: r for r in extract_features(packed).collect()}
    assert rows[1].n_bytes == 100 and rows[1].head_byte == ord("a")
    assert rows[3].n_bytes == 0 and rows[3].head_byte == -1


def test_resize_pads_and_truncates(packed):
    out = {r.doc_id: r for r in resize_media(packed, 16, 16).collect()}
    assert all(len(r.payload) == 256 for r in out.values())
    assert out[1].payload[:100] == b"a" * 100  # content preserved
    assert out[1].payload[100:] == b"\x00" * 156  # zero-padded
    assert out[2].payload == b"b" * 256  # truncated
    assert (out[1].width, out[1].height) == (16, 16)


def test_sample_frames_stride_and_fanout(packed):
    frames = sample_frames(packed, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2: 600 bytes → 3 frames (256,256,88) → sampled idx 0, 2
    assert [r.frame_idx for r in sorted(by_doc[2], key=lambda r: r.frame_idx)] == [0, 2]
    f0, f2 = sorted(by_doc[2], key=lambda r: r.frame_idx)
    assert f0.n_frame_bytes == FRAME_SIZE and f2.n_frame_bytes == 600 - 2 * FRAME_SIZE
    # doc 1: 100 bytes → 1 frame; doc 3: empty → no frames
    assert [r.frame_idx for r in by_doc[1]] == [0]
    assert 3 not in by_doc


def test_frames_stay_distributed(spark, packed):
    # the fan-out happens inside mapInPandas — no exchange added
    plan = sample_frames(packed, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
