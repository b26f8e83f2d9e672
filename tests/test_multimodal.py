"""Unit tests for the multimodal binary-column operators (the oracle
parity test covers the query-level contract; these cover edge cases and
the intentionally-stubbed decode path)."""

from __future__ import annotations

import pytest

from esco_neo4j_spark.operators.multimodal import (
    HEADER_LEN,
    attach_payload,
    decode_image_pixels,
    decode_media,
    extract_features,
    sample_frames,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint")


def test_payload_roundtrip_and_header(spark):
    docs = _docs(spark, [(0, "hello world", 11), (1, "a", 1), (2, "vid", 3)])
    meta = {r["doc_id"]: r for r in decode_media(attach_payload(docs)).collect()}
    assert meta[0]["modality"] == "image" and meta[1]["modality"] == "audio"
    assert meta[2]["modality"] == "video"
    assert meta[0]["payload_bytes"] == HEADER_LEN + 11
    # audio: d1 = 8000 + (1 % 5) * 1000, d2 = 500 + 1 * 3
    assert (meta[1]["d1"], meta[1]["d2"]) == (9000, 503)


def test_header_fields_clamped_to_8_digits(spark):
    # audio d2 = 500 + n_chars*3 would be 120000500 (9 digits) for a 40M-char
    # doc; the %08d slice is a fixed offset, so the field must clamp mod 1e8
    # or every downstream byte-offset parse silently shifts.
    docs = _docs(spark, [(1, "tiny body", 40_000_000)])
    row = decode_media(attach_payload(docs)).collect()[0]
    assert row["d2"] == (500 + 40_000_000 * 3) % 100_000_000
    assert row["payload_bytes"] == HEADER_LEN + 9  # header did not grow


def test_non_ascii_stripped_from_body(spark):
    docs = _docs(spark, [(3, "aéb\nc", 5)])  # é and newline dropped
    row = decode_media(attach_payload(docs)).collect()[0]
    assert row["body_bytes"] == 3


def test_empty_body_yields_no_features(spark):
    docs = _docs(spark, [(0, "éé", 2), (1, "ok", 2)])
    rows = extract_features(attach_payload(docs)).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_frame_sample_stride(spark):
    # doc_id=2 -> video, fps = 12 + (2%3)*6 = 24, n_frames = 24 + 25 % 240 = 49
    docs = _docs(spark, [(2, "x" * 25, 25)])
    rows = sample_frames(attach_payload(docs), every=10).collect()
    assert [r["frame_idx"] for r in rows] == [0, 10, 20, 30, 40]
    assert rows[1]["t_offset_ms"] == 10 * 1000 // 24


def test_pixel_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_pixels(b"IMG0" + b"0" * 16)
