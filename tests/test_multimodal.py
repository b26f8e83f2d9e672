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


@pytest.fixture()
def media_df(spark):
    docs = _docs(
        spark,
        [(i, f"document body text {i} " * (i % 4 + 1), 20 * (i % 4 + 1))
         for i in range(12)],
    )
    return attach_payload(docs)


def _make_fake_decoder():
    """Deterministic stand-in codec: header dims + body bytes as pixels.
    Returned as a NESTED function so cloudpickle ships it by VALUE —
    module-level test functions aren't importable on executors."""

    def fake(payload: bytes):
        import numpy as np

        w = int(payload[4:12])
        h = int(payload[12:20])
        body = np.frombuffer(payload, dtype=np.uint8)[20:]
        return w, h, body

    return fake


def test_decode_pixels_with_injected_codec(spark, media_df):
    """The codec seam: a fake decoder exercises the full Arrow path; the
    per-doc mean pixel matches a plain-Python recompute."""
    from esco_neo4j_spark.operators.multimodal import decode_pixels

    fake = _make_fake_decoder()
    imgs = media_df.filter("modality = 'image'")
    got = {r["doc_id"]: r for r in decode_pixels(imgs, fake).collect()}
    raw = {r["doc_id"]: bytes(r["payload"]) for r in imgs.collect()}
    assert got.keys() == raw.keys() and len(got) > 0
    for doc_id, payload in list(raw.items())[:10]:
        w, h, body = fake(payload)
        assert got[doc_id]["width"] == w
        assert got[doc_id]["height"] == h
        import math

        expect = math.floor(int(body.sum()) / len(body) * 1e6 + 0.5) / 1e6
        assert got[doc_id]["mean_px"] == expect


def test_decode_pixels_default_stub_raises(spark, media_df):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from esco_neo4j_spark.operators.multimodal import decode_pixels

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        decode_pixels(media_df.filter("modality = 'image'").limit(1)).collect()
    assert "pixel decode" in str(exc.value)
