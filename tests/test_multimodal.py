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


def test_pixel_decode_rejects_unknown_format():
    """Non-PPM payloads (no codec in this container) raise a loud
    ValueError at the decoder seam — never silent empty rows."""
    with pytest.raises(ValueError, match="no codec"):
        decode_image_pixels(b"IMG0" + b"0" * 16)


def test_decode_ppm_roundtrip_and_errors():
    """The pure-Python P6 decoder: exact round-trip on a hand-built
    image, comment + whitespace tolerance in the header, and loud errors
    on wrong magic / deep maxval / truncated raster."""
    import numpy as np

    from esco_neo4j_spark.operators.multimodal import decode_ppm

    raster = bytes(range(2 * 3 * 3))  # 2x3 RGB, samples 0..17
    w, h, px = decode_ppm(b"P6\n2 3\n255\n" + raster)
    assert (w, h) == (2, 3) and px.tolist() == list(range(18))
    # comments and arbitrary whitespace between header tokens
    w2, h2, px2 = decode_ppm(b"P6 # ppm\n# comment line\n 2\t3 # dims\n255\n" + raster)
    assert (w2, h2) == (2, 3) and np.array_equal(px, px2)
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P5\n2 3\n255\n" + raster)
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 3\n65535\n" + raster)
    with pytest.raises(ValueError, match="raster"):
        decode_ppm(b"P6\n2 3\n255\n" + raster[:-1])


def test_attach_ppm_payload_is_valid_ppm(spark):
    """JVM-built payloads (format_string header + unhex raster) decode
    to exactly the deterministic pixel formula."""
    from esco_neo4j_spark.operators.multimodal import (
        attach_ppm_payload,
        decode_ppm,
    )

    docs = _docs(spark, [(i, f"txt {i}", 5) for i in range(10)])
    rows = attach_ppm_payload(docs).collect()
    assert len(rows) == 10
    for r in rows:
        w, h, px = decode_ppm(bytes(r["payload"]))
        assert (w, h) == (r["w"], r["h"])
        assert w == 8 + r["doc_id"] % 9 and h == 6 + r["doc_id"] % 7
        expect = [(r["doc_id"] * 31 + i * 7) % 256 for i in range(w * h * 3)]
        assert px.tolist() == expect


def test_pixel_stats_spark_path(spark):
    """pixel_stats over the Arrow path agrees with a plain-Python
    recompute of the same decoder on the same payloads."""
    from esco_neo4j_spark.operators.multimodal import (
        attach_ppm_payload,
        decode_ppm,
        pixel_stats,
    )

    docs = _docs(spark, [(i, f"txt {i}", 5) for i in range(8)])
    media = attach_ppm_payload(docs)
    got = {r["doc_id"]: r for r in pixel_stats(media).collect()}
    import math

    for r in media.collect():
        w, h, px = decode_ppm(bytes(r["payload"]))
        g = got[r["doc_id"]]
        assert (g["width"], g["height"]) == (w, h)
        assert g["mean_px"] == math.floor(int(px.sum()) / px.size * 1e6 + 0.5) / 1e6
        assert g["min_px"] == int(px.min()) and g["max_px"] == int(px.max())


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


def test_decode_pixels_default_rejects_non_ppm(spark, media_df):
    """The default decoder is real PPM decode; the IMG0 synthetic
    payloads are NOT PPM, so they must fail loudly on the executor."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from esco_neo4j_spark.operators.multimodal import decode_pixels

    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        decode_pixels(media_df.filter("modality = 'image'").limit(1)).collect()
    assert "no codec" in str(exc.value)


def test_wav_decoder_round_trip_and_chunk_walking():
    """decode_wav must (1) round-trip the exact int16 samples written by
    a reference struct-built file, (2) tolerate an extra LIST chunk
    before data with odd-size 2-byte alignment (real WAV files have
    these), and (3) refuse non-PCM16 layouts loudly."""
    import struct

    import numpy as np
    import pytest as _pytest

    from esco_neo4j_spark.operators.multimodal import decode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    extra = b"xyz"  # odd-size chunk -> pad byte must be skipped
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", len(extra)) + extra + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, out = decode_wav(wav)
    assert rate == 8000 and np.array_equal(out, samples)

    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad_body = (
        b"fmt " + struct.pack("<I", len(stereo_fmt)) + stereo_fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    bad = b"RIFF" + struct.pack("<I", 4 + len(bad_body)) + b"WAVE" + bad_body
    with _pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bad)
    with _pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + bytes(40))


def test_wav_payload_builder_matches_decoder(spark):
    """attach_wav_payload's JVM-built bytes parse back to the formula's
    samples exactly (build -> binary -> decode identity, audio twin of
    the PPM round-trip)."""
    import numpy as np

    from esco_neo4j_spark.operators.multimodal import (
        attach_wav_payload, decode_wav,
    )

    docs = spark.createDataFrame([(7, "x", "en", "s", 1)],
                                 ["doc_id", "text", "lang", "source", "n_chars"])
    row = attach_wav_payload(docs).collect()[0]
    rate, s = decode_wav(bytes(row["payload"]))
    n = 64 + 7 % 129
    want = np.array(
        [((7 * 37 + i * 11) % 65536 + 32768) % 65536 - 32768 for i in range(n)],
        dtype="int64",
    )
    assert rate == 8000 and row["n_samples"] == n
    assert np.array_equal(s.astype("int64"), want)


def test_embed_pixels_fallback_matches_formula(spark):
    """The deterministic image embedding folds the decoded raster:
    e_k = sum over samples i % dim == k of (px_i - 128), computed from
    GENUINE bytes through the genuine PPM decoder."""
    import numpy as np

    from esco_neo4j_spark.operators.multimodal import (
        attach_ppm_payload, embed_pixels,
    )

    docs = spark.createDataFrame(
        [(6, "x", "en", "s", 1), (12, "y", "en", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    media = attach_ppm_payload(docs).select("doc_id", "payload")
    got = {r["doc_id"]: list(r["iemb"]) for r in embed_pixels(media).collect()}
    for d in (6, 12):
        w, h = 8 + d % 9, 6 + d % 7
        px = np.array([(d * 31 + i * 7) % 256 for i in range(w * h * 3)])
        v = px - 128
        want = [int(v[k::8].sum()) for k in range(8)]
        assert got[d] == want


def test_embed_pixels_real_branch_uses_injected_model(spark):
    """The model_fn seam (the vision-tower REAL branch): an injected
    encoder receives the decoded uint8 rasters and its outputs become
    the embeddings verbatim — the image twin of the fake
    sentence-transformers REAL-branch test."""
    from esco_neo4j_spark.operators.multimodal import (
        attach_ppm_payload, embed_pixels,
    )

    def fake_vision_tower(pixel_arrays):
        # deterministic: [n_samples, first_sample] per image
        return [[float(px.size), float(px[0])] for px in pixel_arrays]

    docs = spark.createDataFrame(
        [(3, "x", "en", "s", 1)], ["doc_id", "text", "lang", "source", "n_chars"]
    )
    media = attach_ppm_payload(docs).select("doc_id", "payload")
    rows = embed_pixels(media, model_fn=fake_vision_tower).collect()
    assert len(rows) == 1
    w, h = 8 + 3 % 9, 6 + 3 % 7
    assert rows[0]["iemb"] == [float(w * h * 3), float((3 * 31) % 256)]


def test_image_text_align_broadcasts_image_side(spark):
    """Plan pin (r6 verdict item 4): the cross-modal join must broadcast
    the smaller (image-embedding) side — the caption corpus never
    shuffles on the join key."""
    import contextlib
    import io
    import os

    from esco_neo4j_spark.catalog import load_tables
    from esco_neo4j_spark.plans.registry import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    load_tables(spark, sf, ("documents",))
    df = REGISTRY["pipeline_image_text_align"].fn(spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
