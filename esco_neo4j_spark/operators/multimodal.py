"""Multimodal column operators: opaque binary media + typed metadata.

North-star LLM-pipeline extension (absent from the reference, which is
text-only — SURVEY.md §2 coverage note): treat image/audio/video as opaque
``binary`` columns with a typed metadata struct, and implement decode /
feature-extract / resize / frame-sample as Arrow-batched pandas functions
over ``mapInPandas``.

The container has no image codec LIBRARY, so pixel decode is implemented
for the one format that needs none: binary PPM (P6), parsed pure-Python
byte-by-byte (``decode_ppm``). Compressed formats (JPEG/PNG/...) still
need a codec and raise a clear ValueError at the same seam — swap in
PIL/libvips via ``decode_pixels(decoder_fn=...)``. Everything else is
real and oracle-checked:

- the binary payload is genuinely constructed (20-byte ASCII header +
  ASCII-sanitized body bytes) and genuinely parsed back byte-by-byte in
  ``mapInPandas`` workers from the raw ``bytes`` objects;
- header fields are DETERMINISTIC functions of (doc_id, n_chars), so a
  DuckDB oracle can recompute every output without touching binary —
  the parse itself is what the parity check exercises;
- batch shape, Arrow transfer, output schemas, and partitioning are the
  production plumbing a real decoder would drop into.

Header layout (bytes, all ASCII):
  [0:4)   magic: IMG0 | AUD0 | VID0        (modality = doc_id % 3)
  [4:12)  d1: 8-digit zero-padded decimal  (width | sample_rate | fps)
  [12:20) d2: 8-digit zero-padded decimal  (height | duration_ms | n_frames)
  [20:)   body: text with non-printable-ASCII stripped, UTF-8 (=1B/char)

Scale notes (100 TB): every operator here is a narrow map over one table —
no shuffle, no driver collect. Payloads stream through Arrow record
batches; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds worker
memory, and a real deployment would store payloads in Parquet binary
columns (or pointers to object storage) partitioned by modality so
modality filters prune at the file level.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")
MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}
HEADER_LEN = 20

# deterministic synthetic metadata (mirrored in the DuckDB oracle SQL):
#   image: d1 = width       = 64 + (doc_id * 7) % 960
#          d2 = height      = 64 + n_chars % 540
#   audio: d1 = sample_rate = 8000 + (doc_id % 5) * 1000
#          d2 = duration_ms = 500 + n_chars * 3
#   video: d1 = fps         = 12 + (doc_id % 3) * 6
#          d2 = n_frames    = 24 + n_chars % 240


# Both header fields are clamped mod 1e8: the %08d slices below are FIXED
# 8-byte offsets and format_string does not truncate, so an unclamped value
# (audio d2 = 500 + n_chars*3 exceeds 8 digits past ~33M chars) would grow
# the header and silently shift every downstream byte-offset parse. The
# oracle SQL applies the same modulus.
_FIELD_MOD = 100_000_000


def _d1_expr():
    return (
        F.when(F.col("modality") == "image", 64 + (F.col("doc_id") * 7) % 960)
        .when(F.col("modality") == "audio", 8000 + (F.col("doc_id") % 5) * 1000)
        .otherwise(12 + (F.col("doc_id") % 3) * 6)
        .cast("bigint")
        % _FIELD_MOD
    )


def _d2_expr():
    return (
        F.when(F.col("modality") == "image", 64 + F.col("n_chars") % 540)
        .when(F.col("modality") == "audio", 500 + F.col("n_chars") * 3)
        .otherwise(24 + F.col("n_chars") % 240)
        .cast("bigint")
        % _FIELD_MOD
    )


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, modality, payload binary).

    Builds the binary media column JVM-side: header fields are formatted
    with ``format_string`` and the whole payload assembled with
    ``concat(encode(...))`` — binary concat stays in whole-stage codegen,
    no Python on this path.
    """
    body = F.regexp_replace(F.col("text"), "[^ -~]", "")  # printable ASCII
    magic = (
        F.when(F.col("modality") == "image", F.lit("IMG0"))
        .when(F.col("modality") == "audio", F.lit("AUD0"))
        .otherwise(F.lit("VID0"))
    )
    header = F.concat(magic, F.format_string("%08d", _d1_expr()),
                      F.format_string("%08d", _d2_expr()))
    return (
        docs.withColumn(
            "modality",
            F.element_at(F.array(*[F.lit(m) for m in MODALITIES]),
                         (F.col("doc_id") % 3 + 1).cast("int")),
        )
        .select(
            "doc_id",
            "modality",
            F.encode(F.concat(header, body), "UTF-8").alias("payload"),
        )
    )


def decode_ppm(payload: bytes):
    """Pure-Python binary PPM (P6) decoder — uncompressed, so no codec
    library is needed: ASCII header ``P6 <w> <h> <maxval>`` (tokens
    separated by whitespace, ``#`` comments allowed) followed by exactly
    one whitespace byte and w*h*3 raw RGB sample bytes.

    Returns ``(width, height, uint8 numpy array of the w*h*3 samples)``.
    Raises ValueError on malformed input (wrong magic, >8-bit maxval,
    truncated pixel data) — decode errors must be loud, not silent rows.
    """
    import numpy as np

    data = bytes(payload)
    if data[:2] != b"P6":
        raise ValueError(f"not a binary PPM (P6) payload: magic={data[:2]!r}")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1] in b" \t\r\n":
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and data[pos : pos + 1] not in b" \t\r\n":
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval=255), got {maxval}")
    pos += 1  # exactly ONE whitespace byte separates header from raster
    px = np.frombuffer(data, dtype=np.uint8, offset=pos)
    if px.size != width * height * 3:
        raise ValueError(
            f"PPM raster is {px.size} bytes, expected {width * height * 3}"
        )
    return width, height, px


def decode_image_pixels(payload: bytes):
    """Pixel decode dispatch: binary PPM decodes pure-Python here; any
    compressed format needs a codec library (PIL/libvips) injected via
    ``decode_pixels(decoder_fn=...)`` — same seam, loud error."""
    if bytes(payload[:2]) == b"P6":
        return decode_ppm(payload)
    raise ValueError(
        "no codec for this image format in this environment; inject a "
        "decoder (bytes -> (w, h, uint8 samples)) via decoder_fn"
    )


DECODE_SCHEMA = (
    "doc_id bigint, modality string, d1 bigint, d2 bigint, "
    "payload_bytes bigint, body_bytes bigint"
)


from esco_neo4j_spark.functions.numeric import round6 as _round6  # noqa: E402


def decode_media(media: DataFrame) -> DataFrame:
    """Parse the binary header back into typed metadata via mapInPandas.

    This is the genuine binary path: each Arrow batch arrives as a pandas
    DataFrame whose payload cells are raw ``bytes``; the header is sliced
    and parsed per row. One narrow map — no shuffle.
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": payloads.map(
                        lambda b: {b"IMG0": "image", b"AUD0": "audio",
                                   b"VID0": "video"}[bytes(b[:4])]
                    ),
                    "d1": payloads.map(lambda b: int(bytes(b[4:12]))),
                    "d2": payloads.map(lambda b: int(bytes(b[12:20]))),
                    "payload_bytes": payloads.map(len),
                    "body_bytes": payloads.map(lambda b: len(b) - HEADER_LEN),
                }
            )

    return media.mapInPandas(parse, schema=DECODE_SCHEMA)


FEATURE_SCHEMA = (
    "doc_id bigint, body_bytes bigint, mean_byte double, ws_frac double"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Numeric feature extraction over raw payload bytes (numpy per Arrow
    batch): mean byte value and whitespace fraction of the body. The shape
    a real embedding/CLIP featurizer would take — binary in, fixed-width
    numeric out."""
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = np.frombuffer(bytes(payload), dtype=np.uint8)[HEADER_LEN:]
                if body.size == 0:
                    continue  # empty media: no features (oracle filters too)
                # exact integer sums, ONE correctly-rounded division, then
                # explicit half-up 6dp rounding — numpy's float .mean()
                # sums pairwise while the SQL oracle sums sequentially,
                # which flipped a 6dp boundary at sf0.1
                rows.append(
                    (
                        doc_id,
                        int(body.size),
                        _round6(int(body.sum()) / body.size),
                        _round6(int((body == 32).sum()) / body.size),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "body_bytes", "mean_byte", "ws_frac"]
            )

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, t_offset_ms bigint"


def sample_frames(media: DataFrame, every: int = 10) -> DataFrame:
    """Frame sampling for video payloads: every ``every``-th frame index
    with its millisecond offset (frame_idx * 1000 // fps). Emits multiple
    rows per input row from inside mapInPandas — the UDTF-ish shape a real
    ffmpeg frame extractor would use (bytes in, frame rows out)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_t = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"VID0":
                    continue
                fps, n_frames = int(b[4:12]), int(b[12:20])
                for idx in range(0, n_frames, every):
                    out_id.append(doc_id)
                    out_idx.append(idx)
                    out_t.append(idx * 1000 // fps)
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "t_offset_ms": out_t}
            )

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, out_w bigint, out_h bigint"
)


def resize_dims(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize planning for image payloads: integer-exact target dimensions
    preserving aspect ratio (downscale-only to ``max_dim``). The actual
    pixel resample is behind the decode stub; the dimension plan — what a
    thumbnail/training-resolution pipeline shuffles on — is computed from
    the parsed header."""

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"IMG0":
                    continue
                w, h = int(b[4:12]), int(b[12:20])
                m = max(w, h)
                if m <= max_dim:
                    ow, oh = w, h
                else:
                    ow, oh = w * max_dim // m, h * max_dim // m
                rows.append((doc_id, w, h, ow, oh))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "out_w", "out_h"]
            )

    return media.mapInPandas(plan, schema=RESIZE_SCHEMA)


def attach_ppm_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, w, h, payload) where payload is a VALID
    binary PPM (P6) image built entirely JVM-side: the ASCII header via
    format_string, the raster via a hex-string projection + ``unhex``
    (transform over a sequence stays in codegen; unhex turns the 2-digit
    hex pairs into the raw 0..255 sample bytes that UTF-8 encode cannot
    produce).

    Deterministic pixel scheme (mirrored by the DuckDB oracle):
      w = 8 + doc_id % 9, h = 6 + doc_id % 7,
      sample i (0-based, of w*h*3) = (doc_id * 31 + i * 7) % 256.
    Small images by design — the point is genuine bytes through a genuine
    decoder, not volume; a real corpus reads payloads from parquet binary
    columns instead.
    """
    d = docs.select(
        "doc_id",
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (6 + F.col("doc_id") % 7).cast("int").alias("h"),
    ).withColumn("n", (F.col("w") * F.col("h") * 3).cast("int"))
    hex_px = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.col("n") - 1),
            lambda i: F.lpad(
                F.hex((F.col("doc_id") * 31 + i * 7) % 256), 2, "0"
            ),
        ),
        "",
    )
    header = F.format_string("P6\n%d %d\n255\n", F.col("w"), F.col("h"))
    return d.select(
        "doc_id",
        "w",
        "h",
        F.concat(F.encode(header, "UTF-8"), F.unhex(hex_px)).alias("payload"),
    )


PIXEL_SCHEMA = "doc_id bigint, width int, height int, mean_px double"


def decode_pixels(media: DataFrame, decoder_fn=None) -> DataFrame:
    """Pixel decode with an INJECTED codec seam (same pattern as
    operators/textmodel.py's ``model_fn``: the environment-dependent
    heavy dependency is a plain callable parameter, so the Spark-side
    plumbing — Arrow batching, schema, per-row byte handoff — is fully
    testable without the codec, and production swaps in PIL/libvips
    without touching the operator).

    ``decoder_fn``: picklable ``bytes -> (width, height, uint8-array)``.
    Default is ``decode_image_pixels``: genuine pure-Python PPM decode,
    loud ValueError for compressed formats (which need an injected
    codec). One narrow mapInPandas, no shuffle; mean_px rounded 6dp like
    every float feature here.
    """
    fn = decoder_fn or decode_image_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = fn(bytes(payload))
                rows.append(
                    (doc_id, int(w), int(h),
                     _round6(int(px.sum()) / max(px.size, 1)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_px"]
            )

    return media.mapInPandas(run, schema=PIXEL_SCHEMA)


PIXEL_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, mean_px double, "
    "min_px int, max_px int"
)


def pixel_stats(media: DataFrame, decoder_fn=None) -> DataFrame:
    """Per-image channel-value statistics (mean/min/max over all RGB
    samples) from REAL pixel decode — the first operator downstream of a
    decoder in any image-curation pipeline (brightness filters, dead-
    image detection). Integer sums + one division + half-up 6dp rounding
    keep the result exactly reproducible by the SQL oracle. One narrow
    mapInPandas over the payload column, no shuffle."""
    fn = decoder_fn or decode_image_pixels

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = fn(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        int(w),
                        int(h),
                        _round6(int(px.sum()) / max(px.size, 1)),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mean_px", "min_px", "max_px",
                ],
            )

    return media.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def _le_hex(col, n_bytes: int):
    """Hex string of ``col`` as an n-byte little-endian integer — feeds
    ``unhex`` when building real binary file formats JVM-side."""
    parts = [
        F.lpad(F.hex((col.cast("long") / (256 ** j)).cast("long") % 256), 2, "0")
        for j in range(n_bytes)
    ]
    return F.concat(*parts)


def attach_wav_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, n_samples, payload) where payload is a VALID
    RIFF/WAVE PCM16 mono file built entirely JVM-side: ASCII chunk ids
    via encode, little-endian header integers and sample words via a
    hex-string projection + ``unhex`` (same construction as
    attach_ppm_payload — transform over a sequence stays in codegen).

    Deterministic sample scheme (mirrored by the DuckDB oracle):
      n_samples = 64 + doc_id % 129, sample_rate = 8000 Hz,
      raw 16-bit word i = (doc_id * 37 + i * 11) % 65536
      (two's complement: value = word - 65536 when word >= 32768).
    """
    d = docs.select(
        "doc_id",
        (64 + F.col("doc_id") % 129).cast("int").alias("n_samples"),
    ).withColumn("data_size", (F.col("n_samples") * 2).cast("long"))
    word = lambda i: (F.col("doc_id") * 37 + i * 11) % 65536  # noqa: E731
    samples_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.col("n_samples") - 1),
            lambda i: F.concat(
                F.lpad(F.hex(word(i) % 256), 2, "0"),
                F.lpad(F.hex((word(i) / 256).cast("long")), 2, "0"),
            ),
        ),
        "",
    )
    payload = F.concat(
        F.encode(F.lit("RIFF"), "UTF-8"),
        F.unhex(_le_hex(F.col("data_size") + 36, 4)),
        F.encode(F.lit("WAVEfmt "), "UTF-8"),
        F.unhex(F.lit("10000000")),          # fmt chunk size 16, LE
        F.unhex(F.lit("0100")),              # PCM
        F.unhex(F.lit("0100")),              # mono
        F.unhex(F.lit("401F0000")),          # sample_rate 8000, LE
        F.unhex(F.lit("803E0000")),          # byte_rate 16000, LE
        F.unhex(F.lit("0200")),              # block_align 2
        F.unhex(F.lit("1000")),              # bits 16
        F.encode(F.lit("data"), "UTF-8"),
        F.unhex(_le_hex(F.col("data_size"), 4)),
        F.unhex(samples_hex),
    )
    return d.select("doc_id", "n_samples", payload.alias("payload"))


def decode_wav(payload: bytes):
    """Genuine pure-Python RIFF/WAVE parser for PCM16 mono: walks the
    chunk list (not fixed offsets — real WAV files may carry LIST/fact
    chunks), validates the fmt chunk, and returns (sample_rate,
    int16-numpy samples). Loud ValueError on anything non-PCM16."""
    import numpy as np

    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={fmt} ch={ch} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples int, peak int, rms double"
)


def audio_loudness(media: DataFrame) -> DataFrame:
    """Per-clip loudness statistics from REAL WAV decode — the first
    operator downstream of an audio decoder in any speech-curation
    pipeline (silence/clipping detection, loudness normalization).
    peak = max |sample|; rms = sqrt(ssq/n) where ssq is an exact integer
    sum of squares, so the one sqrt is a correctly-rounded IEEE op on an
    identical double in both engines — 6dp rounding is stable. One
    narrow mapInPandas, no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_wav(bytes(payload))
                ssq = int((s.astype("int64") ** 2).sum())
                n = int(s.size)
                rms = _round6((ssq / n) ** 0.5) if n else 0.0
                rows.append(
                    (doc_id, rate, n, int(abs(s.astype("int64")).max()), rms)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "peak", "rms"],
            )
            rows = []

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


# --- pHash: 8x8 integer-DCT perceptual hash over REAL decoded pixels -------
PHASH_SCHEMA = "doc_id bigint, phash bigint, n_bits int"


def phash_q_matrix() -> list[list[int]]:
    """Quantized orthonormal DCT-II basis: Q[u][x] =
    round(s_u * cos(pi*(2x+1)*u/16) * 1e4), s_0 = sqrt(1/8), else
    sqrt(2/8). Quantizing the basis to INTEGERS (|Q| <= 5000) makes the
    whole transform exact int64 arithmetic — coefficient magnitudes cap
    at 255 * 5000 * 5000 * 64 ~= 4.1e11, far inside int64 — so the
    pHash is bit-identical across engines by construction: the same
    list literals feed the numpy matmul AND the generated oracle SQL.
    A float DCT would hash-match only up to libm ulp luck."""
    import math

    out = []
    for u in range(8):
        s = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        out.append(
            [
                round(s * math.cos(math.pi * (2 * x + 1) * u / 16) * 10000)
                for x in range(8)
            ]
        )
    return out


def phash64(media: DataFrame, decoder_fn=None) -> DataFrame:
    """64-bit perceptual hash (pHash, DCT family — the robust standard
    aHash approximates): decode the payload, grayscale via exact integer
    luma ((299R + 587G + 114B) // 1000), nearest-sample an 8x8 grid
    (px = (gx*w)//8 — integer, so any w x h replays exactly), 2-D
    integer DCT (Q @ luma @ Q^T with the quantized basis above), then
    bit k = (AC coefficient k > lower-median of the 63 ACs). DC is
    excluded as in the reference algorithm; 63 bits, row-major.

    This is the multimodal near-dup fingerprint that survives what
    byte-level hashing can't (re-encoding, brightness shifts move few
    DCT signs); downstream it bands exactly like simhash/ahash. One
    narrow mapInPandas over the payload column — rides the corpus scan,
    no shuffle; at 100 TB the decode is the cost and this adds ~4k
    integer multiplies per image on top."""
    import numpy as np

    fn = decoder_fn or decode_image_pixels
    q = np.array(phash_q_matrix(), dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = fn(bytes(payload))
                lm = np.zeros((8, 8), dtype=np.int64)
                for gx in range(8):
                    for gy in range(8):
                        idx = (((gy * h) // 8) * w + (gx * w) // 8) * 3
                        lm[gx, gy] = (
                            299 * int(px[idx])
                            + 587 * int(px[idx + 1])
                            + 114 * int(px[idx + 2])
                        ) // 1000
                coef = q @ lm @ q.T
                ac = [int(coef[c // 8, c % 8]) for c in range(1, 64)]
                med = sorted(ac)[31]
                ph, nb = 0, 0
                for k, v in enumerate(ac):
                    if v > med:
                        ph |= 1 << k
                        nb += 1
                rows.append((int(doc_id), ph, nb))
            yield pd.DataFrame(rows, columns=["doc_id", "phash", "n_bits"])

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


IMG_EMBED_DIM = 8


def embed_pixels(
    media: DataFrame,
    dim: int = IMG_EMBED_DIM,
    model_fn=None,
    decoder_fn=None,
) -> DataFrame:
    """Image-encoder seam for the CLIP-shape alignment pipeline (the
    image-side twin of textmodel.make_embed_udf): decode pixels in the
    executor, then embed each image.

    ``model_fn``: picklable ``list[uint8 sample arrays] -> list of
    float vectors`` — the REAL encoder branch (a vision tower in
    production; tests drive it with a deterministic fake the way
    tests/fakes drives the sentence-transformers branch). When absent,
    the documented fallback is a deterministic INTEGER folding
    embedding, ``e_k = sum over samples i with i % dim == k of
    (px_i - 128)`` — pure integer arithmetic over the decoded raster,
    so a SQL oracle replays the embedding (and everything downstream)
    exactly, the same contract the hash text embedding gives I1.

    One narrow ``mapInPandas`` over the payload column — no shuffle; at
    100 TB this rides the media scan exactly like decode_pixels.
    """
    import numpy as np

    fn = decoder_fn or decode_image_pixels

    if model_fn is not None:

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, pixels = [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    _, _, px = fn(bytes(payload))
                    ids.append(int(doc_id))
                    pixels.append(px)
                vecs = model_fn(pixels)
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "iemb": [[float(x) for x in v] for v in vecs],
                    }
                )

        return media.mapInPandas(
            run_real, schema="doc_id bigint, iemb array<double>"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, px = fn(bytes(payload))
                v = px.astype(np.int64) - 128
                rows.append(
                    (
                        int(doc_id),
                        [int(v[k::dim].sum()) for k in range(dim)],
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "iemb"])

    return media.mapInPandas(run, schema="doc_id bigint, iemb array<bigint>")
