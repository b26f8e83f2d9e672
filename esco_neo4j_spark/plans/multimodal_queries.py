"""Multimodal-column query corpus (north-star LLM-pipeline extension).

The reference is text-only, so this whole family is an extension (SURVEY.md
§2 coverage note). Binary payloads are deterministically synthesized from
the documents table (operators/multimodal.py header spec), so the DuckDB
oracle re-derives every output from (doc_id, n_chars, text) WITHOUT binary
support — what the parity check then proves is that the Spark side really
round-trips the bytes: build payload -> Arrow batch -> parse bytes ->
metadata/features/frames must land on the oracle's arithmetic exactly.

Rounding: pandas-side uses floor(x*1e6 + 0.5)/1e6 (half-up on the double),
the same tie behavior as DuckDB ``round(x, 6)`` on positive doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esco_neo4j_spark.operators.multimodal import (
    attach_payload,
    attach_ppm_payload,
    decode_media,
    extract_features,
    pixel_stats,
    resize_dims,
    sample_frames,
)
from esco_neo4j_spark.plans.registry import query

# --- shared SQL fragments (mirror operators/multimodal.py header spec) ----
_MODALITY = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)
# % 100000000 mirrors operators/multimodal.py _FIELD_MOD: header fields are
# fixed 8-digit slices, so both sides clamp identically.
_D1 = (
    "((CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id * 7) % 960 "
    "WHEN 1 THEN 8000 + (doc_id % 5) * 1000 "
    "ELSE 12 + (doc_id % 3) * 6 END) % 100000000)"
)
_D2 = (
    "((CASE doc_id % 3 WHEN 0 THEN 64 + n_chars % 540 "
    "WHEN 1 THEN 500 + n_chars * 3 "
    "ELSE 24 + n_chars % 240 END) % 100000000)"
)
_BODY = "regexp_replace(text, '[^ -~]', '', 'g')"


@query(
    "mm_decode_metadata",
    sql=f"""
    SELECT doc_id, {_MODALITY} AS modality,
           CAST({_D1} AS BIGINT) AS d1, CAST({_D2} AS BIGINT) AS d2,
           CAST(20 + length({_BODY}) AS BIGINT) AS payload_bytes,
           CAST(length({_BODY}) AS BIGINT) AS body_bytes
    FROM documents
    ORDER BY doc_id
    """,
    survey_ops="multimodal-decode,I9(ext)",
    bench=True,  # the multimodal headline: binary build + Arrow round-trip
    tables=("documents",),
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build binary media payloads, then parse the bytes back into typed
    metadata with mapInPandas — the oracle proves the byte round-trip is
    exact. Narrow map, no shuffle; at 100 TB this is the per-file decode
    pass of a media ETL."""
    media = attach_payload(spark.table("documents"))
    return decode_media(media).orderBy("doc_id")


@query(
    "mm_feature_extract",
    sql=f"""
    WITH body AS (
      SELECT doc_id, {_BODY} AS b FROM documents WHERE length({_BODY}) > 0
    ),
    codes AS (
      SELECT doc_id, length(b) AS body_bytes,
             list_transform(string_split(b, ''), c -> unicode(c)) AS cs
      FROM body
    )
    SELECT doc_id, CAST(body_bytes AS BIGINT) AS body_bytes,
           CAST(floor(list_sum(cs) * 1.0 / body_bytes * 1e6 + 0.5) / 1e6
             AS DOUBLE) AS mean_byte,
           CAST(floor(len(list_filter(cs, c -> c = 32)) * 1.0 / body_bytes
                      * 1e6 + 0.5) / 1e6 AS DOUBLE) AS ws_frac
    FROM codes
    ORDER BY doc_id
    """,
    survey_ops="multimodal-features,I1(ext)",
    tables=("documents",),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric features from raw payload bytes (numpy over Arrow batches):
    mean byte value + whitespace fraction — the featurizer shape (binary in,
    fixed-width numerics out) a CLIP/wav2vec stage drops into."""
    media = attach_payload(spark.table("documents"))
    return extract_features(media).orderBy("doc_id")


@query(
    "mm_frame_sample",
    sql=f"""
    WITH vids AS (
      SELECT doc_id, {_D1} AS fps, {_D2} AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           CAST(f * 1000 // fps AS BIGINT) AS t_offset_ms
    FROM vids, LATERAL (
      SELECT unnest(generate_series(0, n_frames - 1, 10)) AS f
    )
    ORDER BY doc_id, frame_idx
    """,
    survey_ops="multimodal-framesample,I9(ext)",
    tables=("documents",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling over video payloads: multiple rows out per
    binary row in (UDTF shape via mapInPandas), frame timestamps from the
    parsed fps header field."""
    media = attach_payload(spark.table("documents"))
    return sample_frames(media, every=10).orderBy("doc_id", "frame_idx")


@query(
    "mm_resize_dims",
    sql=f"""
    WITH imgs AS (
      SELECT doc_id, {_D1} AS w, {_D2} AS h
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(CASE WHEN greatest(w, h) <= 256 THEN w
                     ELSE w * 256 // greatest(w, h) END AS BIGINT) AS out_w,
           CAST(CASE WHEN greatest(w, h) <= 256 THEN h
                     ELSE h * 256 // greatest(w, h) END AS BIGINT) AS out_h
    FROM imgs
    ORDER BY doc_id
    """,
    survey_ops="multimodal-resize",
    tables=("documents",),
)
def mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving downscale plan (max dim 256) for image payloads,
    integer-exact; the pixel resample itself sits behind the clearly-marked
    decode stub (operators/multimodal.py:decode_image_pixels)."""
    media = attach_payload(spark.table("documents"))
    return resize_dims(media, max_dim=256).orderBy("doc_id")


@query(
    "mm_modality_stats",
    sql=f"""
    SELECT {_MODALITY} AS modality,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(20 + length({_BODY})) AS BIGINT) AS total_bytes,
           CAST(floor(avg(length({_BODY})) * 1e6 + 0.5) / 1e6 AS DOUBLE)
             AS avg_body_bytes
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
    survey_ops="multimodal-catalog,D2",
    tables=("documents",),
)
def mm_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog rollup per modality over decoded metadata — the partition
    -planning stats (count, bytes) a media lakehouse keys storage layout on.
    Composes decode_media with a JVM-side groupBy: mapInPandas feeds
    whole-stage-codegen agg."""
    media = attach_payload(spark.table("documents"))
    meta = decode_media(media)
    return (
        meta.groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.sum("payload_bytes").alias("total_bytes"),
            (F.floor(F.avg("body_bytes") * 1e6 + F.lit(0.5)) / 1e6)
            .cast("double")
            .alias("avg_body_bytes"),
        )
        .orderBy("modality")
    )


@query(
    "mm_payload_dedup",
    sql=f"""
    WITH hashed AS (
      SELECT doc_id, {_MODALITY} AS modality, md5({_BODY}) AS body_md5
      FROM documents
    )
    SELECT body_md5,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           min(modality) AS modality
    FROM hashed
    GROUP BY body_md5
    ORDER BY body_md5
    """,
    survey_ops="multimodal-dedup(ext),B12,D2",
    tables=("documents",),
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash table over the MEDIA BODY bytes — the dedup key for
    the multimodal column (headers are doc_id-specific, so the hash
    covers the payload body; this corpus is all-distinct, so every group
    has one member — the dedup semantics are carried by the GROUP BY +
    canonical-min shape, same as dedup_exact). The Spark side hashes the
    real binary column built by attach_payload, slicing the 20-byte
    header off JVM-side; the oracle re-derives the same md5 from the raw
    text, so a hash match proves the build -> binary -> slice round-trip
    preserves content byte-for-byte. One shuffle on the hash."""
    media = attach_payload(spark.table("documents"))
    body = F.expr("substring(payload, 21, length(payload) - 20)")
    hashed = media.select(
        "doc_id", "modality", F.md5(body).alias("body_md5")
    )
    return (
        hashed.groupBy("body_md5")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
            F.min("modality").alias("modality"),
        )
        .orderBy("body_md5")
    )


@query(
    "mm_pixel_stats",
    sql="""
    WITH imgs AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, (doc_id * 31 + i * 7) % 256 AS p
      FROM imgs, LATERAL (
        SELECT unnest(generate_series(0, w * h * 3 - 1)) AS i
      )
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(floor(sum(p) * 1.0 / count(*) * 1e6 + 0.5) / 1e6 AS DOUBLE)
             AS mean_px,
           CAST(min(p) AS INT) AS min_px, CAST(max(p) AS INT) AS max_px
    FROM px GROUP BY doc_id, w, h
    ORDER BY doc_id
    """,
    survey_ops="multimodal-pixeldecode,I9(ext)",
    tables=("documents",),
)
def mm_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode end to end: build valid binary PPM (P6) images
    JVM-side (header + raw raster bytes via unhex), ship them through
    Arrow, parse them byte-by-byte with the pure-Python PPM decoder in
    executors, and aggregate per-image channel stats. The oracle
    recomputes mean/min/max from the deterministic pixel formula WITHOUT
    any binary support — a hash match proves the byte-level build ->
    Arrow -> decode round-trip is exact. This retires the former pixel-
    decode stub; compressed codecs still enter via the decoder_fn seam.
    Narrow map + no shuffle: at 100 TB this is the embarrassingly
    parallel decode pass of an image ETL."""
    media = attach_ppm_payload(spark.table("documents"))
    return pixel_stats(media).orderBy("doc_id")


# --- aHash: 8x8 average-hash fingerprint over the payload body ------------
# 64 sample positions spread evenly over the body bytes; bit i = sampled
# byte i brighter than the sample mean (64*p_i > sum). Positions and the
# bit pack are generated from ONE Python loop into identical SQL fragments
# for both engines; i*len < 6.4e9 and 64*p_i sums stay exactly
# representable, so floor-double arithmetic is bit-identical.
_PIX = [
    f"ascii(substring(body, CAST(floor(({i} * len) / 64) AS BIGINT) + 1, 1))"
    for i in range(64)
]
_PTOT = " + ".join(f"p{i}" for i in range(64))
_HLO = " + ".join(
    f"(CASE WHEN 64 * p{i} > ptot THEN {1 << i} ELSE 0 END)" for i in range(32)
)
_HHI = " + ".join(
    f"(CASE WHEN 64 * p{i} > ptot THEN {1 << (i - 32)} ELSE 0 END)"
    for i in range(32, 64)
)
_BAND = (
    "CASE WHEN j < 4 THEN CAST(floor(h_lo / pow(2, 8 * j)) AS BIGINT) % 256 "
    "ELSE CAST(floor(h_hi / pow(2, 8 * (j - 4))) AS BIGINT) % 256 END"
)


@query(
    "mm_ahash_hamming_hist",
    sql=f"""
    WITH m AS (
      SELECT doc_id, {_BODY} AS body FROM documents WHERE doc_id < 8192
    ),
    sized AS (
      SELECT doc_id, body, length(body) AS len FROM m WHERE length(body) >= 64
    ),
    px AS (
      SELECT doc_id, {', '.join(f'{e} AS p{i}' for i, e in enumerate(_PIX))}
      FROM sized
    ),
    tot AS (SELECT *, {_PTOT} AS ptot FROM px),
    h AS (
      SELECT doc_id, {_HLO} AS h_lo, {_HHI} AS h_hi FROM tot
    ),
    bands AS (
      SELECT doc_id, h_lo, h_hi, j, {_BAND} AS band
      FROM h CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7]) AS j)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
             a.h_lo AS alo, a.h_hi AS ahi, b.h_lo AS blo, b.h_hi AS bhi
      FROM bands a JOIN bands b
        ON a.j = b.j AND a.band = b.band AND a.doc_id < b.doc_id
    )
    SELECT CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT)
             AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM cand GROUP BY 1 ORDER BY 1
    """,
    survey_ops="multimodal-phash(ext),C9,D2",
    tables=("documents",),
)
def mm_ahash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash (aHash, the pHash family's DCT-free sibling) perceptual
    fingerprint over the media payload BODY, plus the banded-candidate
    Hamming histogram that calibrates a visual near-dup threshold. The
    64-bit fingerprint is computed from 64 evenly-spaced body samples in
    one projection (no shuffle, whole-stage codegen); candidate pairs come
    from 8x8-bit pigeonhole bands — lossless for hamming<=7, the same
    banding contract as dedup_simhash_banded — so no all-pairs join ever
    forms. This proves the full fingerprint->band->join->bit_count
    refine pipeline on the deterministic synthetic bodies.

    Calibration window (r3, doc_id < 8192): one-byte bands give only 256
    buckets, so candidate pairs grow ~N^2/2048 — fine for threshold
    calibration on a fixed sample (its purpose), quadratic as a corpus
    sweep (the sf1 audit measured 342s at 50k docs). The id bound makes
    the histogram constant cost at any SF; a full-corpus visual dedup
    would band 16 bits (65k buckets, lossless to hamming<=3) like
    dedup_simhash_banded."""
    media = attach_payload(
        spark.table("documents").filter(F.col("doc_id") < 8192)
    )
    body = F.decode(
        F.expr("substring(payload, 21, length(payload) - 20)"), "UTF-8"
    )
    sized = media.select(
        "doc_id", body.alias("body")
    ).withColumn("len", F.length("body")).filter(F.col("len") >= 64)
    px = sized.select(
        "doc_id", *[F.expr(e).alias(f"p{i}") for i, e in enumerate(_PIX)]
    )
    tot = px.withColumn("ptot", F.expr(_PTOT))
    h = tot.select(
        "doc_id",
        F.expr(_HLO).alias("h_lo"),
        F.expr(_HHI).alias("h_hi"),
    )
    bands = h.select(
        "doc_id",
        "h_lo",
        "h_hi",
        F.explode(F.array(*[F.lit(j) for j in range(8)])).alias("j"),
    ).withColumn("band", F.expr(_BAND))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.h_lo").alias("alo"),
            F.col("a.h_hi").alias("ahi"),
            F.col("b.h_lo").alias("blo"),
            F.col("b.h_hi").alias("bhi"),
        )
        .distinct()
    )
    return (
        cand.select(
            (
                F.expr("bit_count(alo ^ blo)") + F.expr("bit_count(ahi ^ bhi)")
            )
            .cast("bigint")
            .alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


@query(
    "mm_audio_loudness",
    sql="""
    WITH clips AS (
      SELECT doc_id, 64 + doc_id % 129 AS n FROM documents
    ),
    samples AS (
      SELECT doc_id, n,
             CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
      FROM (
        SELECT doc_id, n, (doc_id * 37 + i * 11) % 65536 AS u
        FROM clips, LATERAL (
          SELECT unnest(generate_series(0, n - 1)) AS i
        )
      )
    )
    SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
           CAST(n AS INT) AS n_samples,
           CAST(max(abs(v)) AS INT) AS peak,
           CAST(floor(sqrt(sum(v * v) / CAST(count(*) AS DOUBLE))
                      * 1e6 + 0.5) / 1e6 AS DOUBLE) AS rms
    FROM samples GROUP BY doc_id, n
    ORDER BY doc_id
    """,
    survey_ops="multimodal-audiodecode,I9(ext)",
    tables=("documents",),
)
def mm_audio_loudness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end to end — the WAV sibling of mm_pixel_stats:
    build valid RIFF/WAVE PCM16 mono files JVM-side (chunk ids + LE
    header integers + LE sample words via unhex), ship through Arrow,
    parse with the pure-Python chunk-walking WAV parser in executors, and
    aggregate per-clip loudness (peak + RMS from an exact integer sum of
    squares). The oracle recomputes from the deterministic sample
    formula WITHOUT binary support — a hash match proves the byte-level
    build -> Arrow -> decode round-trip exact, now for a second media
    container format. Narrow map, no shuffle."""
    from esco_neo4j_spark.operators.multimodal import (
        attach_wav_payload, audio_loudness,
    )

    media = attach_wav_payload(spark.table("documents"))
    return audio_loudness(media).orderBy("doc_id")


# --- pHash: 8x8 integer-DCT perceptual hash over real decoded pixels ------
# The quantized DCT basis is computed ONCE here and feeds BOTH engines:
# the numpy matmul in operators/multimodal.py:phash64 and the literal
# lists in the generated oracle SQL below — all-integer arithmetic, so
# hash parity is by construction, not libm luck.
from esco_neo4j_spark.operators.multimodal import phash64, phash_q_matrix  # noqa: E402

_QF = [v for row in phash_q_matrix() for v in row]  # row-major u*8+x
_P2 = [1 << k for k in range(63)]
_QF_SQL = "[" + ",".join(str(v) for v in _QF) + "]"
_P2_SQL = "[" + ",".join(str(v) for v in _P2) + "]"


@query(
    "mm_phash_dct",
    sql=f"""
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      FROM documents WHERE doc_id < 512
    ),
    lm AS (
      SELECT doc_id,
        [ (299 * ((doc_id * 31 + ((((p % 8) * h) // 8) * w
                                  + ((p // 8) * w) // 8) * 3 * 7) % 256)
         + 587 * ((doc_id * 31 + (((((p % 8) * h) // 8) * w
                                  + ((p // 8) * w) // 8) * 3 + 1) * 7) % 256)
         + 114 * ((doc_id * 31 + (((((p % 8) * h) // 8) * w
                                  + ((p // 8) * w) // 8) * 3 + 2) * 7) % 256)
          ) // 1000
          for p in range(64) ] AS g
      FROM d
    ),
    cf AS (
      SELECT doc_id,
        [ list_sum([ {_QF_SQL}[(c // 8) * 8 + (p // 8) + 1]
                   * {_QF_SQL}[(c % 8) * 8 + (p % 8) + 1]
                   * g[p + 1]
                     for p in range(64) ])
          for c in range(64) ] AS coefs
      FROM lm
    ),
    med AS (
      SELECT doc_id, coefs[2:] AS ac, list_sort(coefs[2:])[32] AS m
      FROM cf
    )
    SELECT doc_id,
           CAST(list_sum([CASE WHEN ac[k] > m THEN {_P2_SQL}[k]
                               ELSE 0 END for k in range(1, 64)])
                AS BIGINT) AS phash,
           CAST(list_sum([CASE WHEN ac[k] > m THEN 1
                               ELSE 0 END for k in range(1, 64)])
                AS INT) AS n_bits
    FROM med ORDER BY doc_id
    """,
    survey_ops="multimodal-phash(ext),I1",
    tables=("documents",),
)
def mm_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual hash (pHash proper — the robust member whose
    DCT-free siblings aHash/simhash already band in this repo) computed
    over REAL decoded pixels: JVM-built binary PPM payloads, pure-Python
    decode in executors, integer luma, 8x8 nearest-sample grid, exact
    int64 DCT with the quantized basis (operators/multimodal.py:
    phash_q_matrix), AC-median sign bits. The oracle recomputes the
    same 64-bit hashes from the deterministic pixel scheme with DuckDB
    list comprehensions and the identical basis literals — the hash
    VALUES are parity-checked, not just counted. Bounded window
    (doc_id < 512) keeps the row set constant at any SF; banding for a
    corpus sweep is mm_ahash_hamming_hist's contract, unchanged."""
    media = attach_ppm_payload(
        spark.table("documents").filter(F.col("doc_id") < 512)
    ).select("doc_id", "payload")
    return phash64(media).orderBy("doc_id")


# --- CLIP-shape image-text alignment capstone ------------------------------
# Both modality encoders are the deterministic fallbacks (hash text
# embedding, pixel-fold image embedding), the text side lands in the
# image space through an integer sign projection, and the cross-modal
# cosine is exact ints into IEEE sqrt/divide — so the WHOLE pipeline
# (decode -> embed x2 -> project -> cosine -> report) is value-oracled.


def _align_signs() -> list[list[int]]:
    """Integer ±1 projection matrix (IMG_EMBED_DIM rows of
    HASH_EMBED_DIM signs) shared verbatim by the Spark plan and the
    oracle SQL — the stand-in for CLIP's learned text projection head."""
    from esco_neo4j_spark.operators.similarity import _hyperplanes
    from esco_neo4j_spark.operators.textmodel import HASH_EMBED_DIM
    from esco_neo4j_spark.operators.multimodal import IMG_EMBED_DIM

    planes = _hyperplanes(HASH_EMBED_DIM, IMG_EMBED_DIM, seed=13)
    return [[1 if x >= 0 else -1 for x in p] for p in planes]


def _image_text_align_sql() -> str:
    from esco_neo4j_spark.operators.multimodal import IMG_EMBED_DIM
    from esco_neo4j_spark.plans.udf_queries import _TOKENS_ALL
    from esco_neo4j_spark.operators.textmodel import HASH_EMBED_DIM

    signs = _align_signs()
    K = IMG_EMBED_DIM
    proj_cols = []
    for j, row in enumerate(signs):
        arms = " ".join(
            f"WHEN {i} THEN {row[i]}" for i in range(HASH_EMBED_DIM)
        )
        proj_cols.append(
            f"COALESCE(CAST(sum(val * CASE bucket {arms} END) AS BIGINT), 0)"
            f" AS p{j}"
        )
    e_cols = ", ".join(
        f"CAST(sum(CASE WHEN k = {j} THEN v ELSE 0 END) AS BIGINT) AS e{j}"
        for j in range(K)
    )
    dot = " + ".join(f"p{j} * e{j}" for j in range(K))
    tn2 = " + ".join(f"p{j} * p{j}" for j in range(K))
    in2 = " + ".join(f"e{j} * e{j}" for j in range(K))
    return f"""
    WITH imgs AS (
      SELECT doc_id, source, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT doc_id, i % {K} AS k,
             (doc_id * 31 + i * 7) % 256 - 128 AS v
      FROM imgs, LATERAL (SELECT unnest(range(0, w * h * 3)) AS i) u
    ),
    iw AS (SELECT doc_id, {e_cols} FROM px GROUP BY doc_id),
    tok AS (
      SELECT doc_id, unnest({_TOKENS_ALL}) AS t
      FROM documents WHERE doc_id % 3 = 0
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 7))::BIGINT AS h FROM tok
    ),
    contrib AS (
      SELECT doc_id, h % {HASH_EMBED_DIM} AS bucket,
             CASE WHEN (h >> 27) & 1 = 1 THEN 1 ELSE -1 END AS sgn
      FROM hashed
    ),
    buckets AS (
      SELECT doc_id, bucket, CAST(sum(sgn) AS INT) AS val
      FROM contrib GROUP BY doc_id, bucket
    ),
    proj AS (
      SELECT d.doc_id, {", ".join(proj_cols)}
      FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
      LEFT JOIN buckets b USING (doc_id)
      GROUP BY d.doc_id
    ),
    scored AS (
      SELECT source,
             CASE WHEN tn2 = 0 OR in2 = 0 THEN 0.0
                  ELSE round(CAST(dot AS DOUBLE)
                             / (sqrt(CAST(tn2 AS DOUBLE))
                                * sqrt(CAST(in2 AS DOUBLE))), 6)
             END AS s
      FROM (
        SELECT i.source, ({dot}) AS dot, ({tn2}) AS tn2, ({in2}) AS in2
        FROM imgs i JOIN proj USING (doc_id) JOIN iw USING (doc_id)
      )
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(round(CAST(sum(q6) AS BIGINT) / count(*) / 1e6, 6)
                AS DOUBLE) AS avg_align,
           CAST(min(s) AS DOUBLE) AS min_align,
           CAST(max(s) AS DOUBLE) AS max_align,
           CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_misaligned
    FROM (SELECT source, s, CAST(round(s * 1e6) AS BIGINT) AS q6
          FROM scored)
    GROUP BY source ORDER BY source
    """


@query(
    "pipeline_image_text_align",
    sql=_image_text_align_sql(),
    survey_ops="I1,multimodal-embed(ext),H1,D2,C1",
    tables=("documents",),
)
def pipeline_image_text_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-shape multimodal capstone (r6 verdict item 4): every third
    document carries an image (the genuine binary PPM payload); decode
    its pixels in executors, embed them (embed_pixels — model_fn seam
    with the deterministic integer fallback), hash-embed the caption
    text and project it into the image space with an integer sign
    matrix, score each (image, caption) pair with the exact cross-modal
    cosine, and report per-source alignment (mean via exact integer
    1e-6 quantization, min/max, anti-correlated count) — the filter
    stage a multimodal training pipeline runs before admitting pairs.

    Scale shape: both embeddings ride narrow maps on the documents
    scan; the image-embedding relation (K small ints per image) is the
    SMALLER modality side and is broadcast into the caption side —
    plan-pinned, no shuffle of the caption corpus; the report is a
    per-source partial agg. Reference anchor: src/embedding_utils.py
    :7-33 generalized to a second modality."""
    from esco_neo4j_spark.operators.multimodal import (
        IMG_EMBED_DIM,
        embed_pixels,
    )
    from esco_neo4j_spark.operators.textmodel import embed_column

    K = IMG_EMBED_DIM
    docs = spark.table("documents").filter(F.col("doc_id") % 3 == 0)
    iemb = embed_pixels(
        attach_ppm_payload(docs).select("doc_id", "payload")
    )
    t = embed_column(docs.select("doc_id", "source", "text"), "text")
    proj = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(s) for s in row]),
                lambda a, b: a.cast("long") * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"p{j}")
        for j, row in enumerate(_align_signs())
    ]
    tp = t.select("doc_id", "source", *proj)
    pairs = tp.join(F.broadcast(iemb), "doc_id")
    dot = sum(
        F.col(f"p{j}") * F.element_at("iemb", j + 1) for j in range(K)
    )
    tn2 = sum(F.col(f"p{j}") * F.col(f"p{j}") for j in range(K))
    in2 = sum(
        F.element_at("iemb", j + 1) * F.element_at("iemb", j + 1)
        for j in range(K)
    )
    score = F.when((tn2 == 0) | (in2 == 0), F.lit(0.0)).otherwise(
        F.round(
            dot.cast("double")
            / (F.sqrt(tn2.cast("double")) * F.sqrt(in2.cast("double"))),
            6,
        )
    )
    q6 = F.round(score * 1e6).cast("bigint")
    return (
        pairs.select("source", score.alias("s"), q6.alias("q6"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("q6").cast("bigint").alias("sq6"),
            F.min("s").alias("min_align"),
            F.max("s").alias("max_align"),
            F.sum(F.when(F.col("s") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_misaligned"),
        )
        .select(
            "source",
            "n_pairs",
            F.round(F.col("sq6") / F.col("n_pairs") / 1e6, 6).alias(
                "avg_align"
            ),
            "min_align",
            "max_align",
            "n_misaligned",
        )
        .orderBy("source")
    )
