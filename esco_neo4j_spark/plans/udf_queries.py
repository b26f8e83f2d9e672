"""UDF-pipeline query corpus (SURVEY.md §2 category I).

These run REAL pandas UDFs (Arrow-batched Python) inside the query so the
driver correctness gate exercises the UDF machinery itself; the fallback
implementations are integer/string-deterministic so the DuckDB oracle can
reproduce them exactly (see operators/textmodel.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esco_neo4j_spark.operators.textmodel import (
    HASH_EMBED_DIM,
    embed_column,
    translate_column,
)
from esco_neo4j_spark.plans.registry import query

_TOKENS_ALL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'), "
    "x -> x <> '')"
)


@query(
    "udf_hash_embedding",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_ALL}) AS t FROM documents
    ),
    hashed AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 7))::BIGINT AS h
      FROM tok
    ),
    contrib AS (
      SELECT doc_id, h % {HASH_EMBED_DIM} AS bucket,
             CASE WHEN (h >> 27) & 1 = 1 THEN 1 ELSE -1 END AS sgn
      FROM hashed
    ),
    buckets AS (
      SELECT doc_id, bucket, CAST(sum(sgn) AS INT) AS val
      FROM contrib GROUP BY doc_id, bucket
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN val > 0 THEN val ELSE -val END) AS BIGINT) AS l1_norm,
           CAST(count(*) AS BIGINT) AS n_active
    FROM buckets WHERE val <> 0
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    survey_ops="I1,I2,I3",
    tables=("documents",),
)
def udf_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding pipeline through a REAL pandas_udf (Arrow batches,
    per-executor init — I1-I3). The fallback hash-embedding is integer
    arithmetic, so the oracle reproduces the vector's L1 norm and active
    bucket count exactly."""
    d = embed_column(spark.table("documents"), "text")
    v = F.filter(F.col("embedding"), lambda x: x != 0)
    return (
        d.select(
            "doc_id",
            F.aggregate(
                v, F.lit(0).cast("bigint"), lambda acc, x: acc + F.abs(x)
            ).alias("l1_norm"),
            F.size(v).cast("bigint").alias("n_active"),
        )
        .orderBy("doc_id")
    )


@query(
    "udf_translate_memoized",
    sql="""
    SELECT doc_id, lang,
           CASE WHEN text IS NULL OR text = '' THEN text
                ELSE 'he:' || array_to_string(list_reverse(string_split(text, ' ')), ' ')
           END AS text_he
    FROM documents
    ORDER BY doc_id
    LIMIT 100
    """,
    survey_ops="I4,I5,I7,I8",
    tables=("documents",),
)
def udf_translate_memoized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Translation pipeline (I4) via the memoization pattern (I5):
    distinct texts -> pandas_udf -> join back (I7 write-back as key join).
    The deterministic mock translation is string-exact in SQL."""
    d = translate_column(spark.table("documents"), "text", out_col="text_he")
    return d.select("doc_id", "lang", "text_he").orderBy("doc_id").limit(100)


@query(
    "udf_zscore_per_user",
    sql="""
    WITH stats AS (
      SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd,
             count(*) AS n
      FROM events GROUP BY user_id
    )
    SELECT e.event_id,
           e.user_id,
           CAST(round((e.value - s.mu) / s.sd, 6) AS DOUBLE) AS zscore
    FROM events e JOIN stats s USING (user_id)
    WHERE s.n >= 2 AND s.sd > 0
    ORDER BY e.event_id
    """,
    survey_ops="I9,D8",
    tables=("events",),
)
def udf_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-user z-score of the
    event value — the canonical 'normalize within group' shape that SQL
    window functions also express, done here through the Arrow grouped-map
    path ON PURPOSE so the driver gate exercises it end-to-end against a
    pure-SQL oracle. Each group arrives as one pandas DataFrame; pandas
    .mean()/.std(ddof=1) match avg/stddev_samp bit-for-bit at these
    magnitudes, and 6dp rounding absorbs the last ulp.

    Scale note: applyInPandas shuffles by the grouping key and each group
    must fit one executor's memory — fine for per-user groups (bounded
    fan-in), wrong for whole-table groups; the window-function form is the
    no-Python alternative when the computation is SQL-expressible."""
    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=0.0)
        sd = pdf["value"].std(ddof=1)
        if not sd > 0:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=0.0)
        mu = pdf["value"].mean()
        out = pdf[["event_id", "user_id"]].copy()
        out["zscore"] = ((pdf["value"] - mu) / sd).round(6)
        return out

    return (
        spark.table("events")
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id bigint, user_id bigint, zscore double")
        .orderBy("event_id")
    )


def _embed_cluster_consts():
    """Deterministic integer projection + centroids for the embed->cluster
    capstone: the projection matrix is the SIGN pattern of the hyperplane
    generator (never exactly zero), so every product, projection, and
    squared distance is INTEGER arithmetic — bit-exact on both engines
    under any summation order, unlike a float fold."""
    from esco_neo4j_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(HASH_EMBED_DIM, 4, seed=11)
    signs = [[1 if x >= 0 else -1 for x in p] for p in planes]
    centroids = [[8, 8, -8, 8], [-8, 8, 8, -8], [8, -8, 8, 8], [-8, -8, -8, -8]]
    return signs, centroids


def _embed_cluster_sql() -> str:
    signs, cents = _embed_cluster_consts()
    proj_cols = []
    for j, col in enumerate(signs):
        arms = " ".join(
            f"WHEN {i} THEN {col[i]}" for i in range(HASH_EMBED_DIM)
        )
        proj_cols.append(f"sum(val * CASE bucket {arms} END) AS p{j}")
    dist_cols = [
        "(" + " + ".join(f"(p{j} - {c[j]}) * (p{j} - {c[j]})" for j in range(4))
        + f") AS d{k}"
        for k, c in enumerate(cents)
    ]
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_ALL}) AS t FROM documents
    ),
    contrib AS (
      SELECT doc_id,
             ('0x' || substr(md5(t), 1, 7))::BIGINT % {HASH_EMBED_DIM} AS bucket,
             CASE WHEN (('0x' || substr(md5(t), 1, 7))::BIGINT >> 27) & 1 = 1
                  THEN 1 ELSE -1 END AS sgn
      FROM tok
    ),
    buckets AS (
      SELECT doc_id, bucket, sum(sgn) AS val FROM contrib GROUP BY 1, 2
    ),
    proj AS (
      SELECT doc_id, {", ".join(proj_cols)} FROM buckets GROUP BY doc_id
    ),
    dist AS (
      SELECT doc_id, {", ".join(dist_cols)} FROM proj
    ),
    assign AS (
      SELECT doc_id,
             CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
                  WHEN d1 <= d2 AND d1 <= d3 THEN 1
                  WHEN d2 <= d3 THEN 2 ELSE 3 END AS cluster,
             CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN d0
                  WHEN d1 <= d2 AND d1 <= d3 THEN d1
                  WHEN d2 <= d3 THEN d2 ELSE d3 END AS dist
      FROM dist
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(round(avg(dist), 4) AS DOUBLE) AS avg_dist,
           CAST(min(dist) AS BIGINT) AS min_dist,
           CAST(max(dist) AS BIGINT) AS max_dist
    FROM assign GROUP BY cluster ORDER BY cluster
    """


@query(
    "pipeline_embed_cluster",
    sql=_embed_cluster_sql(),
    survey_ops="I1,I9,vector-projection(ext),D2",
    tables=("documents",),
)
def pipeline_embed_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed capstone #2: REAL pandas-UDF hash embedding -> integer
    sign-matrix projection to 4 dims -> nearest-centroid assignment ->
    per-cluster rollup, one declarative plan end-to-end through the Arrow
    boundary. Everything after the UDF is integer column arithmetic, so
    the DuckDB oracle replays the whole pipeline exactly.

    Scale shape: the UDF is Arrow-batched and narrow; projection and
    assignment are per-row expressions (centroids live in the plan as
    literals, broadcast-free); the only shuffle is the final 4-group
    rollup with map-side partial aggregation."""
    signs, cents = _embed_cluster_consts()
    d = embed_column(spark.table("documents"), "text")
    proj = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(s) for s in col]),
                lambda a, b: a.cast("long") * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"p{j}")
        for j, col in enumerate(signs)
    ]
    p = d.select("doc_id", *proj)
    dists = [
        sum(
            (F.col(f"p{j}") - F.lit(c[j])) * (F.col(f"p{j}") - F.lit(c[j]))
            for j in range(4)
        ).alias(f"d{k}")
        for k, c in enumerate(cents)
    ]
    dd = p.select("doc_id", *dists)
    d0, d1, d2, d3 = (F.col(f"d{k}") for k in range(4))
    cluster = (
        F.when((d0 <= d1) & (d0 <= d2) & (d0 <= d3), 0)
        .when((d1 <= d2) & (d1 <= d3), 1)
        .when(d2 <= d3, 2)
        .otherwise(3)
    )
    dist = (
        F.when((d0 <= d1) & (d0 <= d2) & (d0 <= d3), d0)
        .when((d1 <= d2) & (d1 <= d3), d1)
        .when(d2 <= d3, d2)
        .otherwise(d3)
    )
    return (
        dd.select(cluster.cast("int").alias("cluster"), dist.alias("dist"))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
            F.min("dist").cast("bigint").alias("min_dist"),
            F.max("dist").cast("bigint").alias("max_dist"),
        )
        .orderBy("cluster")
    )


def _compression_oracle_sql(sf_dir: str) -> str:
    """Oracle BUILDER for udf_compression_ratio (closes the last
    rows-only gap, r5 VERDICT item 3): DuckDB has no zlib, so the
    builder computes the exact deflate byte counts with plain-Python
    zlib at resolve time — the same `zlib.compress(utf8, 6)` call the
    pandas UDF makes, CPython's zlib being the one implementation on
    both sides — and embeds them as a VALUES literal keyed by doc_id.
    The ratio arithmetic then replays in SQL, so the estimate itself is
    value-exact like every other query. Rebuilt per sf_dir (the literal
    table tracks whichever corpus the Spark plan reads)."""
    import os
    import zlib

    import duckdb

    path = os.path.join(sf_dir, "documents.parquet")
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{path}') ORDER BY doc_id"
    ).fetchall()
    values = ",".join(
        f"({doc_id},{len(zlib.compress((t or '').encode('utf-8'), 6))})"
        for doc_id, t in rows
    )
    return f"""
    WITH comp(doc_id, comp_len) AS (VALUES {values})
    SELECT d.doc_id,
           CAST(length(d.text) AS INT) AS raw_len,
           CAST(c.comp_len AS INT) AS comp_len,
           CAST(round(c.comp_len / greatest(length(d.text), 1), 6)
                AS DOUBLE) AS ratio
    FROM documents d JOIN comp c USING (doc_id)
    ORDER BY d.doc_id
    """


@query(
    "udf_compression_ratio",
    sql=_compression_oracle_sql,  # builder: plain-Python zlib VALUES table
    survey_ops="text-quality,I1,I2",
    tables=("documents",),
)
def udf_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality scores per document (deflate bytes per
    raw byte) through the Arrow-batched pandas UDF — the entropy-based
    curation signal token heuristics cannot see. Value-oracled since r6:
    the oracle builder recomputes the exact byte counts with plain-Python
    zlib per sf_dir and replays the ratio arithmetic in SQL
    (_compression_oracle_sql); tests/test_textmodel.py keeps the
    independent golden. Narrow map, no shuffle: at 100 TB this rides the
    first corpus scan like every other per-doc scorer."""
    from esco_neo4j_spark.operators.textmodel import make_compression_udf

    d = spark.table("documents")
    comp = make_compression_udf()(F.col("text"))
    return (
        d.select(
            "doc_id",
            F.length("text").cast("int").alias("raw_len"),
            comp.alias("comp_len"),
        )
        .withColumn(
            "ratio",
            F.round(
                F.col("comp_len") / F.greatest(F.col("raw_len"), F.lit(1)), 6
            ),
        )
        .orderBy("doc_id")
    )


# --- Python UDTF (SURVEY §2.I9 — the table-function face of the UDF API) ---
@query(
    "udf_chunk_udtf",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_id,
             array_to_string(t[i * 16 + 1:i * 16 + 16], ' ') AS chunk
      FROM toks, unnest(range((len(t) + 15) // 16)) AS u(i)
    )
    SELECT doc_id, chunk_id,
           CAST(len(list_filter(regexp_split_to_array(chunk, ' '),
                                x -> x <> '')) AS INT) AS n_toks,
           md5(chunk) AS chunk_md5
    FROM chunks ORDER BY doc_id, chunk_id
    """,
    survey_ops="I9,text-chunking(ext)",
    tables=("documents",),
)
def udf_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 `@udtf`) emitting fixed 16-token chunks per
    document — the TABLE-function face of the UDF surface (SURVEY §2.I9;
    the reference has none, extension). This is the API demo: one input
    row fans out to N output rows from plain Python, registered and
    invoked via LATERAL in SQL. Row-at-a-time Python is the SLOW path by
    design — the production chunker is the pure-column
    text_chunk_windows; the oracle replays the identical tokenization and
    chunk boundaries, and md5(chunk) makes the payload comparison cheap."""
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: int, n_toks: int, chunk_md5: string")
    class ChunkDoc:
        def eval(self, text: str):
            toks = [t for t in re.split(r"[^a-z0-9']+", (text or "").lower()) if t]
            for i in range(0, (len(toks) + 15) // 16):
                chunk = " ".join(toks[i * 16:i * 16 + 16])
                yield (
                    i,
                    len(chunk.split()),
                    hashlib.md5(chunk.encode()).hexdigest(),
                )

    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_toks, c.chunk_md5
        FROM documents d, LATERAL chunk_doc(d.text) c
        ORDER BY d.doc_id, c.chunk_id
        """
    )


# --- pandas GROUPED_AGG UDAF (the third face of I9, next to the UDTF and
# the grouped-map applyInPandas) ---------------------------------------------
@query(
    "udf_weighted_mean_udaf",
    sql="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             (CAST(user_id AS BIGINT) % 5) + 1 AS w
      FROM events)
    SELECT event_type,
           CAST(round(sum(cents * w) / (100.0 * sum(w)), 6) AS DOUBLE)
             AS wmean,
           CAST(sum(w) AS BIGINT) AS total_w
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    survey_ops="I9,D3",
    tables=("events",),
)
def udf_weighted_mean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean as a pandas GROUPED_AGG UDAF — the user-defined
    AGGREGATE face of the UDF surface (I9; udf_chunk_udtf is the table
    function, udf_zscore_per_user the grouped map). Arrow ships each
    group's columns as pandas Series; the UDAF sums INTEGER cents x
    weights in numpy int64, so the result is independent of row order
    within the group (a float accumulation here would be
    partitioning-dependent and fail the hash gate). The weight is a
    deterministic user bucket."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies type hints, which defeats signature-based
    # eval-type inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmean(cents, w):
        from esco_neo4j_spark.functions.numeric import round6

        num = int((cents.astype("int64") * w.astype("int64")).sum())
        den = int(w.astype("int64").sum())
        # half-up round6 to match the oracle's SQL round(...,6)
        return round6(num / (100.0 * den))

    # Spark disallows mixing a GROUPED_AGG pandas UDF with JVM aggregates
    # in one agg() — total_w rides a second pandas UDAF
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def wsum(w):
        return int(w.astype("int64").sum())

    ev = spark.table("events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        ((F.col("user_id").cast("bigint") % 5) + 1).alias("w"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            wmean(F.col("cents"), F.col("w")).alias("wmean"),
            wsum(F.col("w")).alias("total_w"),
        )
        .orderBy("event_type")
    )
