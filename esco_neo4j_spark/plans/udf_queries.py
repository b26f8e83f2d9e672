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
