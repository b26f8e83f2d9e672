"""Relational query corpus — the analysis_queries.md (AQ) shapes mapped onto
the synthetic star schema per FIXTURES.md §C. Each query names the SURVEY.md
§2 operators it exercises and the AQ lines it is isomorphic to.

Broadcast policy: region/nation (and other dim tables) are always
broadcast; fact-fact joins shuffle on their keys and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esco_neo4j_spark.plans.registry import query


# --- flagship: AQ:38-41 "skills with most ESSENTIAL_FOR edges" ------------
@query(
    "aq_top_parts_by_lines",
    sql="""
    SELECT p.p_partkey, p.p_name, CAST(count(*) AS BIGINT) AS n_lines
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY n_lines DESC, p_partkey ASC
    LIMIT 20
    """,
    survey_ops="B1,C1,D3,F1,F2",
    bench=True,
    tables=("part", "lineitem"),
)
def aq_top_parts_by_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan -> join -> groupBy count -> top-k. Isomorphic to AQ:38-41
    (Skill -ESSENTIAL_FOR-> Occupation ranking). The join is a shuffle on
    partkey; top-k plans as TakeOrderedAndProject (no full sort)."""
    part = spark.table("part")
    li = spark.table("lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.count("*").alias("n_lines"))
        .orderBy(F.desc("n_lines"), F.asc("p_partkey"))
        .limit(20)
    )


# --- AQ:29-31 nodes with most relationships incl. zero (OPTIONAL MATCH) ---
@query(
    "aq_customer_order_counts",
    sql="""
    SELECT c.c_custkey, c.c_name, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY n_orders DESC, c_custkey ASC
    LIMIT 50
    """,
    survey_ops="C2,D4,F2",
    tables=("customer", "orders"),
)
def aq_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps unmatched anchors (Cypher OPTIONAL MATCH, AQ:29-31);
    count(col) skips nulls so unmatched rows count 0."""
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("c_custkey"))
        .limit(50)
    )


# --- AQ:10-20 label/type counts -------------------------------------------
@query(
    "aq_group_counts",
    sql="""
    SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    survey_ops="D2,F3",
    tables=("orders",),
)
def aq_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by count (labels(n)/type(r) counts, AQ:10-20)."""
    return (
        spark.table("orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# --- B5 equality point lookup ---------------------------------------------
@query(
    "aq_point_lookup",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(round(c_acctbal, 2) AS DOUBLE) AS acctbal
    FROM customer WHERE c_custkey = 42
    """,
    survey_ops="B5,B9",
    tables=("customer",),
)
def aq_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality point lookup (MATCH {conceptUri: $uri}, AQ:139/147). The
    filter pushes down to the parquet scan (PushedFilters in explain)."""
    return (
        spark.table("customer")
        .filter(F.col("c_custkey") == 42)
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


# --- B8 substring predicate ------------------------------------------------
@query(
    "aq_contains_filter",
    sql="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE contains(p_name, 'widget') AND p_size > 10
    ORDER BY p_partkey
    """,
    survey_ops="B6,B8",
    tables=("part",),
)
def aq_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINS predicate + range predicate (AQ:512, B6)."""
    return (
        spark.table("part")
        .filter(F.col("p_name").contains("widget") & (F.col("p_size") > 10))
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


# --- AQ:118-121 multi-hop chain + countDistinct ---------------------------
@query(
    "aq_multihop_count_distinct",
    sql="""
    SELECT s.s_suppkey, s.s_name,
           CAST(count(DISTINCT n.n_name) AS BIGINT) AS n_nations,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY n_nations DESC, s_suppkey ASC
    LIMIT 25
    """,
    survey_ops="C1,C6,D5,F2",
    bench=True,
    tables=("supplier", "lineitem", "orders", "customer", "nation"),
)
def aq_multihop_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop chain join + COUNT(DISTINCT) — isomorphic to AQ:118-121
    (occupations' skills spanning ISCO groups). nation is broadcast; the
    fact-fact joins shuffle on their join keys."""
    s = spark.table("supplier")
    l = spark.table("lineitem")
    o = spark.table("orders")
    c = spark.table("customer")
    n = spark.table("nation")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.countDistinct("n_name").alias("n_nations"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .orderBy(F.desc("n_nations"), F.asc("s_suppkey"))
        .limit(25)
    )


# --- AQ:127-131 co-occurrence self-join ------------------------------------
@query(
    "aq_part_cooccurrence",
    sql="""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 256
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
    survey_ops="B7,C4,D3,F2",
    bench=True,
    tables=("lineitem",),
)
def aq_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join co-occurrence with theta predicate (AQ:127-131 skills
    sharing occupations; s1 <> s2 tightened to < to halve the pairs).
    Shuffles once on l_orderkey; pair-count agg follows. cap_key_fanout
    (mirrored in the oracle's QUALIFY) drops degenerate hot orders so one
    mega-key cannot go quadratic at 100x — TPC-H orders have <= 7 lines,
    so the cap never binds at test scale."""
    from esco_neo4j_spark.operators.skew import cap_key_fanout

    li = cap_key_fanout(
        spark.table("lineitem").select("l_orderkey", "l_partkey"),
        ["l_orderkey"],
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


# --- AQ:78-81 FK-join rollup through dims ----------------------------------
@query(
    "aq_region_rollup",
    sql="""
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(c.c_acctbal), 2) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    survey_ops="C1,C5,D3",
    tables=("customer", "nation", "region"),
)
def aq_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-derived FK joins up a 2-level dim hierarchy (AQ:78-81
    occupation->ISCO rollup). Both dims broadcast — zero shuffle for the
    joins; only the final agg shuffles (partial agg map-side first)."""
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


# --- AQ:254-277 profile: star of OPTIONAL MATCH + collect(DISTINCT) -------
@query(
    "aq_customer_profile",
    sql="""
    WITH ords AS (
      SELECT o_custkey,
             array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|')
               AS priorities,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           coalesce(o.priorities, '') AS priorities,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN ords o ON c.c_custkey = o.o_custkey
    ORDER BY c_custkey
    LIMIT 100
    """,
    survey_ops="C2,C7,D6,D7",
    tables=("customer", "orders"),
)
def aq_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-profile with per-branch pre-aggregation: each OPTIONAL MATCH
    branch aggregates BEFORE joining the anchor, so branches can't
    cross-multiply (SURVEY.md §7 hard-point #4; reference:
    src/semantic_search.py:115-143). collect_set is sorted + joined to a
    string for deterministic comparison."""
    c = spark.table("customer")
    o = spark.table("orders")
    ords = o.groupBy("o_custkey").agg(
        F.concat_ws(
            "|", F.array_sort(F.collect_set("o_orderpriority"))
        ).alias("priorities"),
        F.count("*").alias("n_orders"),
    )
    return (
        c.join(ords, c.c_custkey == ords.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.coalesce("priorities", F.lit("")).alias("priorities"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


# --- AQ:173-197 multi-stage aggregation (WITH ... WITH ...) ----------------
@query(
    "aq_order_count_distribution",
    sql="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM per_cust GROUP BY n_orders
    ORDER BY n_orders
    """,
    survey_ops="D8",
    tables=("orders",),
)
def aq_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage aggregation pipeline (Cypher WITH-chained aggs,
    AQ:173-197): per-key count, then distribution of counts."""
    per_cust = (
        spark.table("orders").groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_orders")
    )


# --- G1 union label-disjunction scan ---------------------------------------
@query(
    "aq_union_scan",
    sql="""
    SELECT name, kind, CAST(round(acctbal, 2) AS DOUBLE) AS acctbal FROM (
      SELECT c_name AS name, 'Customer' AS kind, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT s_name AS name, 'Supplier' AS kind, s_acctbal AS acctbal FROM supplier
    ) ORDER BY acctbal DESC, name LIMIT 50
    """,
    survey_ops="B2,G1,H2",
    tables=("customer", "supplier"),
)
def aq_union_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-disjunction scan as a union with a per-source type tag
    (MATCH (n) WHERE n:Skill OR n:Occupation; reference:
    src/semantic_search.py:86-87 + labels(n)[0] as type, H2)."""
    c = spark.table("customer").select(
        F.col("c_name").alias("name"),
        F.lit("Customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = spark.table("supplier").select(
        F.col("s_name").alias("name"),
        F.lit("Supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return (
        c.unionByName(s)
        .select("name", "kind", F.round("acctbal", 2).alias("acctbal"))
        .orderBy(F.desc("acctbal"), F.asc("name"))
        .limit(50)
    )


# --- TPC-H Q1 shape: wide aggregation --------------------------------------
@query(
    "tpch_q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
           CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(round(avg(l_discount), 4) AS DOUBLE) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    survey_ops="B6,D2,D3,F3",
    bench=True,
    tables=("lineitem",),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical wide-agg scan (TPC-H Q1). Exercises partial (map-side)
    aggregation; the scan prunes to 7 columns (check ReadSchema)."""
    li = spark.table("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- E window functions (extension) ----------------------------------------
@query(
    "ext_topk_per_group",
    sql="""
    SELECT p_brand, p_partkey, p_name,
           CAST(round(p_retailprice, 2) AS DOUBLE) AS price, CAST(rn AS INT) AS rn
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC
             ) AS rn
      FROM part
    ) WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
    survey_ops="E(ext)",
    tables=("part",),
)
def ext_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window row_number — the windowed generalization
    of the AQ global top-N queries (SURVEY.md §2.E marks this extension)."""
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        spark.table("part")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            F.round("p_retailprice", 2).alias("price"),
            F.col("rn").cast("int").alias("rn"),
        )
        .orderBy("p_brand", "rn")
    )


# --- D9 rollup (extension) --------------------------------------------------
@query(
    "ext_rollup_region_nation",
    sql="""
    SELECT coalesce(r.r_name, '(all)') AS region_name,
           coalesce(n.n_name, '(all)') AS nation_name,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY region_name, nation_name
    """,
    survey_ops="D9(ext)",
    tables=("customer", "nation", "region"),
)
def ext_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.D9 extension). Note: DuckDB's
    ROLLUP groups nulls produced by the rollup itself; both engines emit the
    same grouping sets, normalized with coalesce."""
    c = spark.table("customer")
    n = spark.table("nation")
    r = spark.table("region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "n_customers",
        )
        .orderBy("region_name", "nation_name")
    )


# --- C8 semi/anti joins (extension) ----------------------------------------
@query(
    "ext_customers_without_orders",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    survey_ops="C8(ext)",
    tables=("customer", "orders"),
)
def ext_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (WHERE NOT (...) — absent from the reference corpus,
    SURVEY §2.C8). Plans as a broadcast/shuffle anti join, no count trick."""
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "ext_nations_with_both",
    sql="""
    SELECT n_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_nationkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_nationkey
    """,
    survey_ops="G3(ext),C1",
    tables=("customer", "supplier", "nation"),
)
def ext_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (SURVEY §2.G3 extension)."""
    n = spark.table("nation")
    c = spark.table("customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_nationkey")
    s = spark.table("supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_nationkey")
    return c.intersect(s).orderBy("n_nationkey")


# --- H6-H9 scalar function battery -----------------------------------------
@query(
    "aq_scalar_functions",
    sql="""
    SELECT doc_id,
           CASE WHEN length(text) > 100
                THEN substr(text, 1, 97) || '...' ELSE text END AS display_text,
           upper(source) AS source_uc,
           replace(lang, '_', ' ') AS lang_fmt,
           CAST(length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS INT)
             AS norm_len
    FROM documents
    ORDER BY doc_id LIMIT 50
    """,
    survey_ops="H6,H7,H8,H9",
    tables=("documents",),
)
def aq_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function battery: truncate+ellipsis (reference:
    src/esco_cli.py:62-64), case/replace formatting (:80), whitespace
    normalization (src/esco_translate.py:259-261)."""
    from esco_neo4j_spark.functions.text import normalize_ws, truncate_ellipsis

    return (
        spark.table("documents")
        .select(
            "doc_id",
            truncate_ellipsis(F.col("text"), 100).alias("display_text"),
            F.upper("source").alias("source_uc"),
            F.regexp_replace("lang", "_", " ").alias("lang_fmt"),
            F.length(normalize_ws(F.col("text"))).cast("int").alias("norm_len"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


@query(
    "ext_customers_no_urgent_orders",
    sql="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY custkey
    """,
    survey_ops="G3(ext)",
    tables=("orders",),
)
def ext_customers_no_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op (SURVEY §2.G3 extension) — customers who ordered but
    never urgently. EXCEPT plans as distinct + left-anti: one shuffle on
    the key, and both branches prune to the two scanned columns."""
    o = spark.table("orders")
    return (
        o.select(F.col("o_custkey").alias("custkey"))
        .subtract(  # EXCEPT (distinct) — exceptAll would be bag semantics
            o.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("custkey")
            )
        )
        .orderBy("custkey")
    )


@query(
    "ext_orders_monthly",
    sql="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY yr, mon
    """,
    survey_ops="H10(ext),D2",
    tables=("orders",),
)
def ext_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup via date scalar functions (SURVEY §2.H10 —
    absent from the reference, whose modifiedDate is an opaque string).
    Single scan of (o_orderdate, o_totalprice) only — column pruning
    reaches the parquet reader — one shuffle keyed on (yr, mon, qtr) with
    map-side partial aggregation."""
    o = spark.table("orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("yr", "mon")
    )


@query(
    "ext_cube_status_priority",
    sql="""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(o_totalprice), 2) AS DOUBLE) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    survey_ops="D9(ext)",
    tables=("orders",),
)
def ext_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all four grouping sets in ONE pass
    (SURVEY §2.D9 extension; completes rollup from
    ext_rollup_region_nation). Spark expands the cube before the shuffle,
    so it is still a single exchange with partial aggregation."""
    o = spark.table("orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
            "avg_price",
        )
        .orderBy("status", "priority")
    )


@query(
    "ext_map_projection",
    sql="""
    SELECT c_custkey AS custkey, c_name AS name, 'Customer' AS type
    FROM customer
    ORDER BY custkey LIMIT 50
    """,
    survey_ops="B10,B9",
    tables=("customer",),
)
def ext_map_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher map projection ``c {.name, type:'Customer'}`` (SURVEY §2.B10,
    AQ:490-496): build the struct with a literal type tag, then project
    its fields back out — flattened for oracle comparability (DuckDB and
    Spark hash struct values differently)."""
    c = spark.table("customer")
    ent = c.select(
        F.struct(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.lit("Customer").alias("type"),
        ).alias("ent")
    )
    return (
        ent.select("ent.custkey", "ent.name", "ent.type")
        .orderBy("custkey")
        .limit(50)
    )


@query(
    "ext_bucketed_join",
    sql="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    survey_ops="C1,D3,layout(ext)",
    tables=(),
)
def ext_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders x lineitem revenue per priority over BUCKETED tables
    (sources/bucketed.py): both sides pre-hashed into co-located buckets
    on the order key, so the fact-fact join runs with ZERO exchanges —
    the only shuffle in the whole plan is the final 5-group aggregate.
    At 100 TB this is the difference between re-shuffling both fact
    tables per query and a bucket-local merge join; the layout cost is
    paid once at ingest. Result is identical to the plain-table join, so
    the DuckDB oracle doubles as a bucketing-correctness check (every
    row lands in the bucket its hash says; none dropped or doubled)."""
    from esco_neo4j_spark.sources.bucketed import ensure_bucketed

    names = ensure_bucketed(spark, sf_dir)
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("priority")
    )


@query(
    "ext_bloom_semijoin",
    sql="""
    SELECT l.l_linestatus AS linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_linestatus
    ORDER BY linestatus
    """,
    survey_ops="C8,sketch(ext),D3",
    tables=("orders", "lineitem"),
)
def ext_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (operators/sketch.py): build a
    bounded bit table from the SELECTIVE side (urgent orders), broadcast
    it, and prune the fact scan to keys that hit all hash positions
    BEFORE the exact shuffle join. False positives survive the prune but
    die in the join, so the result is exactly the plain join — which is
    what the oracle runs. At 100 TB the win is shuffling ~selectivity of
    the fact table instead of all of it, with a build side that stays
    KB-sized however many keys it summarizes (unlike a broadcast IN-list,
    which grows linearly and falls over past ~10M keys)."""
    from esco_neo4j_spark.operators.sketch import bloom_build, bloom_prune

    urgent = spark.table("orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bloom = bloom_build(urgent, "o_orderkey")
    li = bloom_prune(spark.table("lineitem"), "l_orderkey", bloom)
    return (
        li.join(
            urgent.select("o_orderkey"),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("linestatus")
    )


@query(
    "ext_pivot_priority_by_status",
    sql="""
    SELECT o_orderstatus AS status,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
             AS urgent,
           CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT)
             AS high,
           CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT)
             AS medium,
           CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT)
             AS notspec,
           CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT)
             AS low
    FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
    survey_ops="D2,pivot(ext)",
    tables=("orders",),
)
def ext_pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): order counts with status as rows and priority
    as columns. The pivot values are DECLARED, not discovered — an
    undeclared pivot runs an extra distinct pass over the data to find the
    column set, a silent full scan at 100 TB. Declared values keep it to
    one pass, and the aggregation is a plain partial-aggregable count.
    DuckDB oracles it as conditional aggregation (FILTER), which is what
    a pivot lowers to anyway."""
    piv = (
        spark.table("orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "notspec", "5-LOW": "low",
    }
    out = piv
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.select(
        "status",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in renames.values()],
    ).orderBy("status")


@query(
    "ext_group_percentiles",
    sql="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cd
      FROM lineitem
    )
    SELECT l_returnflag AS returnflag,
           CAST(min(l_extendedprice) FILTER (cd >= 0.5) AS DOUBLE)
             AS median_price,
           CAST(min(l_extendedprice) FILTER (cd >= 0.9) AS DOUBLE)
             AS p90_price,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked GROUP BY l_returnflag ORDER BY returnflag
    """,
    survey_ops="D8,percentile(ext)",
    tables=("lineitem",),
)
def ext_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCRETE percentiles per group (median + p90 of the extended
    price per return flag): percentile_disc picks an actual data value
    (the ANSI 'smallest value whose cumulative distribution >= p'), so
    no interpolation happens and cross-engine equality is exact — the
    continuous variant interpolates and can land a half-ulp across a
    rounding boundary. The oracle computes the same definition from first
    principles (cume_dist window + filtered min), an independent
    formulation. Exact percentiles sort within each group; at 100 TB
    switch to percentile_approx (mergeable KLL-style sketch, no per-group
    sort) once groups stop fitting a partition."""
    return (
        spark.table("lineitem")
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("median_price"),
            F.expr(
                "percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)"
            ).alias("p90_price"),
            F.count("*").alias("n"),
        )
        .orderBy("returnflag")
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


@query(
    "ext_profile_columns",
    sql="""
    """ + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_s,
           CAST(max({c}) AS VARCHAR) AS max_s
    FROM orders"""
        for c in _PROFILE_COLS
    ) + "\nORDER BY col",
    survey_ops="D1,D5,profile(ext)",
    tables=("orders",),
)
def ext_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling in ONE scan: null count, distinct count, min and
    max for each profiled column, computed as a single wide aggregate row
    and then unpivoted to (col, metric...) rows. The profile is the
    first thing a pipeline runs on a new 100 TB drop — doing it per
    column (the naive loop, which is what the oracle's UNION ALL does)
    scans the table N_cols times; the wide-aggregate form scans ONCE and
    every distinct-count runs as a partial-aggregable expression."""
    o = spark.table("orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min_s"),
            F.max(c).cast("string").alias(f"{c}__max_s"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n_null, {c}__n_distinct, {c}__min_s, {c}__max_s"
        for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "AS (col, n_null, n_distinct, min_s, max_s)"
            )
        )
        .orderBy("col")
    )


@query(
    "ext_ntile_deciles",
    sql="""
    WITH t AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS lo,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS hi
    FROM t GROUP BY decile ORDER BY decile
    """,
    survey_ops="E,D2",
    tables=("orders",),
)
def ext_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding of order value via ntile — the equal-count bucketing
    every distribution report runs. The window's ORDER BY carries an
    explicit tiebreak (orderkey) so bucket boundaries are a total order
    and both engines cut identically. Scale note: an un-partitioned
    ranking window is a single-reducer sort — fine for reports, but the
    percentile_disc/approx path is the scale form when the answer only
    needs the cut points, not a per-row bucket id."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = spark.table("orders").select(
        "o_totalprice", F.ntile(10).over(w).alias("decile")
    )
    return (
        t.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("decile")
    )


@query(
    "ext_full_outer_reconcile",
    sql="""
    WITH ev AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ),
    cust AS (
      SELECT c_custkey AS user_id, c_acctbal FROM customer
      WHERE c_custkey < 300
    )
    SELECT coalesce(e.user_id, c.user_id) AS user_id,
           CASE WHEN e.user_id IS NULL THEN 'customer_only'
                WHEN c.user_id IS NULL THEN 'events_only'
                ELSE 'both' END AS presence,
           CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events,
           CAST(round(coalesce(c.c_acctbal, 0.0), 2) AS DOUBLE) AS acctbal
    FROM ev e FULL OUTER JOIN cust c ON e.user_id = c.user_id
    ORDER BY user_id
    """,
    survey_ops="C(ext,full-outer),D2",
    tables=("events", "customer"),
)
def ext_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the audit join every migration runs:
    which keys exist only upstream, only downstream, or in both (the same
    shape sources/merge.py uses internally for MERGE INTO). Scale note: a
    full-outer join cannot broadcast either side (unmatched rows of BOTH
    must survive), so it always shuffles both inputs on the key — worth
    knowing before pointing it at two 100 TB tables; pre-aggregate first,
    as here, when the question is about keys rather than rows."""
    ev = (
        spark.table("events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    cust = (
        spark.table("customer")
        .filter(F.col("c_custkey") < 300)
        .select(F.col("c_custkey").alias("user_id"), "c_acctbal")
    )
    j = ev.alias("e").join(
        cust.alias("c"), F.col("e.user_id") == F.col("c.user_id"), "full_outer"
    )
    return (
        j.select(
            F.coalesce(F.col("e.user_id"), F.col("c.user_id")).alias("user_id"),
            F.when(F.col("e.user_id").isNull(), "customer_only")
            .when(F.col("c.user_id").isNull(), "events_only")
            .otherwise("both")
            .alias("presence"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.round(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), 2).alias("acctbal"),
        )
        .orderBy("user_id")
    )


@query(
    "ext_fuzzy_match_parts",
    sql="""
    WITH names AS (
      SELECT p_name, count(*) AS n
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
           CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY lev, name_a, name_b
    """,
    survey_ops="entity-resolution(ext),C4,B12",
    tables=("part",),
)
def ext_fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution as a blocked fuzzy join: candidate part names
    within the same blocking key (first word) whose full names are within
    Levenshtein distance 3, with per-name occurrence counts carried
    along.

    The load-bearing scale move is the DICTIONARY REDUCTION: the fuzzy
    self-join runs on DISTINCT names (vocabulary-sized, bounded), not on
    the row table — the same distinct-before-expensive-work memoization
    the model-UDF pipeline uses, applied to a join. Blocking bounds each
    comparison set; the edit-distance refine only runs inside a block.
    At 100 TB the dictionary still fits an exchange, and a skew-capped
    block (operators/skew.py) guards a degenerate hot blocking key."""
    names = spark.table("part").groupBy("p_name").agg(F.count("*").alias("n"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "blk")
        .filter((F.col("name_a") < F.col("name_b")) & (lev <= 3))
        .select(
            "name_a", "name_b",
            lev.cast("int").alias("lev"),
            "n_a", "n_b",
        )
        .orderBy("lev", "name_a", "name_b")
    )


@query(
    "aq_association_rules",
    sql="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 256
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
    supp AS (
      SELECT l_partkey, count(*) AS n FROM li GROUP BY l_partkey
    ),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(round(p.n_ab::DOUBLE / sa.n, 6) AS DOUBLE) AS confidence_a_b,
           CAST(round(p.n_ab::DOUBLE * n.n_orders / (sa.n * sb.n), 6)
             AS DOUBLE) AS lift
    FROM pair p
    JOIN supp sa ON p.part_a = sa.l_partkey
    JOIN supp sb ON p.part_b = sb.l_partkey
    CROSS JOIN n
    WHERE p.n_ab >= 2
    ORDER BY lift DESC, part_a, part_b
    LIMIT 50
    """,
    survey_ops="assoc-rules(ext),C4,D5",
    tables=("lineitem",),
)
def aq_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: pair support from the
    capped co-occurrence self-join (same skew guard as
    aq_part_cooccurrence), item support from one groupBy, then
    confidence(a->b) = n_ab/n_a and lift = n_ab*N/(n_a*n_b) — each a
    single division of exact integer counts, so 6dp rounding is
    deterministic. Item supports are a small table joined back broadcast;
    the only corpus-sized exchanges are the basket self-join and the two
    count aggregations. The market-basket classic, and the relational
    form of the reference's related-skill query (AQ:127-134) upgraded
    from counts to normalized strength."""
    from esco_neo4j_spark.operators.skew import cap_key_fanout

    li = (
        cap_key_fanout(
            spark.table("lineitem").select("l_orderkey", "l_partkey"),
            ["l_orderkey"],
            256,
        )
        .distinct()
    )
    n_orders = li.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    supp = li.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = li.alias("a")
    b = li.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b"))
    return (
        pair.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6).alias(
                "confidence_a_b"
            ),
            F.round(
                F.col("n_ab").cast("double") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(50)
    )


@query(
    "aq_supplier_revenue_share",
    sql="""
    WITH rev AS (
      SELECT s.s_nationkey, s.s_suppkey, s.s_name,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2, 3
    )
    SELECT s_nationkey, s_suppkey, s_name,
           CAST(round(cents / 100.0, 2) AS DOUBLE) AS revenue,
           CAST(round(cents::DOUBLE
                      / sum(cents) OVER (PARTITION BY s_nationkey), 6)
             AS DOUBLE) AS nation_share
    FROM rev
    ORDER BY s_nationkey, nation_share DESC, s_suppkey
    """,
    survey_ops="ratio-to-report(ext),E,D3",
    tables=("lineitem", "supplier"),
)
def aq_supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier's share of their nation's revenue —
    the share-of-parent window pattern behind every contribution report.
    Revenue aggregates as exact integer cents (partial map-side); the
    share is one division against a window sum over the supplier-level
    (already tiny) table, so the only corpus-sized exchange is the
    revenue groupBy. The same shape computes market share, traffic
    share, and budget utilization."""
    li = spark.table("lineitem")
    s = spark.table("supplier")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "s_suppkey", "s_name")
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("s_nationkey")
    return (
        rev.select(
            "s_nationkey",
            "s_suppkey",
            "s_name",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.col("cents").cast("double") / F.sum("cents").over(w), 6
            ).alias("nation_share"),
        )
        .orderBy("s_nationkey", F.desc("nation_share"), "s_suppkey")
    )


# ONE dialect-neutral ANSI string: Spark SQL executes it verbatim AND it
# is the DuckDB oracle — byte-identical text on both engines. Revenue
# terms quantize to integer hundredths-of-cents per row before the sum.
_ANSI_Q6 = """
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                         AS BIGINT)) AS BIGINT) AS revenue_microcents
    FROM lineitem
    WHERE l_shipdate >= DATE '1994-01-01'
      AND l_shipdate < DATE '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "ext_ansi_sql_front_door",
    sql=_ANSI_Q6,
    survey_ops="sql-interface(ext),B6,D1",
    tables=("lineitem",),
)
def ext_ansi_sql_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: spark.sql() runs the EXACT string the DuckDB
    oracle runs — a TPC-H Q6-shaped filter-aggregate written in
    dialect-neutral ANSI (DATE literals, BETWEEN, CAST/round), with the
    revenue term quantized to integer units per row so the sum is exact
    on any engine in any order. Demonstrates that a reference user can
    hand this engine plain SQL and get Catalyst's full pushdown +
    whole-stage codegen; every predicate here reaches the parquet
    scan."""
    return spark.sql(_ANSI_Q6)


@query(
    "ext_pearson_corr",
    sql="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(qty) AS sx, sum(cents) AS sy,
             sum(qty * qty) AS sxx, sum(cents * cents) AS syy,
             sum(qty * cents) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS DOUBLE) AS corr_qty_price
    FROM s ORDER BY l_returnflag
    """,
    survey_ops="stats-corr(ext),D8",
    tables=("lineitem",),
)
def ext_pearson_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag, computed
    from the five exact INTEGER power sums (n, sx, sy, sxx, syy, sxy) —
    the single-pass partial-aggregable formulation; only the final
    scalar expression touches floats, in the same written order on both
    engines. The built-in corr() aggregates floats in partition order
    and cannot be value-oracled; this shape can, and it is also the
    numerically honest one at 100 TB (integer sums cannot drift).
    Per-row products fit int64 (cents^2 ~ 1e14), but the SUM of cents^2
    does NOT at scale — ~2e19 at sf1 (caught by the r3 sf1 audit as an
    ANSI long-overflow) — so the square sums aggregate as
    decimal(38,0): still exact integer arithmetic, 1e38 headroom.
    DuckDB's sum(BIGINT) is already HUGEINT, so the oracle needs no
    change."""
    li = spark.table("lineitem")
    q = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    dec = "decimal(38,0)"
    s = q.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("qty").alias("sx"),
        F.sum("cents").alias("sy"),
        F.sum((F.col("qty") * F.col("qty")).cast(dec)).alias("sxx"),
        F.sum((F.col("cents") * F.col("cents")).cast(dec)).alias("syy"),
        F.sum((F.col("qty") * F.col("cents")).cast(dec)).alias("sxy"),
    )
    # the POWER SUMS are exact int64; their combination overflows int64
    # (n * syy ~ 1e21), so it runs in double — scalar IEEE ops on
    # identical inputs, deterministic on both engines
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return (
        s.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n"),
            F.round(num / den, 6).alias("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "ext_snapshot_diff_cdc",
    sql="""
    WITH curr AS (
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE c_custkey % 17 <> 0
    ),
    next_snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN upper(c_name) ELSE c_name END
               AS c_name,
             c_mktsegment
      FROM customer
      WHERE c_custkey % 13 <> 0
    )
    SELECT coalesce(c.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'INSERT'
                WHEN n.c_custkey IS NULL THEN 'DELETE'
                ELSE 'UPDATE' END AS op,
           n.c_name AS new_name
    FROM curr c FULL OUTER JOIN next_snap n ON c.c_custkey = n.c_custkey
    WHERE c.c_custkey IS NULL OR n.c_custkey IS NULL
       OR c.c_name <> n.c_name OR c.c_mktsegment <> n.c_mktsegment
    ORDER BY c_custkey
    """,
    survey_ops="cdc(ext),C8,G3",
    tables=("customer",),
)
def ext_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture by snapshot diff: full-outer join two table
    snapshots on the key and classify every divergent row INSERT /
    UPDATE / DELETE — the change feed that drives the incremental MERGE
    path (sources/merge.py) when the source system cannot emit one
    itself. Unchanged rows are filtered inside the join's output before
    anything downstream sees them; at scale the two snapshot scans are
    the cost, and partition-level pruning (only diff partitions whose
    stats changed) is the standard cut. Deterministic synthetic
    snapshots: 'current' drops key%17==0, 'next' drops key%13==0 and
    upper-cases names for key%10==0."""
    c = spark.table("customer")
    curr = c.filter(F.col("c_custkey") % 17 != 0).select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    nxt = (
        c.filter(F.col("c_custkey") % 13 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 10 == 0, F.upper("c_name")
            ).otherwise(F.col("c_name")).alias("c_name"),
            "c_mktsegment",
        )
    )
    a, b = curr.alias("a"), nxt.alias("b")
    joined = a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer")
    op = (
        F.when(F.col("a.c_custkey").isNull(), "INSERT")
        .when(F.col("b.c_custkey").isNull(), "DELETE")
        .otherwise("UPDATE")
    )
    changed = (
        F.col("a.c_custkey").isNull()
        | F.col("b.c_custkey").isNull()
        | (F.col("a.c_name") != F.col("b.c_name"))
        | (F.col("a.c_mktsegment") != F.col("b.c_mktsegment"))
    )
    return (
        joined.filter(changed)
        .select(
            F.coalesce(F.col("a.c_custkey"), F.col("b.c_custkey")).alias(
                "c_custkey"
            ),
            op.alias("op"),
            F.col("b.c_name").alias("new_name"),
        )
        .orderBy("c_custkey")
    )


@query(
    "ext_histogram_equiwidth",
    sql="""
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ),
    bounds AS (
      SELECT min(cents) AS lo, max(cents) AS hi,
             greatest((max(cents) - min(cents)) // 20 + 1, 1) AS w
      FROM c
    ),
    bucketed AS (
      SELECT least((c.cents - b.lo) // b.w, 19) AS bucket, b.lo, b.w
      FROM c CROSS JOIN bounds b
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(round((lo + bucket * w) / 100.0, 2) AS DOUBLE) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n
    FROM bucketed GROUP BY bucket, lo, w ORDER BY bucket
    """,
    survey_ops="histogram(ext),D8,D2",
    tables=("orders",),
)
def ext_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width value histogram over order totals — the
    profiling primitive behind range-partition planning and data-skew
    triage. Bounds come from one tiny min/max aggregate broadcast back;
    the bucket index is pure INTEGER arithmetic ((cents - lo) div w,
    clamped), so bucket membership cannot float-drift at any scale. Two
    scans (bounds + bucketing) — the one-pass variant trades this for
    approximate bounds; at 100 TB use column statistics for the bounds
    and keep the exact bucketing pass."""
    o = spark.table("orders")
    c = o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    bounds = c.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.greatest(
            F.floor((F.max("cents") - F.min("cents")) / 20) + 1, F.lit(1)
        ).cast("bigint").alias("w"),
    )
    bucketed = c.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("cents") - F.col("lo")) / F.col("w")), F.lit(19)
        ).alias("bucket"),
        "lo",
        "w",
    )
    return (
        bucketed.groupBy("bucket", "lo", "w")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.round((F.col("lo") + F.col("bucket") * F.col("w")) / 100.0, 2)
            .alias("bucket_lo"),
            "n",
        )
        .orderBy("bucket")
    )


@query(
    "ext_join_cardinality_probe",
    sql="""
    WITH a AS (
      SELECT o_custkey AS k, count(*) AS na FROM orders GROUP BY o_custkey
    ),
    b AS (
      SELECT c_custkey AS k, count(*) AS nb FROM customer GROUP BY c_custkey
    )
    SELECT CAST(sum(na * nb) AS BIGINT) AS join_rows,
           CAST(count(*) AS BIGINT) AS matching_keys,
           CAST(max(na * nb) AS BIGINT) AS hottest_key_rows,
           CAST(round(max(na * nb)::DOUBLE / sum(na * nb), 6) AS DOUBLE)
             AS hottest_fraction
    FROM a JOIN b USING (k)
    """,
    survey_ops="join-stats(ext),D2,C1",
    tables=("orders", "customer"),
)
def ext_join_cardinality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT join-size probe: |A join B| = sum over matching keys of
    n_a(k) * n_b(k), computed from the two per-key count tables WITHOUT
    materializing the join — the statistic a planner estimates from
    histograms, and the skew triage a data engineer runs before
    submitting a suspicious join (hottest_fraction near 1 means one key
    dominates the output; reach for the salted join). Both inputs
    partial-aggregate before the key-table join, so the probe costs two
    rollups regardless of how large the joined output would be."""
    o = spark.table("orders")
    c = spark.table("customer")
    a = o.groupBy(F.col("o_custkey").alias("k")).agg(F.count("*").alias("na"))
    b = c.groupBy(F.col("c_custkey").alias("k")).agg(F.count("*").alias("nb"))
    prod = F.col("na") * F.col("nb")
    return (
        a.join(b, "k")
        .agg(
            F.sum(prod).cast("bigint").alias("join_rows"),
            F.count("*").cast("bigint").alias("matching_keys"),
            F.max(prod).cast("bigint").alias("hottest_key_rows"),
        )
        .select(
            "join_rows",
            "matching_keys",
            "hottest_key_rows",
            F.round(
                F.col("hottest_key_rows").cast("double") / F.col("join_rows"),
                6,
            ).alias("hottest_fraction"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    sql="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) / 100.0 AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    survey_ops="C1,C6,D3,F2",
    tables=("customer", "orders", "lineitem"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) adapted to the synthetic schema —
    the canonical selective-dimension -> fact -> fact join: the BUILDING
    customer slice broadcasts into orders, the date filters push to both
    parquet scans, and only the surviving orders shuffle against
    lineitem. Revenue summed in integer cents so the top-10 cutoff is
    order-exact. o_orderpriority stands in for the reference schema's
    o_shippriority (not generated here)."""
    c = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    l = spark.table("lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        l.join(
            F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(cents) / 100.0).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    sql="""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)) / 100.0 AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    survey_ops="C1,C6,D3,F1",
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) adapted — the classic 6-way join
    with a correlated same-nation constraint between the customer and
    supplier legs. All four dimensions (customer, supplier, nation,
    region) broadcast; the single shuffle join is orders x lineitem, and
    the ASIA/date predicates prune both fact scans before it. Integer-
    cent revenue keeps the per-nation ranking value-exact."""
    r = spark.table("region").filter(F.col("r_name") == "ASIA")
    n = spark.table("nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = spark.table("supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    c = spark.table("customer")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        spark.table("lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg((F.sum(cents) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "ext_skyline_orders",
    sql="""
    WITH o AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(epoch(o_orderdate) AS BIGINT) AS d
      FROM orders
    ),
    w AS (
      SELECT *,
             max(d) OVER (PARTITION BY priority ORDER BY price_c
                          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS rmax_lower,
             max(d) OVER (PARTITION BY priority, price_c) AS max_same
      FROM o
    )
    SELECT priority, o_orderkey,
           CAST(price_c / 100.0 AS DOUBLE) AS totalprice,
           strftime(to_timestamp(d), '%Y-%m-%d') AS orderdate
    FROM w
    WHERE (rmax_lower IS NULL OR d > rmax_lower) AND d = max_same
    ORDER BY priority, price_c, o_orderkey
    """,
    survey_ops="skyline(ext),E,B6",
    tables=("orders",),
)
def ext_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) query per order priority: orders no other
    same-priority order dominates on (cheaper price, later date) — the
    classic multi-criteria shortlist operator (Borzsony/Kossmann/Stocker
    2001). Instead of the O(n^2) NOT-EXISTS formulation (which the DuckDB
    oracle can afford at sf scale), the Spark plan is two window passes
    over one (priority, price) sort: a point is on the skyline iff its
    date beats the running max date over all STRICTLY cheaper rows (RANGE
    frame excludes price ties) and it holds the max date within its exact
    price. Partitioning by priority keeps every window group-local — the
    100 TB shape; prices in integer cents, dates in epoch seconds, so
    dominance is pure integer comparison."""
    o = spark.table("orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("d"),
    )
    wl = (
        Window.partitionBy("priority")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    ws = Window.partitionBy("priority", "price_c")
    w = o.select(
        "*",
        F.max("d").over(wl).alias("rmax_lower"),
        F.max("d").over(ws).alias("max_same"),
    )
    return (
        w.filter(
            (F.col("rmax_lower").isNull() | (F.col("d") > F.col("rmax_lower")))
            & (F.col("d") == F.col("max_same"))
        )
        .select(
            "priority",
            "o_orderkey",
            (F.col("price_c") / 100.0).alias("totalprice"),
            F.from_unixtime("d", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy("priority", (F.col("totalprice")), "o_orderkey")
    )


# --- D9 completion: arbitrary GROUPING SETS --------------------------------
@query(
    "ext_grouping_sets_mixed",
    sql="""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(2 * grouping(o_orderstatus)
                + grouping(o_orderpriority) AS INT) AS gid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderpriority), ())
    ORDER BY gid, status, priority
    """,
    survey_ops="D9(ext)",
    tables=("orders",),
)
def ext_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the general form CUBE/ROLLUP are sugar
    for: detail (status, priority), a priority-only slice, and the grand
    total in ONE pass (one exchange, rows replicated per matching set
    before the partial agg). grouping() flags disambiguate real NULL
    group keys from the super-aggregate rows; sums in integer cents."""
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               CAST(2 * grouping(o_orderstatus)
                    + grouping(o_orderpriority) AS INT) AS gid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_cents
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderpriority), ())
        ORDER BY gid, status, priority
        """
    )


# --- referential-integrity audit -------------------------------------------
_FK_RELATIONS = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@query(
    "ext_fk_integrity_audit",
    sql="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS relation, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}"""
        for name, child, fk, parent, pk in _FK_RELATIONS
    )
    + "\nORDER BY relation",
    survey_ops="C8,D1,quality-audit(ext)",
    tables=("orders", "customer", "lineitem", "part", "supplier", "nation",
            "region"),
)
def ext_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the whole star schema: one row
    per FK relation with its orphan count (left join against the parent
    key, null parent = orphan). The warehouse-wide data-quality gate a
    real pipeline runs after every load — the same write-time validation
    stance as the engine's constraint checks (SURVEY §2.A6), here as a
    queryable report. Dimension joins broadcast; the two fact-fact
    relations shuffle on their join keys."""
    out = None
    for name, child, fk, parent, pk in _FK_RELATIONS:
        c = spark.table(child).select(F.col(fk).alias("k"))
        p = spark.table(parent).select(F.col(pk).alias("k"), F.lit(1).alias("_m"))
        if parent not in ("orders",):  # dims broadcast; orders is a fact
            p = F.broadcast(p)
        audit = (
            c.join(p, "k", "left")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(F.lit(name).alias("relation"), "n_rows", "n_orphans")
        )
        out = audit if out is None else out.unionByName(audit)
    return out.orderBy("relation")


_RECURSIVE_FRONT_DOOR_SQL = """
WITH RECURSIVE up(id, anc, d) AS (
  SELECT DISTINCT user_id AS id, user_id AS anc, 0 AS d
  FROM events WHERE user_id >= 1 AND user_id <= 64
  UNION ALL
  SELECT id, CAST(floor(anc / 2) AS BIGINT) AS anc, d + 1 AS d
  FROM up WHERE anc > 1
)
SELECT id, CAST(max(d) AS INT) AS chain_len
FROM up GROUP BY id ORDER BY id
"""


@query(
    "ext_recursive_sql_front_door",
    sql=_RECURSIVE_FRONT_DOOR_SQL,
    survey_ops="K1,ansi-sql(ext)",
    tables=("events",),
)
def ext_recursive_sql_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI `WITH RECURSIVE` front door: the BYTE-IDENTICAL recursive SQL
    string runs on Spark 4 (UnionLoopExec) and on the DuckDB oracle —
    ancestor-chain length in the user_id//2 tree. Companion to
    ext_ansi_sql_front_door, extending the shared-dialect guarantee to
    recursion (the engine's internal closure CTE path,
    operators/graph.py:_closure_via_recursive_cte, rides the same
    executor)."""
    return spark.sql(_RECURSIVE_FRONT_DOOR_SQL)


@query(
    "ext_unpivot_melt",
    sql="""
    WITH wide AS (
      SELECT o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS sum_cents,
             CAST(round(max(o_totalprice) * 100) AS BIGINT) AS max_cents
      FROM orders GROUP BY o_orderstatus)
    SELECT status, metric, CAST(val AS BIGINT) AS val
    FROM wide UNPIVOT (val FOR metric IN (n_orders, sum_cents, max_cents))
    ORDER BY status, metric
    """,
    survey_ops="pivot(ext),D2",
    tables=("orders",),
)
def ext_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native long-form melt (Spark `DataFrame.unpivot` == ANSI UNPIVOT in
    the oracle): the wide per-status rollup flips to (status, metric,
    val) rows — the inverse of ext_pivot_priority_by_status, closing the
    reshape pair. Unpivot is a zero-shuffle row-local expansion (Expand
    node) over the already-aggregated input."""
    o = spark.table("orders")
    wide = o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("sum_cents"),
        F.round(F.max("o_totalprice") * 100).cast("bigint").alias("max_cents"),
    )
    return (
        wide.unpivot(
            "status", ["n_orders", "sum_cents", "max_cents"], "metric", "val"
        )
        .orderBy("status", "metric")
    )


@query(
    "ext_null_safe_join",
    sql="""
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nk
      FROM customer),
    n AS (
      SELECT CASE WHEN n_regionkey = 0 THEN NULL ELSE n_nationkey END AS nk,
             n_name
      FROM nation)
    SELECT coalesce(n.n_name, '(null-key)') AS nation,
           CAST(count(*) AS BIGINT) AS n_matches
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    GROUP BY coalesce(n.n_name, '(null-key)')
    ORDER BY nation
    """,
    survey_ops="C1,B4,null-semantics(ext)",
    tables=("customer", "nation"),
)
def ext_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equi-join semantics: Spark's `<=>` == ANSI IS NOT
    DISTINCT FROM — null keys MATCH each other instead of vanishing (the
    three-valued-logic trap in CDC/reconciliation joins where 'unknown'
    must pair with 'unknown'). Both sides derive a nullable key; the
    null-bucket pairing shows up as the '(null-key)' group. Null-safe
    equality still hash-partitions (null is one key), so the join stays
    an ordinary shuffled/broadcast hash join — no plan penalty."""
    c = spark.table("customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    n = F.broadcast(
        spark.table("nation").select(
            F.when(F.col("n_regionkey") == 0, F.lit(None))
            .otherwise(F.col("n_nationkey"))
            .alias("nk"),
            "n_name",
        )
    )
    return (
        c.join(n, c["nk"].eqNullSafe(n["nk"]))
        .groupBy(F.coalesce("n_name", F.lit("(null-key)")).alias("nation"))
        .agg(F.count("*").cast("bigint").alias("n_matches"))
        .orderBy("nation")
    )


@query(
    "ext_incremental_join_maintenance",
    # the oracle computes the DIRECT join rollup over the full tables —
    # the query assembles it from the four delta-algebra terms, so the
    # hash match proves d(A join B) = dA*B + A*dB + dA*dB is lossless
    sql="""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS sum_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name ORDER BY nation
    """,
    survey_ops="C1,D3,incremental-view(ext)",
    tables=("orders", "customer", "nation"),
)
def ext_incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN maintenance — the delta algebra behind
    materialized-view upkeep: with A = A_base + dA (orders split by
    order date) and B = B_base + dB (customers split by key range),
    A x B = Ab x Bb  +  Ab x dB  +  dA x Bb  +  dA x dB.
    A real deployment stores Ab x Bb and computes only the three delta
    terms per refresh (each bounded by a delta's size). The query builds
    the rollup from the FOUR terms (union, then aggregate); the oracle
    aggregates the direct join, so the driver's hash match proves the
    decomposition lossless. Companion to events_incremental_agg_merge
    (aggregates) — together they cover the two halves of incremental
    view maintenance."""
    o = spark.table("orders")
    c = spark.table("customer")
    n = F.broadcast(spark.table("nation"))
    cutoff = F.lit("1995-01-01").cast("date")
    ob, od = (
        o.filter(F.col("o_orderdate") < cutoff),
        o.filter(F.col("o_orderdate") >= cutoff),
    )
    ckey = F.col("c_custkey") % 4 == 0
    cb, cd = c.filter(~ckey), c.filter(ckey)

    def term(orders: DataFrame, custs: DataFrame) -> DataFrame:
        return orders.join(
            custs, orders["o_custkey"] == custs["c_custkey"]
        ).select("o_totalprice", "c_nationkey")

    full = (
        term(ob, cb)
        .unionByName(term(ob, cd))
        .unionByName(term(od, cb))
        .unionByName(term(od, cd))
    )
    return (
        full.join(n, full["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice") * 100)
            .cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("nation")
    )


@query(
    "ext_decimal_exact_sums",
    sql="""
    SELECT o_orderstatus AS status,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12, 2))) AS DECIMAL(18, 2))
             AS total,
           CAST(avg(CAST(o_totalprice AS DECIMAL(12, 2))) AS DECIMAL(18, 6))
             AS avg_price
    FROM orders GROUP BY o_orderstatus ORDER BY status
    """,
    survey_ops="types-decimal(ext),D2",
    tables=("orders",),
)
def ext_decimal_exact_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic (the type family the reference never uses
    — SURVEY §1.2 — but any money-handling deployment does): prices cast
    to DECIMAL(12,2), summed and averaged in decimal space with explicit
    result scales, so both engines produce digit-identical values with
    no float rounding anywhere. Complements the integer-cents discipline
    by exercising Spark's native decimal aggregation (Sum widens
    precision, Average carries scale+4) under the same hash gate."""
    o = spark.table("orders")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.sum(dec).cast("decimal(18,2)").alias("total"),
            F.avg(dec).cast("decimal(18,6)").alias("avg_price"),
        )
        .orderBy("status")
    )


@query(
    "ext_table_checksum",
    sql="""
    SELECT 'orders' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(('0x' || substr(md5(
             o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' ||
             o_orderstatus || '|' ||
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
             strftime(o_orderdate, '%Y-%m-%d')), 1, 7))::BIGINT)
             AS BIGINT) AS checksum
    FROM orders
    UNION ALL
    SELECT 'nation' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(('0x' || substr(md5(
             n_nationkey::VARCHAR || '|' || n_name || '|' ||
             n_regionkey::VARCHAR), 1, 7))::BIGINT) AS BIGINT) AS checksum
    FROM nation
    ORDER BY tbl
    """,
    survey_ops="A6,integrity(ext)",
    tables=("orders", "nation"),
)
def ext_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum: SUM of a per-row md5-derived
    28-bit digest over canonicalized column renderings (decimals pinned
    to 2dp strings, dates ISO) — the replication/migration verification
    primitive: two copies of a table agree iff (n_rows, checksum) agree,
    computable with one partial-aggregable pass on each side and no
    sort. Extends the engine's write-time constraint checks (A6) to
    cross-system content equality. The 28-bit digest keeps the sum
    inside bigint for ~10^12 rows."""
    def digest(*cols):
        s = F.concat_ws("|", *cols)
        return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint")

    o = spark.table("orders")
    ochk = o.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            digest(
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            )
        ).cast("bigint").alias("checksum"),
    ).select(F.lit("orders").alias("tbl"), "n_rows", "checksum")
    n = spark.table("nation")
    nchk = n.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            digest(
                F.col("n_nationkey").cast("string"),
                F.col("n_name"),
                F.col("n_regionkey").cast("string"),
            )
        ).cast("bigint").alias("checksum"),
    ).select(F.lit("nation").alias("tbl"), "n_rows", "checksum")
    return ochk.unionByName(nchk).orderBy("tbl")


_LATERAL_TOP1_SQL = """
SELECT n.n_name AS nation, t.c_name AS top_customer,
       CAST(round(t.c_acctbal * 100) AS BIGINT) AS bal_cents
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 1
) t
ORDER BY nation
"""


@query(
    "ext_lateral_top1_per_nation",
    sql=_LATERAL_TOP1_SQL,
    survey_ops="C7,E,ansi-sql(ext)",
    tables=("nation", "customer"),
)
def ext_lateral_top1_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery front door — the BYTE-IDENTICAL SQL
    runs on both engines (third front-door after the plain and recursive
    ones): each nation's top customer by balance via a per-row dependent
    subquery. Catalyst decorrelates this into the rank-window/top-k-join
    plan rather than executing per row — the declarative form and the
    efficient plan are the same statement."""
    return spark.sql(_LATERAL_TOP1_SQL)


@query(
    "ext_except_all_bag_semantics",
    sql="""
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT c_nationkey FROM customer
      EXCEPT ALL
      SELECT c_nationkey FROM customer WHERE c_acctbal >= 0
    )
    GROUP BY c_nationkey ORDER BY nationkey
    """,
    survey_ops="G3",
    tables=("customer",),
)
def ext_except_all_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics (each occurrence subtracts once), the
    multiplicity-preserving half of G3 next to the set-semantics
    intersect/except queries: customers minus the non-negative-balance
    ones leaves exactly the negative-balance multiset, counted per
    nation. Spark plans exceptAll as a counted anti-form (sum of tagged
    multiplicities), one exchange."""
    c = spark.table("customer").select("c_nationkey")
    pos = (
        spark.table("customer")
        .filter(F.col("c_acctbal") >= 0)
        .select("c_nationkey")
    )
    return (
        c.exceptAll(pos)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("nationkey")
    )


@query(
    "ext_relational_division",
    sql="""
    WITH pr AS (SELECT count(DISTINCT o_orderpriority) AS n FROM orders)
    SELECT o.o_custkey AS custkey,
           CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    GROUP BY o.o_custkey
    HAVING count(DISTINCT o.o_orderpriority) = (SELECT n FROM pr)
    ORDER BY custkey
    """,
    survey_ops="D5,C8,division(ext)",
    tables=("orders",),
)
def ext_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION (the FOR-ALL quantifier): customers whose
    orders span EVERY order priority that exists — textbook x/y via
    count(DISTINCT)==|divisor| instead of the double-NOT-EXISTS form
    (which would be two anti-join passes; the count form is one grouped
    aggregation against a 1-row broadcast divisor size)."""
    o = spark.table("orders")
    n_pri = o.agg(F.count_distinct("o_orderpriority").alias("n"))
    g = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count_distinct("o_orderpriority").cast("bigint").alias("n_priorities"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    return (
        g.join(F.broadcast(n_pri), g["n_priorities"] == n_pri["n"])
        .select("custkey", "n_priorities", "n_orders")
        .orderBy("custkey")
    )


@query(
    "ext_exact_quantiles_twopass",
    sql="""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    )
    SELECT pct,
           CAST(value_c AS BIGINT) AS value_c,
           CAST(value_c / 100.0 AS DOUBLE) AS value
    FROM (
      SELECT 'p50' AS pct,
             percentile_disc(0.50) WITHIN GROUP (ORDER BY c) AS value_c
      FROM c
      UNION ALL
      SELECT 'p90', percentile_disc(0.90) WITHIN GROUP (ORDER BY c) FROM c
      UNION ALL
      SELECT 'p99', percentile_disc(0.99) WITHIN GROUP (ORDER BY c) FROM c
    ) ORDER BY pct
    """,
    survey_ops="D(ext),F(ext),E",
    tables=("lineitem",),
)
def ext_exact_quantiles_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global quantiles (p50/p90/p99 of l_extendedprice) WITHOUT a
    global sort — the two-pass histogram-refine pattern that replaces
    percentile_approx when the answer must be exact at 100 TB: pass 1
    builds a 1024-bin equi-width histogram in integer cents (map-side
    combinable; the driver holds only the 1024-row histogram + min/max),
    the driver locates each target rank's bin and its in-bin rank offset,
    and pass 2 scans ONLY the rows of the <= 3 needed bins (a pushable
    range predicate — with a binned/sorted layout this is file pruning),
    sorts those few rows per bin with a window, and picks the exact
    element. Rank semantics: value at rank ceil(p*n) on the ascending
    sort — exactly percentile_disc, so the DuckDB oracle is an
    INDEPENDENT check of the algorithm (a full-sort quantile vs the
    histogram-refine path), not a replay. Ties are safe by construction:
    equal values share a bin, and the picked value at a rank is unique
    even when row_number breaks ties arbitrarily."""
    import math

    B = 1024
    c = spark.table("lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    lo, hi, n = c.agg(
        F.min("c"), F.max("c"), F.count("*")
    ).collect()[0]
    span = max(int(hi) - int(lo) + 1, 1)
    binc = F.floor((F.col("c") - F.lit(int(lo))) * B / F.lit(span)).cast("int")
    hist = {
        r["bin"]: r["cnt"]
        for r in c.select(binc.alias("bin"))
        .groupBy("bin").agg(F.count("*").alias("cnt")).collect()
    }
    targets = []  # (bin, in-bin rank, label)
    for label, p in (("p50", 0.50), ("p90", 0.90), ("p99", 0.99)):
        rank = max(1, math.ceil(p * int(n)))
        cum = 0
        for b in sorted(hist):
            if cum + hist[b] >= rank:
                targets.append((b, rank - cum, label))
                break
            cum += hist[b]
    need_bins = sorted({t[0] for t in targets})
    tdf = F.broadcast(
        spark.createDataFrame(targets, "bin int, rn long, pct string")
    )
    w = Window.partitionBy("bin").orderBy("c")
    picked = (
        c.withColumn("bin", binc)
        .filter(F.col("bin").isin(need_bins))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .join(tdf, ["bin", "rn"])
    )
    return picked.select(
        "pct",
        F.col("c").alias("value_c"),
        (F.col("c") / 100.0).alias("value"),
    ).orderBy("pct")
