"""Adapted TPC-H corpus over the synthetic star schema.

The reference publishes no benchmark suite (SURVEY.md §6), so the classic
TPC-H plan shapes are the shared vocabulary for "would this engine's plans
survive 100 TB": every query here is one canonical shape — EXISTS
semi-join (Q4), two-sided dimension fan (Q7/Q8), profit rollup (Q9),
returned-item top-k (Q10), conditional-ratio aggregate (Q14), distinct-
count rollup with exclusion (Q16), correlated-average broadcast (Q17),
HAVING semi-join (Q18), disjunctive pushdown (Q19), anti-join + scalar
subquery (Q22), correlated argmax with tie retention (Q2), pure
pushdown scan-agg (Q6), conditional-count pivot over a join residual
(Q12), tie-keeping scalar-max view (Q15), nested-aggregate dominance
semi-join (Q20), and the EXISTS + NOT-EXISTS-on-the-same-fact shape
(Q21). With Q1/Q3/Q5 in relational_queries.py and Q13's shape as
aq_order_count_distribution, every TPC-H query shape is represented. Columns the generator does not produce (l_commitdate,
ps_supplycost, p_container, c_phone) are substituted with documented
stand-ins; the *shape* — and therefore the physical plan a 1000-executor
cluster would run — is the TPC-H one.

Determinism: every money aggregate is summed in integer cents (bigint),
every ratio is one final double division rounded to 6dp, every LIMIT sits
under a total order — so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esco_neo4j_spark.plans.registry import query

# revenue in integer cents: quantities/prices are 2dp doubles, so
# round(x*100) is exact and bigint sums are order-independent.
# (A function, not a module-level expression: building Columns requires an
# active SparkContext, which doesn't exist at import time.)
def _cents():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")


_CENTS_SQL = (
    "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)"
)


@query(
    "tpch_q4_priority_lateness",
    sql=f"""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    survey_ops="C8,D2,B6",
    tables=("orders", "lineitem"),
)
def tpch_q4_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking) — the canonical EXISTS
    decorrelation: orders in one quarter having at least one lineitem
    shipped >30 days after the order date (the generator has no
    l_commitdate; ship-lateness vs o_orderdate is the stand-in). Spark
    plans the correlated EXISTS as a LEFT SEMI join on l_orderkey with
    the date comparison as join residual, so each order is counted once
    no matter how many late lines it has — no distinct pass needed. The
    quarter filter prunes the orders scan before the shuffle."""
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    l = spark.table("lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > F.date_add(o.o_orderdate, 30)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_volume_shipping",
    sql=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum({_CENTS_SQL}) / 100.0 AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    survey_ops="C1,C6,D3,B7",
    tables=("lineitem", "orders", "customer", "supplier", "nation"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) — trade volume between two nations in
    both directions, by ship year. The nation pair predicate is applied
    AFTER both dimension legs resolve, so it is a residual on the joined
    row, not a pushable scan filter — but both legs (supplier->nation,
    customer->nation) are dimension-sized and broadcast, leaving the
    orders x lineitem shuffle as the only exchange; the 2-year ship-date
    window prunes the lineitem scan."""
    n = spark.table("nation")
    s = spark.table("supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    c = spark.table("customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg((F.sum(_cents()) / 100.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    sql=f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             sum(CASE WHEN sn.n_name = 'NATION_5' THEN {_CENTS_SQL}
                      ELSE 0 END) AS target_c,
             sum({_CENTS_SQL}) AS total_c
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY o_year)
    SELECT o_year,
           CAST(round(target_c * 1.0 / total_c, 6) AS DOUBLE) AS mkt_share
    FROM vol ORDER BY o_year
    """,
    survey_ops="C1,C6,D3,H10",
    tables=("lineitem", "orders", "customer", "supplier", "nation", "region"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share) — NATION_5 suppliers' share of
    revenue sold into EUROPE customers, per order year. The share is a
    conditional sum over the SAME joined rows (one pass, no second join),
    kept in integer cents so the final division is the only float op.
    All dimension legs broadcast; the region filter prunes the customer
    leg before it broadcasts."""
    n = spark.table("nation")
    r = spark.table("region").filter(F.col("r_name") == "EUROPE")
    cn = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c = spark.table("customer").join(
        F.broadcast(cn.select(F.col("n_nationkey").alias("c_nk"))),
        F.col("c_nationkey") == F.col("c_nk"),
    )
    s = spark.table("supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    target = F.when(F.col("supp_nation") == "NATION_5", _cents()).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        spark.table("lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(target).alias("target_c"),
            F.sum(_cents()).alias("total_c"),
        )
        .select(
            "o_year",
            F.round(F.col("target_c") * 1.0 / F.col("total_c"), 6).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    sql=f"""
    SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum({_CENTS_SQL}
                    - CAST(round(p.p_retailprice * 100) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT) / 10) / 100.0
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE 'red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    survey_ops="C1,C6,D3,B8",
    tables=("lineitem", "part", "supplier", "nation", "orders"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit) — profit on red parts by supplier
    nation and order year. ps_supplycost does not exist in the generator,
    so unit cost is modeled as p_retailprice/10 (any fixed fraction keeps
    the plan shape). Cost stays in integer cents (retail cents x integral
    quantity / 10 — quantities are whole units so the division is exact).
    The p_name LIKE prefix filter prunes part before it broadcasts into
    the lineitem scan; orders joins on the shuffle key only to supply the
    year."""
    p = spark.table("part").filter(F.col("p_name").like("red%"))
    s = spark.table("supplier").join(
        F.broadcast(
            spark.table("nation").select(
                F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    cost_c = (
        F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.col("l_quantity").cast("bigint")
        / 10
    ).cast("bigint")
    return (
        spark.table("lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(spark.table("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(((F.sum(_cents() - cost_c)) / 100.0).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "tpch_q10_returned_items",
    sql=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({_CENTS_SQL}) / 100.0 AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    survey_ops="C1,C6,D3,F2",
    tables=("customer", "orders", "lineitem", "nation"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting) — top-20 customers by revenue
    lost to returns in one quarter. Both scans are pruned before the
    fact-fact shuffle (quarter on orders, returnflag pushed into the
    lineitem parquet scan); customer+nation broadcast; the top-20 plans
    as TakeOrderedAndProject under a (revenue, custkey) total order."""
    o = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    l = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    c = spark.table("customer").join(
        F.broadcast(spark.table("nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_cents()) / 100.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue",
    sql=f"""
    SELECT CAST(round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                       THEN {_CENTS_SQL} ELSE 0 END)
                      / sum({_CENTS_SQL}), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
      AND l.l_shipdate < TIMESTAMP '1997-07-01'
    """,
    survey_ops="C1,D1,H10",
    tables=("lineitem", "part"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) — the generator's p_type is literally
    'PROMO' for promo parts, so the query is near-verbatim: percentage of
    one ship-month's revenue from promo parts. Conditional sum over one
    joined pass, integer cents until the single final division; part
    broadcasts, the month filter prunes the lineitem scan to ~1/60th."""
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-06-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    p = spark.table("part")
    promo = F.when(F.col("p_type") == "PROMO", _cents()).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("promo_c"), F.sum(_cents()).alias("total_c")
        )
        .select(
            F.round(
                100.0 * F.col("promo_c") / F.col("total_c"), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q16_supplier_variety",
    sql="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 50
    """,
    survey_ops="C1,D5,B7,F2",
    tables=("lineitem", "part"),
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) — how many distinct
    suppliers ship each (brand, type, size) bucket, excluding one brand
    and restricted to 8 sizes. The generator has no partsupp table, so
    observed (part, supplier) pairs from lineitem stand in for it —
    count(DISTINCT l_suppkey) dedups the repeat shipments exactly like
    partsupp would. Both predicates (<> and IN) push into the broadcast
    part side before the join."""
    p = spark.table("part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        spark.table("lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
        .limit(50)
    )


@query(
    "tpch_q17_small_quantity_revenue",
    sql=f"""
    SELECT CAST(sum({_CENTS_SQL}) / 100.0 / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN (SELECT l_partkey, avg(l_quantity) AS avg_qty
          FROM lineitem GROUP BY l_partkey) a
      ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.4 * a.avg_qty
    """,
    survey_ops="C1,C9,D1,B6",
    tables=("lineitem", "part"),
)
def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) — revenue from Brand#23
    lineitems whose quantity is below 40% of that part's average, as a
    yearly figure (/7 for the generator's 7-year span). The correlated
    scalar subquery decorrelates into a per-part aggregate joined back on
    partkey; at 2000 parts the aggregate is dimension-sized, so Spark
    broadcasts it and the only shuffle is the partial agg feeding it.
    Quantities are integral doubles, so sum/count and the 0.4x compare
    are the same IEEE values in Spark and DuckDB — the boundary is
    deterministic."""
    li = spark.table("lineitem")
    p = spark.table("part").filter(F.col("p_brand") == "Brand#23")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_pk"))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg((F.sum(_cents()) / 100.0 / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume_orders",
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(round(o.o_totalprice, 2) AS DOUBLE) AS totalprice,
           CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    survey_ops="C8,D3,F2",
    tables=("customer", "orders", "lineitem"),
)
def tpch_q18_large_volume_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q18 (large volume customers) — orders whose total quantity
    exceeds 300 units (generator p99.9 is ~337, so the cut is the same
    "rare whale" selectivity as spec TPC-H). The HAVING subquery becomes
    an aggregate on lineitem semi-joined back into orders; the surviving
    handful of orderkeys then re-join lineitem for the quantity sum.
    Quantities are integral, so the >300 boundary and the bigint output
    are exact on both engines."""
    li = spark.table("lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select("l_orderkey")
    )
    o = spark.table("orders").join(
        F.broadcast(big),
        F.col("o_orderkey") == big.l_orderkey,
        "left_semi",
    )
    return (
        li.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(spark.table("customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    sql=f"""
    SELECT CAST(sum({_CENTS_SQL}) / 100.0 AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    survey_ops="C1,B6,B7,D1",
    tables=("lineitem", "part"),
)
def tpch_q19_disjunctive_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 (discounted revenue) — the OR-of-ANDs bracket query that
    tests disjunction handling: three (brand, size, quantity) brackets.
    Catalyst extracts the common l_quantity bounds? No — the brackets
    overlap, so the OR stays a residual; what matters at scale is that
    the part-side disjuncts (brand OR brand OR brand) reduce the
    broadcast side to three brands before the join, which Catalyst gets
    via constraint propagation from the join's OR predicate — pinned in
    tests/test_plan_quality.py."""
    l = spark.table("lineitem")
    p = spark.table("part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            (F.sum(_cents()) / 100.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q22_dormant_customers",
    sql="""
    WITH cutoff AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0
                AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey, cutoff
    WHERE c.c_acctbal > cutoff.ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    survey_ops="C8,D1,D3,B6",
    tables=("customer", "orders", "nation"),
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) — well-funded customers gone
    dormant: account balance above the positive-balance average, no order
    since 2000, grouped by nation (the generator has no c_phone, so
    nation replaces the phone-prefix country code). Three canonical
    pieces in one plan: a scalar-subquery average that Spark evaluates
    once and broadcasts as a literal-like single-row cross join, a LEFT
    ANTI join against the pruned orders scan, and a dimension rollup.
    The positive-balance sums are exact in cents; the average cutoff is
    the same double on both engines (exact 2dp inputs)."""
    c = spark.table("customer")
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    recent = spark.table("orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .join(
            F.broadcast(spark.table("nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
                / 100.0
            ).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "tpch_q2_min_cost_supplier",
    sql="""
    WITH s AS (
      SELECT s_suppkey, s_name, s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'),
    ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    j AS (
      SELECT ps.l_partkey, p.p_name, s.s_suppkey, s.s_name, s.n_name,
             CAST(round(s.s_acctbal, 2) AS DOUBLE) AS acctbal
      FROM ps
      JOIN s ON ps.l_suppkey = s.s_suppkey
      JOIN part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20),
    mx AS (SELECT l_partkey, max(acctbal) AS mb FROM j GROUP BY l_partkey)
    SELECT j.l_partkey AS p_partkey, j.p_name, j.s_suppkey, j.s_name,
           j.n_name, j.acctbal
    FROM j JOIN mx ON j.l_partkey = mx.l_partkey AND j.acctbal = mx.mb
    ORDER BY acctbal DESC, p_partkey, s_suppkey
    LIMIT 100
    """,
    survey_ops="C1,C6,D8,F2",
    tables=("supplier", "nation", "region", "part", "lineitem"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier) — for each LARGE mid-size part,
    the best ASIA supplier observed shipping it. The generator has no
    partsupp/ps_supplycost, so the catalog is the DISTINCT
    (part, supplier) pairs from lineitem and "best" is max account
    balance (argmax instead of argmin: same correlated-subquery shape).
    The correlated max decorrelates into a per-part aggregate joined
    back on (partkey, acctbal) — ties keep both suppliers exactly like
    spec Q2. Dimension legs broadcast; max on an exact 2dp value, so
    the equality join-back is deterministic."""
    r = spark.table("region").filter(F.col("r_name") == "ASIA")
    n = spark.table("nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = spark.table("supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = spark.table("part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    ps = spark.table("lineitem").select("l_partkey", "l_suppkey").distinct()
    j = (
        ps.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )
    mx = j.groupBy(F.col("l_partkey").alias("m_pk")).agg(
        F.max("acctbal").alias("mb")
    )
    return (
        j.join(
            F.broadcast(mx),
            (F.col("l_partkey") == F.col("m_pk"))
            & (F.col("acctbal") == F.col("mb")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            "acctbal",
        )
        .orderBy(F.desc("acctbal"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(100)
    )


@query(
    "tpch_q6_forecast_revenue",
    sql="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                         AS BIGINT)) / 100.0 AS DOUBLE) AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey_ops="B6,D1",
    tables=("lineitem",),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) — the purest scan-filter-agg
    in the suite: revenue that would be lost by eliminating small
    discounts. Every predicate (ship year, discount band, quantity cap)
    pushes to the parquet reader; no join, no shuffle beyond the final
    1-row agg. Discounts are exact 2dp values so the BETWEEN bounds are
    reliable on both engines; the sum stays in integer cents."""
    cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100
    ).cast("bigint")
    return (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents) / 100.0).alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q12_late_lines_by_class",
    sql="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    survey_ops="C1,D2,B11",
    tables=("lineitem", "orders"),
)
def tpch_q12_late_lines_by_class(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority) — how many
    high-priority vs other orders had late lines, per line status
    (standing in for the ungenerated l_shipmode; >60-day ship lag for
    the ungenerated commit/receipt dates). The priority split is the
    classic conditional-count pivot computed in ONE pass over the
    joined rows; the ship-year filter prunes the lineitem scan and the
    lateness predicate rides the join as a residual."""
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = spark.table("orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q15_top_supplier",
    sql="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey),
    mx AS (SELECT max(rev_c) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.rev_c / 100.0 AS DOUBLE) AS total_revenue
    FROM rev JOIN mx ON rev.rev_c = mx.m
    JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    ORDER BY s.s_suppkey
    """,
    survey_ops="D3,D8,B5",
    tables=("lineitem", "supplier"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier) — the supplier(s) with maximum revenue in
    one quarter; spec keeps ALL ties, which is why the shape is
    revenue-view + scalar max + equality join rather than ORDER BY
    LIMIT 1. Revenue is an integer-cent sum, so the max and the
    tie-equality are exact — no epsilon games. The scalar max enters as
    a 1-row broadcast; supplier is a broadcast dim."""
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = (
        spark.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(cents).alias("rev_c"))
    )
    mx = rev.agg(F.max("rev_c").alias("m"))
    return (
        rev.join(F.broadcast(mx), F.col("rev_c") == F.col("m"))
        .join(
            F.broadcast(spark.table("supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c") / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q20_excess_share_suppliers",
    sql="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey),
    ptot AS (SELECT l_partkey, sum(sq) AS tq FROM pq GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM pq
    JOIN ptot ON pq.l_partkey = ptot.l_partkey
    JOIN part p ON p.p_partkey = pq.l_partkey
    JOIN supplier s ON s.s_suppkey = pq.l_suppkey
    WHERE p.p_name LIKE 'red%' AND 2 * pq.sq > ptot.tq
    ORDER BY s.s_suppkey
    """,
    survey_ops="C8,D3,D8,B8",
    tables=("lineitem", "part", "supplier"),
)
def tpch_q20_excess_share_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 (potential part promotion) — suppliers holding a
    dominant position: shipped MORE THAN HALF of some red part's total
    1997 volume (the generator has no ps_availqty, so "excess stock"
    becomes excess market share — the same nested-aggregate + semi-join
    shape). Quantities are integral, so the 50% test is the exact
    integer comparison 2*sq > tq, never a float ratio. Two chained
    aggregations share the l_partkey shuffle; part and supplier
    broadcast; DISTINCT collapses a supplier dominating several parts."""
    l = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    pq = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    ptot = pq.groupBy(F.col("l_partkey").alias("t_pk")).agg(
        F.sum("sq").alias("tq")
    )
    p = spark.table("part").filter(F.col("p_name").like("red%"))
    return (
        pq.join(ptot, F.col("l_partkey") == F.col("t_pk"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(2 * F.col("sq") > F.col("tq"))
        .join(
            F.broadcast(spark.table("supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_suppliers",
    sql="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    survey_ops="C8,D3,F2",
    tables=("lineitem", "orders", "supplier"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the hardest shape
    in the suite: an EXISTS and a NOT EXISTS against the SAME fact table
    on the same key. A late line counts only if another supplier was on
    the order (semi join) and no OTHER supplier was also late (anti
    join). Both subqueries correlate through o_orderdate, so the
    late-line set is computed once and reused as the anti side; the
    three fact joins all share the l_orderkey shuffle key. Lateness =
    ship > order date + 60 days (no commit/receipt dates generated)."""
    o = spark.table("orders").select("o_orderkey", "o_orderdate")
    li = spark.table("lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(
        o,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)),
    ).select("l_orderkey", "l_suppkey")
    other = li.select(
        F.col("l_orderkey").alias("x_ok"), F.col("l_suppkey").alias("x_sk")
    )
    late_other = late.select(
        F.col("l_orderkey").alias("y_ok"), F.col("l_suppkey").alias("y_sk")
    )
    return (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("x_ok"))
            & (F.col("l_suppkey") != F.col("x_sk")),
            "left_semi",
        )
        .join(
            late_other,
            (F.col("l_orderkey") == F.col("y_ok"))
            & (F.col("l_suppkey") != F.col("y_sk")),
            "left_anti",
        )
        .join(
            F.broadcast(spark.table("supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@query(
    "tpch_q11_important_parts",
    sql=f"""
    WITH val AS (
      SELECT l.l_partkey, CAST(sum({_CENTS_SQL}) AS BIGINT) AS value_c
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value_c
    FROM val
    WHERE value_c > (SELECT 1.3 * avg(value_c) FROM val)
    ORDER BY value_c DESC, l_partkey
    """,
    survey_ops="C1,D3,G(ext)",
    tables=("lineitem", "supplier", "nation", "region"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted: the
    driver schema has no partsupp table, so 'inventory value' is the
    lineitem revenue one region's suppliers moved per part — the defining
    Q11 mechanics are intact: per-key value rollup filtered by a HAVING
    against a SCALAR SUBQUERY over the same rollup (group total vs a
    multiple of the global mean — scale-free where Q11's literal fraction
    is 1/SF-scaled by the spec). The rollup is computed once and
    reused for both sides (self-referencing CTE; Spark caches the small
    aggregated frame, never rescanning the fact table); the global sum
    is a 1-row broadcast crossJoin. Integer cents throughout — the only
    double is the threshold itself (one avg division). Completes the named TPC-H
    corpus: Q1-Q22 all present (Q13's shape is
    aq_order_count_distribution)."""
    l = spark.table("lineitem")
    s = spark.table("supplier")
    n = spark.table("nation")
    r = spark.table("region").filter(F.col("r_name") == "EUROPE")
    val = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents()).alias("value_c"))
        .cache()
    )
    total = val.agg((1.3 * F.avg("value_c")).alias("thr"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") > F.col("thr"))
        .select("l_partkey", "value_c")
        .orderBy(F.desc("value_c"), F.asc("l_partkey"))
    )
