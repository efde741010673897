"""Deep-cut TPC-H-shaped analytics (Q2/Q5/Q7/Q8/Q9/Q10/Q11/Q13/Q15/
Q16/Q17/Q19/Q20/Q21/Q22 shapes) adapted to the testdata schema — the
multiway-join, correlated-aggregate, and anti-join patterns that
stress a planner hardest.

Together with operators/tpch.py (Q1/Q4/Q6/Q12/Q14/Q18) and the Q3
adaptation in operators/joins.py (q_join_shipping_priority), this
covers ALL 22 classic query shapes: snowflake joins over
4-8 tables (Q5/Q7/Q8/Q9), fact→dim enrich + top-k (Q10), grouped agg
gated by a scalar subquery (Q11), outer-join histogram (Q13),
aggregate-vs-its-own-max (Q15), correlated scalar-MIN join-back (Q2),
anti-join + grouped distinct (Q16), correlated per-group average (Q17),
disjunctive pushdown (Q19), nested-IN semi-join chain (Q20), paired
EXISTS/NOT EXISTS (Q21), and NOT EXISTS + scalar subquery (Q22).

Scale notes (100 TB discipline, same conventions as tpch.py):
- Only fixed-cardinality dims (region: 5, nation: 25) get an explicit
  ``broadcast()``; sf-scaling tables (customer/supplier/part/orders) are
  left to AQE so plans degrade safely when the "dim" is 10^9 rows.
- All money aggregates go through functions/aggs.py decimal-exact
  helpers, so results are bit-identical across engines AND across
  cluster sizes (double-sum reassociation under different partition
  counts would otherwise flip rounded digits at 100 TB).
- Every filter is expressed on scan columns before any join, so it
  reaches the parquet reader (PushedFilters) — verified in PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from end_to_end_aws_data_pipeline_spark.catalog import table
from end_to_end_aws_data_pipeline_spark.functions.aggs import dsum, dsum_sql
from end_to_end_aws_data_pipeline_spark.functions.aggs import stable_round
from end_to_end_aws_data_pipeline_spark.registry import register

# ---------------------------------------------------------------------------
# Q5 shape: local-supplier volume (6-table snowflake join)
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table snowflake with the customer-nation =
    supplier-nation co-location predicate folded into the supplier join.

    region/nation are fixed-cardinality (5/25 rows at ANY sf) →
    broadcast; the three fact-ish joins shuffle on their keys and AQE
    picks broadcast sides from runtime stats where they fit."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy("n_name")
        .agg(dsum(rev, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# ---------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations (bidirectional pair filter)
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume', 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dim table joined twice under different
    roles (supplier-nation vs customer-nation) with a bidirectional
    pair predicate, grouped by ship year.

    The nation filter is applied INSIDE each broadcast branch (2 names
    out of 25), so the disjunctive pair predicate after the joins only
    sees pre-filtered rows — at 100 TB the two broadcast-hash-join
    probes discard non-matching lineitems without shuffling them."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    j = (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            vol.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item reporting (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: quarter of orders × returned lineitems →
    revenue per customer → global top-20 (TakeOrderedAndProject, not a
    full sort). The returnflag filter reaches the lineitem scan."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-07-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1995-10-01 00:00:00")))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join → double agg)
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join with a predicate ON the join
    (not a WHERE — customers with zero qualifying orders must survive
    with count 0), then a histogram of the grouped counts.

    The second aggregation's input is one row per customer — the
    re-shuffle on c_count is over an already-reduced set, and its key
    cardinality (~max orders per customer) is tiny at any scale."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 shape: top supplier (aggregate compared against its own max)
# ---------------------------------------------------------------------------

_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: an aggregate joined against its own global max
    (the classic "view used twice" query). The max is a 1-row aggregate
    → broadcast-joined as a degenerate cross join; the revenue view is
    computed once and reused (Spark re-executes the subtree, but both
    branches are the same single-shuffle agg over the filtered scan).

    Revenue equality across engines is safe ONLY because total_revenue
    is decimal-exact-then-rounded (functions/aggs.py) — raw double sums
    would make `= max` engine-dependent."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-07-01 00:00:00")))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(rev, 4).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 shape: small-quantity-order revenue (correlated per-group average)
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
WITH part_avg AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                / count(l_quantity)) AS qty_threshold
  FROM lineitem
  GROUP BY l_partkey
)
SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
       count(*) AS n_small_orders
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < qty_threshold
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate self-join — the fact table
    is read twice, joined on its own group key.

    The threshold is decimal-exact-sum / exact-count → one double
    divide and multiply, identical in any engine; comparing raw
    double-avg would be plan-shape-dependent. Both lineitem branches
    shuffle on l_partkey, so AQE can co-locate them; the brand filter
    prunes the probe side at the part scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_threshold")
    )
    j = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return j.agg(
        stable_round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_orders"),
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity predicate (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_discounted_revenue", oracle=_Q19_ORACLE)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing columns from both join sides.

    Catalyst factors the single-side conjuncts out of the disjunction:
    part gets `p_brand IN (12,23,34) AND p_size BETWEEN 1 AND 15` and
    lineitem gets `l_quantity BETWEEN 1 AND 30` pushed to the scans,
    leaving only the cross-table residual on the join output — the
    difference between scanning 3 brands and scanning ALL of part at
    100 TB."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(p, F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(
        dsum(rev, 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q22 shape: global-sales opportunity (scalar subquery + NOT EXISTS)
# ---------------------------------------------------------------------------

_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         / count(c_acctbal) AS v
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntry,
       count(*) AS numcust,
       {dsum_sql('c_acctbal', 2)} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT v FROM avg_bal)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("q22_global_sales_opportunity", oracle=_Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (average positive
    balance) + NOT EXISTS anti-join against orders, grouped by the
    country code (c_nationkey here). The "lapsed customer" cutoff
    (no orders since 2000) replaces the original's 7-year phone-prefix
    gymnastics while keeping the anti-join non-trivially selective.

    The 1-row average is broadcast as a degenerate >-join (what
    Catalyst itself produces for the scalar subquery); the anti-join
    shuffles on custkey only for customers above the threshold —
    filter-before-anti-join order matters at 100 TB and is explicit
    here. Threshold is exact-sum/exact-count, so the > cut is
    engine-stable."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01 00:00:00"))
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_v")
    )
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_v")).drop(
        "avg_v"
    )
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
        .orderBy("cntry")
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share (ratio of conditional revenue sums)
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
WITH flat AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       floor(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) * 1000000 + 0.5) / 1000000
         AS mkt_share,
       count(*) AS n_items
FROM flat
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_national_market_share", oracle=_Q8_ORACLE)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-table snowflake where nation plays BOTH roles
    (customer region gate via n1, supplier attribution via n2) and the
    answer is a ratio of conditional revenue sums per year.

    Both sums quantize to DECIMAL(18,4) before aggregation, so the
    ratio is one double divide of two exact numbers — engine- and
    partitioning-stable. Filters (region name, part type, date window)
    all reach their scans; only fixed-cardinality nation/region get
    forced broadcasts."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_regionkey").alias("n1_region"),
        )
    )
    n2 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    r = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    flat = (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        flat.groupBy("o_year")
        .agg(
            stable_round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit by nation and year
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS profit,
       count(*) AS n_items
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


@register("q9_product_type_profit", oracle=_Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit for one product line rolled up by
    supplier nation × order year (the original's ps_supplycost term
    drops — partsupp has no analogue in this schema; revenue keeps the
    plan shape: 5-table join + substring filter + two-key rollup).

    The `%widget%` LIKE cannot prune at the scan (leading wildcard) but
    still evaluates in the scan operator before the first join — the
    plan discards ~5/6 of part rows pre-shuffle."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            dsum(rev, 4).alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who kept orders waiting (EXISTS + NOT EXISTS pair)
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 100 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the paired correlated EXISTS / NOT EXISTS —
    suppliers who were the SOLE late shipper on a finalized
    multi-supplier order. Adapted late predicate: the schema has no
    commit/receipt dates, so "late" = shipped >100 days after the order
    date (same join shape: the flag needs lineitem ⋈ orders).

    Spark expresses the two correlated subqueries as a LEFT SEMI and a
    LEFT ANTI join, each an equi-join on the order key with a
    supplier-key inequality as residual condition — the exact
    decorrelation Catalyst would produce from the SQL, but stated
    directly. The nation gate filters supplier BEFORE the semi/anti
    pair, cutting l1 ~25x ahead of both shuffles; at 100 TB all three
    joins co-partition on l_orderkey so AQE can collapse adjacent
    shuffles."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAY")
        )
        .select("l_orderkey", "l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    l1 = late.join(s, F.col("l_suppkey") == F.col("s_suppkey")).join(
        n, F.col("s_nationkey") == F.col("n_nationkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


# ---------------------------------------------------------------------------
# Q11 shape: important parts (HAVING vs a scalar subquery over the same fact)
# ---------------------------------------------------------------------------

_Q11_ORACLE = f"""
SELECT l_partkey AS partkey,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 1500
       > (SELECT sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
          FROM lineitem)
ORDER BY part_value DESC, partkey
"""


@register("q11_important_parts", oracle=_Q11_ORACLE)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep the groups whose share of TOTAL value
    exceeds a threshold — a grouped aggregate gated by a scalar
    subquery over the same fact table (share > 1/1500 of the corpus).

    The scalar side is a 1-row aggregate joined in with an explicit
    broadcast (a 1-row broadcast is free at any scale; the fact table
    is scanned twice, which AQE cannot avoid but columnar pruning makes
    each scan 3-column). The HAVING comparison runs on UNROUNDED exact
    decimals times an integer — bit-identical keep set in any engine
    and under any partitioning; the displayed value rounds only in the
    output projection."""
    li = table(spark, sf_dir, "lineitem")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(val).alias("_exact"),
        stable_round(F.sum(val).cast("double"), 4).alias("part_value"),
    )
    total = li.agg(F.sum(val).alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_exact") * 1500 > F.col("_total"))
        .select("partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# Q20 shape: suppliers with excess stock (nested IN chain -> semi-join chain)
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 100
)
ORDER BY s_name
"""


@register("q20_excess_stock_suppliers", oracle=_Q20_ORACLE)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested-IN chain — suppliers who shipped
    more than a threshold quantity of any one product from a
    name-filtered part family (partsupp's availqty gate becomes a
    shipped-quantity gate; the plan shape is identical: filtered dim →
    fact agg → IN → outer semi-join).

    Spark states it as a semi-join chain: part (prefix LIKE, prunable
    at the scan) inner-joins lineitem, a two-key aggregate applies the
    threshold, and supplier LEFT SEMI joins the surviving supplier
    keys. Quantities are integer-valued doubles, so the HAVING sum is
    exact in both engines. At scale every step shuffles on a key it
    already needs for its own aggregate — no extra exchanges."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = table(spark, sf_dir, "lineitem")
    excess = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select(F.col("l_suppkey").alias("xs_key"))
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(excess, F.col("s_suppkey") == F.col("xs_key"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier (correlated scalar MIN per group)
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH eu_sup AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pp AS (
  SELECT p_partkey, p_brand FROM part
  WHERE p_type = 'ECONOMY' AND p_size <= 15
), cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
  FROM lineitem
  JOIN pp ON l_partkey = p_partkey
  JOIN eu_sup ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, min(supply_cost) AS best_cost FROM cost GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name,
       c.l_partkey AS p_partkey, p_brand, c.supply_cost
FROM cost c
JOIN best b ON c.l_partkey = b.l_partkey AND c.supply_cost = b.best_cost
JOIN eu_sup ON c.l_suppkey = s_suppkey
JOIN pp ON c.l_partkey = pp.p_partkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every part in a filtered family, the
    region-local supplier offering the MINIMUM cost — the classic
    correlated scalar-MIN subquery, stated as aggregate + equality
    join-back (min per group, then keep the rows that attain it).

    Adaptation (testdata has no partsupp): supply cost = the supplier's
    cheapest observed sale of the part (min l_extendedprice per
    (part, supplier) from lineitem, restricted to EUROPE suppliers).
    MIN picks an EXISTING double — no arithmetic — so the tie-back
    equality is bit-exact in both engines. Plan shape: the region
    restriction broadcasts (bounded: region×nation prune supplier),
    both MIN aggregates share the (partkey) shuffle key, and the final
    detail joins ride the already-shuffled keys. The ORDER BY ... LIMIT
    is a TakeOrderedAndProject — no global sort — over a full unique
    sort key (acctbal, nation, supplier name, part key), so the kept
    100 are deterministic.
    """
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        s.join(
            F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pp = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_brand")
    )
    li = table(spark, sf_dir, "lineitem")
    cost = (
        li.join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .join(eu_sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supply_cost").alias("best_cost")
    )
    return (
        cost.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("supply_cost") == F.col("best_cost")),
        )
        .join(eu_sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(pp, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            "supply_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q16 shape: parts/supplier relationship (anti-join + grouped distinct)
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_relationship", oracle=_Q16_ORACLE)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    surviving (brand, type, size) bucket, EXCLUDING a blocklisted
    supplier set — negated dim predicates + NOT IN anti-join + grouped
    COUNT DISTINCT.

    Adaptation (no partsupp / s_comment): supply relationships come
    from lineitem's observed (part, supplier) pairs, and the
    complaints blocklist becomes suppliers with negative account
    balance (same plan shape: a subquery-driven anti-join; the set is
    empty at the smallest SF and non-empty from sf0.01 up, so the
    exclusion path executes in the gate). The IN-list and inequality
    predicates sit on part scan columns (pushed), the anti-join
    broadcasts a bounded blocklist, and COUNT DISTINCT shuffles once on
    the 3-part group key.
    """
    blocked = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            blocked, F.col("l_suppkey") == F.col("bad_key"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )
