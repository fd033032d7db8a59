"""TPC-H-style analytic queries adapted to the driver's star schema.

The reference has no relational layer (SURVEY §2.5 — crick is a sketch
library); this module exercises the engine's *relational* surface with the
classic TPC-H query shapes, adapted to the columns the synthetic tables
actually have (no partsupp table, no commit/receipt dates, no ship modes).
Each query is a distinct physical shape worth auditing at 100 TB:

- Q3/Q10: selective dim filter -> fact join -> agg -> deterministic top-k.
- Q4: EXISTS as a LEFT SEMI join whose condition is an equi-key plus a
  residual inequality (stays a hash semi-join, inequality applied post-probe).
- Q5/Q7/Q8: multi-way joins where a *pair* of nation keys must agree —
  join-order stress; nation/region are broadcast explicitly (25/5 rows at
  every SF), customer/supplier/part are left to AQE so the plan degrades
  gracefully to shuffle joins at scale instead of OOMing a broadcast.
- Q6/Q14/Q19: scan-heavy filter+agg; predicates (incl. the Q19 OR-of-ANDs)
  must reach the parquet scan as PushedFilters.
- Q15: scalar-subquery max over an aggregate (argmax without a self-join
  in the DataFrame form: window max on the rounded revenue grid).
- Q17: correlated scalar aggregate subquery, decorrelated by hand into an
  aggregate + equi-join (the form Catalyst rewrites to anyway).
- Q18: HAVING on a fact-side pre-aggregation *before* the dimension joins —
  the shuffle happens on the reduced key set, not raw lineitem.
- Q22: anti-join against a date-filtered order set + uncorrelated scalar
  subquery threshold.

All queries are exact and DuckDB-oracle-matched; money sums are rounded
in-query to 2 decimals (grid >> summation-order error), and every top-k
orders by the *rounded* measure with a key tie-break so row selection is
deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crick_spark.plans.registry import register
from crick_spark.sources.tables import load_table


def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q3 — shipping priority: unshipped orders of one segment, top 10 by revenue
# ---------------------------------------------------------------------------
@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape: segment filter prunes customers before the fact "
    "join; both date predicates push to the parquet scans; top-10 on the "
    "rounded revenue with (date, key) tie-break for determinism.",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    cut = F.lit("1998-06-01").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cut)
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cut)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q4 — order priority: EXISTS(lineitem shipped >60d after order) as semi-join
# ---------------------------------------------------------------------------
@register(
    "tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
    doc="TPC-H Q4 shape (adapted: no commit/receipt dates, so 'late' = "
    "shipped >60 days after order date).  LEFT SEMI hash join on the order "
    "key with the inequality as a residual post-probe condition — no "
    "row-explosion, no distinct needed.",
)
def tpch_q4_order_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(l, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-table join, supplier and customer co-national
# ---------------------------------------------------------------------------
@register(
    "tpch_q5_local_supplier",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n.n_name
""",
    doc="TPC-H Q5: the c_nationkey = s_nationkey residual makes join order "
    "matter; nation/region broadcast explicitly (bounded at every SF), "
    "customer/supplier joins left to AQE so the plan survives 100 TB.",
)
def tpch_q5_local_supplier(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan filter + scalar aggregate
# ---------------------------------------------------------------------------
@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: everything is a pushable scan predicate; the whole query "
    "is one WholeStageCodegen span ending in a partial+final scalar agg — "
    "zero shuffle beyond the single-row exchange.",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by direction and ship year
# ---------------------------------------------------------------------------
@register(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7: the two-nation disjunction can't be split per-table "
    "(each disjunct constrains both sides), so it stays a post-join filter "
    "on two broadcast nation joins; the fact-side joins carry no residual.",
)
def tpch_q7_volume_shipping(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share within a region for one part type
# ---------------------------------------------------------------------------
@register(
    "tpch_q8_market_share",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
         AS nation_volume,
       round(sum(volume), 2) AS total_volume
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
) GROUP BY o_year
""",
    doc="TPC-H Q8 (share reported as the two rounded sums rather than "
    "their quotient, keeping the oracle hash-match on a stable grid): "
    "8-way join, region+type filters prune before the fact scan grows.",
)
def tpch_q8_market_share(spark, sf_dir):
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    r = (
        load_table(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    vol = _revenue()
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)),
                2,
            ).alias("nation_volume"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by lost revenue
# ---------------------------------------------------------------------------
@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       round(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: returnflag + date predicates push to both fact scans; "
    "top-20 on rounded revenue with custkey tie-break.",
)
def tpch_q10_returned_items(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .withColumn("c_acctbal", F.round("c_acctbal", 2))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: conditional-sum ratio over one ship month
# ---------------------------------------------------------------------------
@register(
    "tpch_q14_promo_effect",
    oracle="""
SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END), 2) AS promo_revenue,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
GROUP BY ALL
""",
    doc="TPC-H Q14 (the two sums reported instead of their percentage — "
    "stable rounding grid): one-month scan filter, part join, "
    "conditional aggregation.",
)
def tpch_q14_promo_effect(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _revenue()
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0)), 2
            ).alias("promo_revenue"),
            F.round(F.sum(vol), 2).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s): revenue per supplier vs the max (scalar subquery)
# ---------------------------------------------------------------------------
@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    doc="TPC-H Q15: argmax over an aggregate.  The max side re-derives the "
    "per-supplier rollup and broadcasts a 1-row threshold; Spark does not "
    "reuse the rollup exchange across the two consumers, so lineitem is "
    "scanned twice — both scans carry the pushed 3-month filter, which is "
    "the cheaper failure mode at scale than the single-scan alternative "
    "(an empty-frame window max that collapses every supplier into one "
    "partition).",
)
def tpch_q15_top_supplier(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = rev.join(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(F.broadcast(s), top.suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity revenue: correlated avg-per-part subquery, decorrelated
# ---------------------------------------------------------------------------
@register(
    "tpch_q17_small_quantity",
    oracle="""
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
""",
    doc="TPC-H Q17: the correlated scalar subquery is decorrelated by hand "
    "into a per-part average aggregate joined back on partkey — the same "
    "rewrite Catalyst performs, made explicit so the plan shows one "
    "aggregate + one join, no per-row subquery.",
)
def tpch_q17_small_quantity(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    # Aggregate only the brand's parts: semi-reduce lineitem first.
    lp = l.join(p, l.l_partkey == p.p_partkey).drop("p_partkey")
    thresh = lp.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        lp.join(thresh, on="l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING on fact pre-aggregation
# ---------------------------------------------------------------------------
@register(
    "tpch_q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice, big.sum_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    doc="TPC-H Q18: aggregate lineitem to order grain FIRST (HAVING > 300), "
    "then join the few surviving keys to orders/customer — at 100 TB the "
    "join input is the reduced key set, not raw lineitem.",
)
def tpch_q18_large_orders(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 300)
        .select("l_orderkey", F.round("raw_qty", 2).alias("sum_qty"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of brand/size/quantity conjunctions
# ---------------------------------------------------------------------------
@register(
    "tpch_q19_disjunctive_filter",
    oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    doc="TPC-H Q19: OR-of-ANDs mixing columns from both sides; the "
    "per-table implied disjuncts (brand IN (..), quantity ranges) are "
    "derivable by Catalyst's constraint propagation and land in "
    "PushedFilters, the cross-table residue stays on the join.",
)
def tpch_q19_disjunctive_filter(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, z = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#11") & z.between(1, 15) & q.between(1, 21))
        | ((b == "Brand#22") & z.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#33") & z.between(1, 35) & q.between(20, 40))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            F.round(F.sum(_revenue()), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers: anti-join + scalar threshold
# ---------------------------------------------------------------------------
@register(
    "tpch_q22_dormant_customers",
    oracle="""
SELECT c.c_mktsegment, count(*) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c.c_mktsegment
""",
    doc="TPC-H Q22 (adapted: dormancy = no orders since 2000-01-01; the "
    "schema has no phone column).  Uncorrelated scalar average as a "
    "broadcast threshold, NOT EXISTS as a LEFT ANTI join on the "
    "date-filtered order set.",
)
def tpch_q22_dormant_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("thresh"))
        .select("thresh")
    )
    rich = c.join(F.broadcast(avg_pos)).where(F.col("c_acctbal") > F.col("thresh"))
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated min subquery via lineitem bridge
# ---------------------------------------------------------------------------
@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE')
SELECT p.p_partkey, p.p_name, e.s_name, e.n_name,
       round(e.s_acctbal, 2) AS s_acctbal, c.unit_cost
FROM part p
JOIN cost c ON c.l_partkey = p.p_partkey
JOIN eu e ON e.s_suppkey = c.l_suppkey
WHERE p.p_size = 5 AND p.p_type = 'SMALL'
  AND c.unit_cost = (
    SELECT min(c2.unit_cost) FROM cost c2
    JOIN eu e2 ON e2.s_suppkey = c2.l_suppkey
    WHERE c2.l_partkey = p.p_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_name
LIMIT 100
""",
    doc="TPC-H Q2 shape (adapted: no partsupp, so supply cost = the minimum "
    "observed unit price per (part, supplier) in lineitem).  The correlated "
    "min subquery is decorrelated into a per-part window min over the "
    "region-filtered cost set — one aggregate, one window, no per-row "
    "subquery; supplier/nation/region are broadcast (bounded at every SF).",
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2).alias(
            "unit_cost"
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_size") == 5) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_name")
    )
    # Region-filtered costs once; per-part min via window (no self-join).
    eu_cost = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        eu_cost.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------
@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       CAST(sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000
                      - 6000 * p.p_retailprice * l.l_quantity)) AS BIGINT)
         AS profit_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 shape (adapted: no partsupp supply cost, so cost = 60% of "
    "p_retailprice per unit).  The p_name LIKE filter prunes part before "
    "the fact join; nation broadcasts; the 5-way join is left to AQE.",
)
def tpch_q9_product_profit(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    # The inputs live on a 1e-4 currency grid, so the scaled amount is an
    # exact integer: per-row round() recovers it from float noise, the sum
    # is then exact in both engines, and no half-boundary rounding of the
    # aggregate exists to diverge on (profit reported in 1e-4 units).
    amount = F.round(
        _revenue() * 10000 - 6000 * F.col("p_retailprice") * F.col("l_quantity"), 0
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("long").alias("profit_e4"))
    )


# ---------------------------------------------------------------------------
# Q11 — important part values for one nation's suppliers (HAVING vs scalar)
# ---------------------------------------------------------------------------
@register(
    "tpch_q11_important_parts",
    oracle="""
WITH nat_val AS (
  SELECT l.l_partkey, sum(l.l_extendedprice) AS raw_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey)
SELECT l_partkey, round(raw_value, 2) AS part_value
FROM nat_val
WHERE raw_value > (SELECT 0.001 * sum(raw_value) FROM nat_val)
ORDER BY part_value DESC, l_partkey
""",
    doc="TPC-H Q11 shape (adapted: part value = lineitem extendedprice "
    "shipped by the nation's suppliers, no partsupp).  The global-fraction "
    "threshold is an uncorrelated scalar aggregate broadcast against the "
    "grouped rollup — the rollup is computed once and reused for both "
    "sides via cache-free re-derivation at bounded key cardinality.",
)
def tpch_q11_important_parts(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    nat = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = (
        l.join(F.broadcast(nat), l.l_suppkey == nat.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("raw_value"))
    )
    thresh = val.agg((F.sum("raw_value") * 0.001).alias("thresh"))
    return (
        val.join(F.broadcast(thresh))
        .where(F.col("raw_value") > F.col("thresh"))
        .select("l_partkey", F.round("raw_value", 2).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — late shipments by returnflag: conditional priority counts
# ---------------------------------------------------------------------------
@register(
    "tpch_q12_late_shipments",
    oracle="""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    doc="TPC-H Q12 shape (adapted: no ship modes, grouped by returnflag; "
    "'late' = shipped >30 days after order date).  The year filter pushes "
    "to the lineitem scan; the lateness inequality is a residual on the "
    "equi-join; conditional counts are one pass post-join.",
)
def tpch_q12_late_shipments(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + double aggregation
# ---------------------------------------------------------------------------
@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13: LEFT OUTER join with the priority exclusion inside the "
    "join condition (so customers with only urgent orders still count as "
    "zero), then a second aggregation over the first's key-count — the "
    "second shuffle is on the tiny distinct-count domain.",
)
def tpch_q13_customer_distribution(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part descriptor: distinct count + NOT IN
# ---------------------------------------------------------------------------
@register(
    "tpch_q16_supplier_diversity",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16 shape (adapted: supplier 'complaints' = negative account "
    "balance; lineitem is the part-supplier bridge).  NOT IN over a "
    "non-null key set compiles to a LEFT ANTI broadcast join; "
    "count(DISTINCT) shuffles on the grouped descriptor keys.",
)
def tpch_q16_supplier_diversity(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 — heavy shippers of one part family: nested semi-join reduction
# ---------------------------------------------------------------------------
@register(
    "tpch_q20_heavy_shippers",
    oracle="""
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 50)
ORDER BY s.s_name
""",
    doc="TPC-H Q20 shape (adapted: no partsupp availability, so the inner "
    "predicate is 'shipped >50 units of some red part in 1997').  The "
    "inner aggregate reduces lineitem to qualifying supplier keys before "
    "any supplier-side work; IN = LEFT SEMI join on the reduced set.",
)
def tpch_q20_heavy_shippers(spark, sf_dir):
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: sole-late-supplier detection
# ---------------------------------------------------------------------------
@register(
    "tpch_q21_waiting_orders",
    oracle="""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey),
ord AS (
  SELECT l_orderkey, count(*) AS nsupp, sum(is_late) AS nlate
  FROM lo GROUP BY l_orderkey)
SELECT s.s_name, count(*) AS numwait
FROM lo
JOIN ord ON ord.l_orderkey = lo.l_orderkey
JOIN supplier s ON s.s_suppkey = lo.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE lo.is_late = 1 AND ord.nsupp >= 2 AND ord.nlate = 1
  AND n.n_name = 'NATION_1'
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    doc="TPC-H Q21 shape, fully decorrelated: the EXISTS/NOT EXISTS pair "
    "('another supplier on the order; no OTHER supplier was late') becomes "
    "one (order, supplier)-grain aggregate with a lateness flag plus one "
    "order-grain rollup — supplier qualifies on an order iff it is late, "
    "the order has >=2 suppliers, and exactly 1 late one.  Two shuffles "
    "on bounded grains replace the reference pattern's double correlated "
    "scan; 'late' = shipped >60 days after order date (no receipt dates).  "
    "r14 (guide §2.4): the order-grain rollup is a WINDOW over the "
    "(order, supplier) aggregate, not a re-aggregate + self-join — the "
    "join form re-executed the whole lineitem⨝orders subtree on its "
    "second branch (Catalyst does not reuse exchanges across the two "
    "consumers), one full pass of the fact table for counts the window "
    "reads off the same partitioning.",
)
def tpch_q21_waiting_orders(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    from pyspark.sql import Window as W

    wnd = W.partitionBy("l_orderkey")
    lo = lo.withColumn("nsupp", F.count("*").over(wnd)).withColumn(
        "nlate", F.sum("is_late").over(wnd)
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    return (
        lo.where(
            (F.col("is_late") == 1)
            & (F.col("nsupp") >= 2)
            & (F.col("nlate") == 1)
        )
        .join(s, lo.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
