"""Scalar-function surface: datetime, calendar densification, map types.

Fills the remaining SURVEY §2.5 'Scalar functions' cells the other plan
modules don't touch: the date/time function family, generator functions
(``sequence`` + ``explode`` as the interval-densification pattern every
time-series pipeline needs), and MapType construction/extraction.  All
expressions are JVM built-ins inside WholeStageCodegen — no Python UDFs —
and each query aggregates down before returning, so nothing here shuffles
wide rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crick_spark.plans.registry import register
from crick_spark.sources.tables import load_table
from crick_spark.tmpdirs import run_tmpdir


# ---------------------------------------------------------------------------
# Date/time function family over orders x lineitem ship lag
# ---------------------------------------------------------------------------
@register(
    "datetime_functions_orders",
    oracle="""
SELECT quarter(o.o_orderdate) AS qtr,
       dayofweek(CAST(o.o_orderdate AS DATE)) + 1 AS dow_spark,
       count(*) AS cnt,
       round(avg(datediff('day', CAST(o.o_orderdate AS DATE),
                          CAST(l.l_shipdate AS DATE))), 6) AS avg_ship_days,
       count(CASE WHEN date_trunc('month', o.o_orderdate)
                     = date_trunc('month', l.l_shipdate)
                  THEN 1 END) AS same_month,
       max(day(last_day(CAST(o.o_orderdate AS DATE)))) AS max_month_len,
       min(weekofyear(CAST(o.o_orderdate AS DATE))) AS min_week
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""",
    doc="Datetime coverage: quarter / dayofweek (Spark is 1=Sunday, DuckDB "
    "0=Sunday — oracle shifts) / datediff / date_trunc month equality / "
    "last_day / weekofyear (both ISO), grouped so the result is a small "
    "deterministic grid.",
)
def datetime_functions_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    return j.groupBy(
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow_spark"),
    ).agg(
        F.count("*").alias("cnt"),
        F.round(
            F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 6
        ).alias("avg_ship_days"),
        F.count(
            F.when(
                F.date_trunc("month", F.col("o_orderdate"))
                == F.date_trunc("month", F.col("l_shipdate")),
                1,
            )
        ).alias("same_month"),
        F.max(F.dayofmonth(F.last_day("o_orderdate"))).alias("max_month_len"),
        F.min(F.weekofyear("o_orderdate")).alias("min_week"),
    )


# ---------------------------------------------------------------------------
# Calendar densification: orders open per month via sequence() + explode()
# ---------------------------------------------------------------------------
@register(
    "calendar_densify_open_orders",
    oracle="""
WITH span AS (
  SELECT o.o_orderkey,
         date_trunc('month', o.o_orderdate) AS m0,
         date_trunc('month', max(l.l_shipdate)) AS m1,
         round(sum(l.l_extendedprice), 2) AS order_value
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate)
SELECT month_start, count(*) AS open_orders,
       round(sum(order_value), 2) AS open_value
FROM span,
     unnest(generate_series(m0, greatest(m0, m1), INTERVAL 1 MONTH))
       AS t(month_start)
GROUP BY month_start
""",
    doc="Interval densification — the generator-function pattern for "
    "time-series gap filling: each order is exploded into the months it "
    "stays open (order month .. last ship month, clamped so early-ship "
    "rows still cover the order month) with sequence(), then rolled up "
    "per month.  Explosion factor is bounded by the max open-interval "
    "length, not data size, so the shape holds at 100 TB.",
)
def calendar_densify_open_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    span = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.max("l_shipdate").alias("last_ship"),
            F.round(F.sum("l_extendedprice"), 2).alias("order_value"),
        )
        .select(
            F.date_trunc("month", "o_orderdate").alias("m0"),
            F.date_trunc("month", "last_ship").alias("m1"),
            "order_value",
        )
    )
    months = span.select(
        F.explode(
            F.sequence(
                F.col("m0"),
                F.greatest("m0", "m1"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_start"),
        "order_value",
    )
    return months.groupBy("month_start").agg(
        F.count("*").alias("open_orders"),
        F.round(F.sum("order_value"), 2).alias("open_value"),
    )


# ---------------------------------------------------------------------------
# MapType construction / extraction / higher-order map functions
# ---------------------------------------------------------------------------
@register(
    "map_functions_events",
    oracle="""
SELECT event_type,
       count(*) AS cnt,
       round(sum(value), 4) AS sum_v,
       round(sum(value * value), 4) AS sum_v2,
       CAST(sum(CASE WHEN value > 0.5 THEN 2 ELSE 1 END) AS BIGINT) AS n_entries_kept
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
""",
    doc="MapType coverage: per row build map('v'->value, 'v2'->value^2) "
    "with map_from_arrays, read back through element_at, and count "
    "entries surviving map_filter(v > 0.5 keeps both, else drops 'v2') "
    "via size() — the oracle states the same values scalar-wise, "
    "verifying the map construction/extraction round-trip.",
)
def map_functions_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    m = F.map_from_arrays(
        F.array(F.lit("v"), F.lit("v2")),
        F.array(F.col("value"), F.col("value") * F.col("value")),
    )
    withm = ev.select("event_type", m.alias("m"))
    kept = F.size(
        F.map_filter(
            F.col("m"), lambda k, v: (k == "v") | (F.element_at(F.col("m"), "v") > 0.5)
        )
    )
    return withm.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(F.element_at("m", F.lit("v"))), 4).alias("sum_v"),
        F.round(F.sum(F.element_at("m", F.lit("v2"))), 4).alias("sum_v2"),
        F.sum(kept).alias("n_entries_kept"),
    )


# ---------------------------------------------------------------------------
# Changelog compaction: latest-wins snapshot per key via max_by (no window)
# ---------------------------------------------------------------------------
@register(
    "changelog_upsert_latest_wins",
    oracle="""
SELECT user_id, event_type AS last_type, round(value, 6) AS last_value,
       ts AS last_ts, n_updates
FROM (
  SELECT user_id, event_type, value, ts,
         count(*) OVER (PARTITION BY user_id) AS n_updates,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
""",
    doc="Changelog -> snapshot compaction (the batch half of CDC upsert): "
    "latest event per user wins, tie-broken by event_id.  Implemented "
    "with max_by over a (ts, event_id) struct — a plain hash aggregate "
    "with partial/final phases, no per-key sort and no window shuffle of "
    "the full changelog; the oracle is the row_number formulation.",
)
def changelog_upsert_latest_wins(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", ordk).alias("last_type"),
        F.round(F.max_by("value", ordk), 6).alias("last_value"),
        F.max_by("ts", ordk).alias("last_ts"),
        F.count("*").alias("n_updates"),
    )


# ---------------------------------------------------------------------------
# HLL distinct-count sketches: build per group, estimate, and union-merge
# ---------------------------------------------------------------------------
@register(
    "hll_distinct_users_by_type",
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
       TRUE AS within_bound
FROM events GROUP BY event_type
UNION ALL
SELECT '__all__' AS event_type, count(DISTINCT user_id) AS exact_distinct,
       TRUE AS within_bound
FROM events
""",
    doc="Native Datasketches HLL as the distinct-count member of the "
    "sketch family (crick's contract: single-pass, bounded state, "
    "mergeable — SURVEY §2.5 'Distinct / approx distinct').  Per "
    "event_type sketch -> estimate, plus hll_union_agg proving the "
    "merge path: the union of per-type sketches estimates total "
    "distinct users.  Hash-matched boolean oracle: lgK=14 standard "
    "error is 0.81%, so |est−exact| ≤ max(2, 3%·exact) (≈3.7σ) holds "
    "deterministically in practice; the exact counts ride along and "
    "hash-match DuckDB directly.",
)
def hll_distinct_users_by_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    tol = lambda exact: F.greatest(F.lit(2.0), F.lit(0.03) * exact)  # noqa: E731
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    per = per_type.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
            <= tol(F.col("exact_distinct"))
        ).alias("within_bound"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total")
    )
    exact_total = ev.agg(F.count_distinct("user_id").alias("exact_distinct"))
    total = exact_total.crossJoin(F.broadcast(merged)).select(
        F.lit("__all__").alias("event_type"),
        "exact_distinct",
        (
            F.abs(F.col("est_total") - F.col("exact_distinct"))
            <= tol(F.col("exact_distinct"))
        ).alias("within_bound"),
    )
    return per.unionByName(total)


# ---------------------------------------------------------------------------
# Sorted file layout: range-partition + sort so min/max stats skip row groups
# ---------------------------------------------------------------------------
@register(
    "sorted_layout_minmax_scan",
    oracle="""
SELECT event_type, count(*) AS cnt,
       round(sum(value), 4) AS sum_value
FROM events
WHERE value >= 40.0 AND value < 60.0
GROUP BY event_type
""",
    doc="The third layout lever after directory partitioning and "
    "bucketing: repartitionByRange + sortWithinPartitions on the filter "
    "column before writing gives each parquet file/row-group a disjoint "
    "min/max value range, so the pushed range predicate skips most of "
    "the data at the footer level — the 100 TB version of an index.  "
    "Result hash-matches the unsorted source (layout never changes "
    "semantics).",
)
def sorted_layout_minmax_scan(spark, sf_dir):

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    path = run_tmpdir("crick_sorted_") + "/events_by_value"
    (
        ev.repartitionByRange(8, "value")
        .sortWithinPartitions("value")
        .write.mode("overwrite")
        .parquet(path)
    )
    scan = spark.read.parquet(path).where(
        (F.col("value") >= 40.0) & (F.col("value") < 60.0)
    )
    return scan.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Parquet bloom-filter layout: point-lookup row-group skipping where min/max
# statistics cannot prune (the Delta/Iceberg bloom-index role)
# ---------------------------------------------------------------------------
@register(
    "bloom_filter_layout_scan",
    oracle="""
SELECT count(*) AS n_rows, round(sum(o_totalprice), 4) AS total_price
FROM orders WHERE o_orderkey IN (1, 700, 1400)
""",
    doc="The FOURTH layout lever (r10), for the case the other three "
    "can't cover: point lookups on a high-cardinality column in a "
    "RANDOMLY laid-out table — every row group's min/max spans the "
    "whole key domain, so footer statistics prune nothing.  Writing "
    "with parquet bloom filters (parquet.bloom.filter.enabled + "
    "expected ndv) gives each row group a membership sketch the "
    "reader probes before decoding: MEASURED on this shape, the "
    "pushed IN-predicate scan emits 16,383 rows with blooms vs "
    "49,149 without (sf0.1 orders, 10 row groups; pytest pins "
    "bloom < plain).  This is the engine's own Bloom sketch family "
    "applied at the STORAGE layer — the Delta/Iceberg bloom-index "
    "role, and the 100 TB answer for needle-in-haystack lookups on "
    "non-clustered keys.  Result hash-matches the unfiltered source "
    "(layout never changes semantics).",
)
def bloom_filter_layout_scan(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    path = run_tmpdir("crick_bloomlayout_") + "/orders_bloom"
    # worst case for min/max: random order (hash of the key), small row
    # groups so a single file holds many; blooms sized to the per-group
    # distinct count
    (
        o.orderBy(F.xxhash64("o_orderkey"))
        .repartition(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 256 * 1024)
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", "20000")
        .parquet(path)
    )
    scan = spark.read.parquet(path).where(
        F.col("o_orderkey").isin(1, 700, 1400)
    )
    return scan.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4 table function) — the row-to-rows extension point
# ---------------------------------------------------------------------------
@register(
    "udtf_sentence_split",
    oracle="""
SELECT doc_id, CAST(idx - 1 AS INT) AS sent_idx,
       CAST(len(string_split_regex(trim(sent), '\\s+')) AS INT) AS n_tokens
FROM (
  SELECT doc_id, unnest(string_split_regex(text, '[.!?]+')) AS sent,
         generate_subscripts(string_split_regex(text, '[.!?]+'), 1) AS idx
  FROM documents)
WHERE trim(sent) <> ''
""",
    doc="Python UDTF surface (SURVEY §2.5 'UDF/UDAF/UDTF'): a @udtf class "
    "lateral-joined against documents, splitting text into sentences and "
    "yielding (sent_idx, n_tokens) rows.  This is the row-at-a-time "
    "extension point — fine for genuinely imperative row→rows logic; the "
    "codegen path for the same family of jobs is chunk_documents "
    "(sequence+explode).  Deterministic, full oracle.",
)
def udtf_sentence_split(spark, sf_dir):
    import re as _re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    @udtf(
        returnType=StructType(
            [
                StructField("doc_id", LongType()),
                StructField("sent_idx", IntegerType()),
                StructField("n_tokens", IntegerType()),
            ]
        )
    )
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            for i, sent in enumerate(_re.split(r"[.!?]+", text or "")):
                if sent.strip():
                    yield doc_id, i, len(sent.strip().split())

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spark.udtf.register("sentence_split", SentenceSplit)
    d.createOrReplaceTempView("__docs_for_udtf__")
    return spark.sql(
        "SELECT s.doc_id, s.sent_idx, s.n_tokens "
        "FROM __docs_for_udtf__ d, "
        "LATERAL sentence_split(d.doc_id, d.text) s"
    )


# ---------------------------------------------------------------------------
# SQL-text interface: ONE SQL string runs verbatim on Spark and DuckDB
# ---------------------------------------------------------------------------
_PORTABLE_SQL = """
SELECT r_name, o_year, n_orders, revenue, rk
FROM (
  SELECT r.r_name,
         extract(year FROM o.o_orderdate) AS o_year,
         count(*) AS n_orders,
         round(sum(o.o_totalprice), 2) AS revenue,
         rank() OVER (PARTITION BY extract(year FROM o.o_orderdate)
                      ORDER BY round(sum(o.o_totalprice), 2) DESC) AS rk
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, extract(year FROM o.o_orderdate)
)
WHERE rk <= 2
"""


@register(
    "sql_text_interface",
    oracle=_PORTABLE_SQL,
    doc="The spark.sql() text interface: the SAME SQL string (ANSI subset "
    "— joins, grouped agg, window rank, extract) is executed by Spark "
    "over registered temp views AND by DuckDB as the oracle, verbatim.  "
    "API parity statement: a reference user's SQL moves unchanged.",
)
def sql_text_interface(spark, sf_dir):
    for t in ("orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_PORTABLE_SQL)


# ---------------------------------------------------------------------------
# Exact weighted percentile (exact twin of tdigest_weighted_quantiles)
# ---------------------------------------------------------------------------
@register(
    "weighted_percentile_exact",
    oracle="""
WITH cum AS (
  SELECT l_returnflag, l_extendedprice, 
         sum(l_quantity) OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice, l_orderkey, l_linenumber
                               ROWS UNBOUNDED PRECEDING) AS cw,
         sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem)
SELECT l_returnflag,
       round(min(CASE WHEN cw >= 0.5 * tw THEN l_extendedprice END), 6)
         AS w_median,
       round(min(CASE WHEN cw >= 0.9 * tw THEN l_extendedprice END), 6)
         AS w_p90
FROM cum GROUP BY l_returnflag
""",
    doc="Exact weighted percentile per group (lower weighted-quantile "
    "convention: smallest value whose cumulative weight reaches q·W) — "
    "the exact twin the tdigest_weighted_quantiles sketch approximates.  "
    "One window sort per group ordered by (value, unique keys) so the "
    "cumulative weight is deterministic; identical formulation runs as "
    "the oracle.",
)
def weighted_percentile_exact(spark, sf_dir):
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("l_returnflag")
    cum = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w).alias("cw"),
        F.sum("l_quantity").over(wt).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.round(
            F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("l_extendedprice"))),
            6,
        ).alias("w_median"),
        F.round(
            F.min(F.when(F.col("cw") >= 0.9 * F.col("tw"), F.col("l_extendedprice"))),
            6,
        ).alias("w_p90"),
    )


# ---------------------------------------------------------------------------
# ANSI-safe arithmetic: try_divide / try_cast / null-on-error semantics
# ---------------------------------------------------------------------------
@register(
    "try_arithmetic_events",
    oracle="""
SELECT event_type,
       count(*) AS cnt,
       CAST(sum(CASE WHEN value = 0 OR value IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS n_unsafe_div,
       round(sum(CASE WHEN value IS NOT NULL AND value <> 0
                      THEN 100.0 / value END), 4) AS sum_inv,
       CAST(sum(CASE WHEN try_cast(json_extract_string(props, '$.n') AS BIGINT)
                     IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric_prop
FROM events
GROUP BY event_type
""",
    doc="ANSI-mode-safe arithmetic: try_divide yields NULL instead of "
    "raising on divide-by-zero, try_cast NULL instead of failing on "
    "non-numeric JSON payload fields — the error-tolerant path a "
    "pipeline needs when ANSI mode (Spark 4 default) is on.  The oracle "
    "states the same semantics with explicit CASE guards.",
)
def try_arithmetic_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    inv = F.try_divide(F.lit(100.0), F.col("value"))
    nprop = F.get_json_object("props", "$.n").try_cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(
            F.when(F.col("value").isNull() | (F.col("value") == 0), 1).otherwise(0)
        ).alias("n_unsafe_div"),
        F.round(F.sum(inv), 4).alias("sum_inv"),
        F.sum(F.when(nprop.isNotNull(), 1).otherwise(0)).alias("n_numeric_prop"),
    )


# ---------------------------------------------------------------------------
# Deterministic mode (most frequent value, smallest-value tie-break)
# ---------------------------------------------------------------------------
@register(
    "mode_quantity_by_returnflag",
    oracle="""
SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_cnt
FROM (
  SELECT l_returnflag, l_quantity, count(*) AS cnt,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, l_quantity ASC) AS rn
  FROM lineitem GROUP BY l_returnflag, l_quantity)
WHERE rn = 1
""",
    doc="Deterministic mode: built-in mode() breaks frequency ties "
    "arbitrarily, so this uses count-per-value + max_by over a "
    "(count, -value) struct — two hash aggregates, no window over the "
    "fact table, ties resolve to the smallest value on both engines.",
)
def mode_quantity_by_returnflag(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
    ordk = F.struct(F.col("cnt"), (-F.col("l_quantity")).alias("neg_q"))
    return counts.groupBy("l_returnflag").agg(
        F.max_by("l_quantity", ordk).alias("mode_qty"),
        F.max("cnt").alias("mode_cnt"),
    )


@register(
    "hll_setops_users",
    oracle="""
SELECT count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
         AS exact_click,
       count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
         AS exact_purchase,
       count(DISTINCT CASE WHEN event_type IN ('click', 'purchase')
                           THEN user_id END) AS exact_union,
       TRUE AS ok_click, TRUE AS ok_purchase, TRUE AS ok_union,
       TRUE AS ok_intersection
FROM events
""",
    doc="Distinct-set algebra on HLL sketches: one conditional-aggregate "
    "scan builds per-cohort user sketches (click vs purchase), union via "
    "hll_union, intersection by inclusion-exclusion |A|+|B|-|A∪B| — the "
    "sketch-typed analog of set ops, O(sketch size) state, single-row "
    "exchange only.  Hash-matched boolean oracle: each estimate within "
    "max(2, 3%) of the exact cohort count computed in the SAME scan; the "
    "inclusion-exclusion intersection compounds three estimates, so its "
    "bound is 5% of the union size.",
)
def hll_setops_users(spark, sf_dir):
    from crick_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a_user = F.when(F.col("event_type") == "click", F.col("user_id"))
    b_user = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    ab_user = F.when(
        F.col("event_type").isin("click", "purchase"), F.col("user_id")
    )
    sk = ev.agg(
        F.hll_sketch_agg(a_user, F.lit(14)).alias("sk_a"),
        F.hll_sketch_agg(b_user, F.lit(14)).alias("sk_b"),
        F.count_distinct(a_user).alias("exact_click"),
        F.count_distinct(b_user).alias("exact_purchase"),
        F.count_distinct(ab_user).alias("exact_union"),
    )
    est = sk.select(
        "exact_click",
        "exact_purchase",
        "exact_union",
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")).alias("est_u"),
    ).withColumn(
        "est_i", F.col("est_a") + F.col("est_b") - F.col("est_u")
    )
    tol = lambda exact: F.greatest(F.lit(2.0), F.lit(0.03) * exact)  # noqa: E731
    exact_i = F.col("exact_click") + F.col("exact_purchase") - F.col("exact_union")
    return est.select(
        "exact_click",
        "exact_purchase",
        "exact_union",
        (F.abs(F.col("est_a") - F.col("exact_click")) <= tol(F.col("exact_click"))).alias("ok_click"),
        (F.abs(F.col("est_b") - F.col("exact_purchase")) <= tol(F.col("exact_purchase"))).alias("ok_purchase"),
        (F.abs(F.col("est_u") - F.col("exact_union")) <= tol(F.col("exact_union"))).alias("ok_union"),
        (
            F.abs(F.col("est_i") - exact_i)
            <= F.greatest(F.lit(3.0), F.lit(0.05) * F.col("exact_union"))
        ).alias("ok_intersection"),
    )


@register(
    "interpolate_hourly_gaps",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         round(avg(value) + 1e-9, 6) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
), spine AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds
), filled AS (
  SELECT s.event_type, s.h, hr.v,
    last_value(hr.v IGNORE NULLS) OVER w_prev AS pv,
    last_value(CASE WHEN hr.v IS NOT NULL THEN s.h END IGNORE NULLS)
      OVER w_prev AS pt,
    first_value(hr.v IGNORE NULLS) OVER w_next AS nv,
    first_value(CASE WHEN hr.v IS NOT NULL THEN s.h END IGNORE NULLS)
      OVER w_next AS nt
  FROM spine s LEFT JOIN hourly hr USING (event_type, h)
  WINDOW
    w_prev AS (PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY s.event_type ORDER BY s.h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, h AS bucket_ts,
       round(coalesce(v, pv + (nv - pv)
                           * ((epoch(h) - epoch(pt))
                              / (epoch(nt) - epoch(pt)))) + 1e-9, 6)
         AS value,
       (v IS NULL) AS was_gap
FROM filled
""",
    doc="Time-series regularization: hourly resample of events.value per "
    "event_type, grid densified between each series' first and last "
    "populated hour, interior gaps linearly interpolated between "
    "nearest populated neighbors — full-value oracle incl. the was_gap "
    "flag.  One shuffle on the series key; the spine is grid-resolution "
    "x series-count (independent of event count); neighbor search is "
    "4 IGNORE-NULLS window functions over one sort, no self-joins.",
)
def interpolate_hourly_gaps(spark, sf_dir):
    from crick_spark.operators.timeseries import resample_interpolate

    ev = load_table(spark, sf_dir, "events")
    # value_round=6: snap bucket averages to the oracle-agreed grid
    # BEFORE interpolating, so summation-order noise in avg() can't
    # push an interpolated value across the output rounding boundary
    # (r13, found by the sf0.1 sweep — the oracle's op order is also
    # aligned to prev + (next-prev)*(da/db))
    out = resample_interpolate(
        ev, "event_type", "ts", "value", step="hour", value_round=6
    )
    return out.select(
        "event_type",
        "bucket_ts",
        F.round(F.col("value") + F.lit(1e-9), 6).alias("value"),
        "was_gap",
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice,
       t.rk
FROM customer c,
     LATERAL (
       SELECT o.o_orderkey, o.o_totalprice,
              row_number() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey)
                AS rk
       FROM orders o
       WHERE o.o_custkey = c.c_custkey
       ORDER BY o.o_totalprice DESC, o.o_orderkey
       LIMIT 2
     ) t
WHERE c.c_custkey % 50 = 0
"""


@register(
    "lateral_topk_orders_per_customer",
    oracle=_LATERAL_SQL,
    doc="Correlated LATERAL subquery (Spark 4 SQL surface): per customer, "
    "the top-2 orders by value via a LATERAL ORDER BY … LIMIT — the "
    "per-row-subquery idiom users port from Postgres/DuckDB; Catalyst "
    "decorrelates it to a ranked window under the hood.  The SAME SQL "
    "string runs verbatim on both engines (sql_text_interface pattern); "
    "deterministic (o_totalprice, o_orderkey) tie-break.",
)
def lateral_topk_orders_per_customer(spark, sf_dir):
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


_REACH_SQL = """
WITH RECURSIVE
edges AS (
  SELECT DISTINCT 'c:' || CAST(o.o_custkey AS STRING) AS src,
         's:' || CAST(l.l_suppkey AS STRING) AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
bi_edges AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
),
reach(node, depth) AS (
  SELECT 'c:' || CAST(c_custkey AS STRING), 0
  FROM customer WHERE c_custkey IN (1, 2, 3)
  UNION ALL
  SELECT DISTINCT e.dst, r.depth + 1
  FROM reach r JOIN bi_edges e ON r.node = e.src
  WHERE r.depth < 2
)
SELECT node, CAST(min(depth) AS BIGINT) AS hops
FROM reach GROUP BY node
"""


@register(
    "recursive_cte_reachability",
    oracle=_REACH_SQL,
    doc="WITH RECURSIVE (Spark 4 SQL surface): bounded-depth BFS over "
    "the bipartite customer↔supplier purchase graph — 'blast radius' "
    "reachability from a 3-customer seed set in ≤2 hops, min-hop per "
    "node via the final rollup (UNION ALL recursion + aggregate dedup; "
    "Spark does not yet support UNION-distinct recursion, so the "
    "termination bound is the explicit depth guard).  The SAME SQL "
    "string runs verbatim on both engines.  At 100 TB each recursion "
    "step is one equi-join of the frontier against the edge list — "
    "identical cost shape to the label-propagation components loop in "
    "pipeline/dedup.py, with the frontier bounded by the seed set's "
    "neighborhood, not the graph.  The recursive member is SELECT "
    "DISTINCT (r9): the frontier⨝edges output is PATH-multiplicity "
    "rows, and without the per-step dedup each step feeds paths — not "
    "nodes — into the next join, the measured 3.3× scale tail; with "
    "it every step's materialized rows are bounded by the frontier "
    "node set (the connected_components contraction discipline).",
)
def recursive_cte_reachability(spark, sf_dir):
    for t in ("orders", "lineitem", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_REACH_SQL)


# ---------------------------------------------------------------------------
# observe(): single-pass audit metrics (CollectMetrics)
# ---------------------------------------------------------------------------
@register(
    "observed_ingest_metrics",
    oracle="""
SELECT count(*) AS n_scanned,
       CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_short,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
""",
    doc="Single-pass ingest audit via observe()/CollectMetrics (r11): a "
    "quality filter keeps long documents, and the pre-filter audit "
    "counters (rows scanned, short-doc rejects, total chars) ride the "
    "SAME job as accumulator-style metrics - no second scan, the "
    "pattern a 100 TB ingest uses to account for every dropped row "
    "without paying for the accounting.  CollectMetrics is a pushdown "
    "barrier, so the filter cannot reach the scan and silently shrink "
    "the audited row set; the oracle recomputes all four counters in "
    "SQL, so if Spark ever started pushing the filter below the "
    "observation point the n_scanned/n_short mismatch would surface "
    "here.  n_kept is asserted both ways: the observed metric must "
    "equal the actual survivor count from the same single action.",
)
def observed_ingest_metrics(spark, sf_dir):
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("ingest_audit")
    audited = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_scanned"),
        F.sum((F.col("n_chars") < 200).cast("long")).alias("n_short"),
        F.sum("n_chars").alias("total_chars"),
    )
    kept = audited.where(F.col("n_chars") >= 200)
    n_kept = kept.count()  # the ONE action; metrics observed on its scan
    m = obs.get
    if m["n_scanned"] - m["n_short"] != n_kept:
        raise AssertionError(
            f"observed audit disagrees with survivor count: "
            f"{m} vs n_kept={n_kept}"
        )
    return spark.createDataFrame(
        [
            (
                int(m["n_scanned"]),
                int(n_kept),
                int(m["n_short"]),
                int(m["total_chars"]),
            )
        ],
        "n_scanned long, n_kept long, n_short long, total_chars long",
    )
