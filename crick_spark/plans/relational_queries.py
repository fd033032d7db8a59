"""Temporal joins, pivots, bivariate stats, and training-split queries.

Beyond-reference relational surface (crick has no relational layer,
SURVEY §2.5): as-of / range joins over the event stream, PIVOT, exact
corr/covar/regression aggregates, percentile winsorization, deterministic
md5 train/val/test splits, and per-language term ranking.  All pure
DataFrame plans, all DuckDB-oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crick_spark.operators.relational import asof_join, range_join
from crick_spark.pipeline.sampling import domain_mix_summary
from crick_spark.plans.registry import register
from crick_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# As-of join: each event -> latest order of that customer at event time
# ---------------------------------------------------------------------------
@register(
    "asof_join_events_orders",
    oracle="""
WITH ranked AS (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id,
       o_orderkey AS asof_o_orderkey,
       round(o_totalprice, 2) AS asof_o_totalprice
FROM ranked WHERE rn = 1
""",
    doc="Backward as-of join (union-merge, one shuffle, no pair "
    "explosion): every event picks the customer's latest order at or "
    "before the event timestamp; ties on order date break to the max "
    "order key.  The oracle is the quadratic row_number formulation the "
    "operator avoids.",
)
def asof_join_events_orders(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    joined = asof_join(
        ev,
        od,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.where(F.col("asof_o_orderkey").isNotNull()).select(
        "event_id",
        "user_id",
        "asof_o_orderkey",
        F.round("asof_o_totalprice", 2).alias("asof_o_totalprice"),
    )


# ---------------------------------------------------------------------------
# Range join: per-user event pairs within a 60-second forward window
# ---------------------------------------------------------------------------
@register(
    "range_join_event_pairs",
    oracle="""
SELECT a.user_id,
       count(*) AS n_pairs,
       round(avg(b.value - a.value), 6) AS avg_dv
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND epoch_us(b.ts) >  epoch_us(a.ts)
 AND epoch_us(b.ts) <= epoch_us(a.ts) + 60000000
GROUP BY a.user_id
""",
    doc="Interval self-join via time bucketing (equi-join on (user, "
    "bucket) + residual range filter — never the per-user quadratic "
    "theta-join): ordered event pairs within 60s per user, with the "
    "pair count and mean value delta.",
)
def range_join_event_pairs(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    pairs = range_join(
        ev,
        ev,
        on="user_id",
        left_time="ts",
        right_time="ts",
        lower_us=0,
        upper_us=60_000_000,
        left_cols=["value"],
        right_cols=["value"],
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(F.col("r_value") - F.col("l_value")), 6).alias("avg_dv"),
    )


# ---------------------------------------------------------------------------
# Pivot: revenue matrix status x priority
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = {
    "1-URGENT": "rev_urgent",
    "2-HIGH": "rev_high",
    "3-MEDIUM": "rev_medium",
    "4-NOT SPECIFIED": "rev_notspec",
    "5-LOW": "rev_low",
}


@register(
    "pivot_revenue_status_priority",
    oracle="""
SELECT o_orderstatus,
       round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS rev_urgent,
       round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS rev_high,
       round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS rev_medium,
       round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS rev_notspec,
       round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS rev_low
FROM orders
GROUP BY o_orderstatus
""",
    doc="groupBy().pivot() with an explicit value list (no extra "
    "distinct-values job, single hash aggregate); oracle is the "
    "conditional-aggregation expansion.",
)
def pivot_revenue_status_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_orderstatus",
        *[F.col(f"`{p}`").alias(_PRIO_ALIAS[p]) for p in _PRIORITIES],
    )


# ---------------------------------------------------------------------------
# Bivariate statistics: corr / covar / simple regression
# ---------------------------------------------------------------------------
@register(
    "corr_covar_lineitem",
    oracle="""
SELECT l_returnflag,
       count(*) AS cnt,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_qty_price,
       round(covar_pop(l_extendedprice, l_quantity), 2) AS covar_pop_qp,
       round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_samp_qp,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_on_qty,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept_price_on_qty
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact one-pass bivariate moments (corr, covariance population/"
    "sample, OLS slope+intercept) per group — the 2-D extension of the "
    "SummaryStats moment family, all built-in partial aggregates.",
)
def corr_covar_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.round(F.corr(y, x), 6).alias("corr_qty_price"),
        F.round(F.covar_pop(y, x), 2).alias("covar_pop_qp"),
        F.round(F.covar_samp(y, x), 2).alias("covar_samp_qp"),
        F.round(F.regr_slope(y, x), 4).alias("slope_price_on_qty"),
        F.round(F.regr_intercept(y, x), 2).alias("icept_price_on_qty"),
    )


# ---------------------------------------------------------------------------
# Winsorization: clip at per-group t-digest percentiles, then re-aggregate
# ---------------------------------------------------------------------------
@register(
    "winsorize_extendedprice",
    oracle="""
SELECT l_returnflag,
       count(*) AS cnt,
       TRUE AS lo_frac_ok,
       TRUE AS hi_frac_ok,
       TRUE AS avg_in_edges,
       TRUE AS std_contracts
FROM lineitem GROUP BY l_returnflag
""",
    doc="Percentile winsorization (outlier clipping for training "
    "pipelines), PRODUCTION default (r9): per-group p01/p99 clip edges "
    "come from the engine's own mergeable t-digest (crick "
    "tdigest.pyx:144-163) — constant aggregation state per partition at "
    "any scale — broadcast back, clip JVM-side, re-aggregate.  The r8 "
    "exact form used F.percentile, whose aggregation buffer holds EVERY "
    "group value in one reducer: fine at test SF, O(N/groups) "
    "single-task state at 100 TB; it is retained as the hash-matched "
    "twin `winsorize_extendedprice_exact` (the "
    "quantile_binning_extendedprice precedent).  Hash-matched via the "
    "boolean-tolerance promotion pattern: exact group counts, plus "
    "per-group booleans that the clip edges cut within the reference's "
    "CDF tolerance (|cdf(edge) − q| ≤ 0.012, "
    "crick/tests/test_tdigest.py:99-102), the winsorized mean lies "
    "inside the edges, and clipping contracts the std (1-Lipschitz "
    "monotone map ⇒ pairwise distances shrink ⇒ variance cannot grow).",
)
def winsorize_extendedprice(spark, sf_dir):
    from crick_spark.functions.quantiles import empirical_cdf_at
    from crick_spark.operators import tdigest_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    edges = tdigest_quantiles(
        li, "l_extendedprice", [0.01, 0.99], by=["l_returnflag"]
    ).select(
        "l_returnflag",
        F.col("p0_01").alias("p01"),
        F.col("p0_99").alias("p99"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99")
    )
    agg = (
        li.join(F.broadcast(edges), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.any_value("p01").alias("p01"),
            F.any_value("p99").alias("p99"),
            empirical_cdf_at(
                F.col("l_extendedprice"), F.col("p01")
            ).alias("lo_frac"),
            empirical_cdf_at(
                F.col("l_extendedprice"), F.col("p99")
            ).alias("hi_frac"),
            F.avg(clipped).alias("avg_w"),
            F.stddev_samp(clipped).alias("std_w"),
            F.stddev_samp("l_extendedprice").alias("std_raw"),
        )
    )
    return agg.select(
        "l_returnflag",
        "cnt",
        (F.abs(F.col("lo_frac") - 0.01) <= 0.012).alias("lo_frac_ok"),
        (F.abs(F.col("hi_frac") - 0.99) <= 0.012).alias("hi_frac_ok"),
        (
            (F.col("avg_w") >= F.col("p01")) & (F.col("avg_w") <= F.col("p99"))
        ).alias("avg_in_edges"),
        (F.col("std_w") <= F.col("std_raw") + F.lit(1e-9)).alias(
            "std_contracts"
        ),
    )


@register(
    "winsorize_extendedprice_exact",
    oracle="""
WITH p AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       count(*) AS cnt,
       round(any_value(p.p01), 4) AS p01,
       round(any_value(p.p99), 4) AS p99,
       round(avg(least(greatest(l.l_extendedprice, p.p01), p.p99)), 4) AS avg_winsorized,
       round(stddev_samp(least(greatest(l.l_extendedprice, p.p01), p.p99)), 2) AS std_winsorized
FROM lineitem l JOIN p USING (l_returnflag)
GROUP BY l.l_returnflag
""",
    doc="EXACT accuracy twin of winsorize_extendedprice (full-value "
    "oracle): per-group p01/p99 via F.percentile.  Deliberately the "
    "buffer-every-value shape — its aggregation state is O(group size) "
    "in ONE task, so it pins values at test SF while the t-digest form "
    "above is the registered production default for 100 TB.  Not in "
    "bench (bench times production shapes).",
)
def winsorize_extendedprice_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # ONE array-percentile aggregate: two scalar percentile() calls would
    # each build (and sort) their own full per-group value buffer — the
    # fused form halves pass-1 memory and time
    pct = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.01), F.lit(0.99))
        ).alias("ps")
    ).select(
        "l_returnflag",
        F.col("ps")[0].alias("p01"),
        F.col("ps")[1].alias("p99"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99")
    )
    return (
        li.join(F.broadcast(pct), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.any_value("p01"), 4).alias("p01"),
            F.round(F.any_value("p99"), 4).alias("p99"),
            F.round(F.avg(clipped), 4).alias("avg_winsorized"),
            F.round(F.stddev_samp(clipped), 2).alias("std_winsorized"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic md5 train/val/test split (training-pipeline staple)
# ---------------------------------------------------------------------------
@register(
    "train_val_test_split",
    oracle="""
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY 1
""",
    doc="Deterministic content-stable train/val/test split (75/12.5/12.5) "
    "by the first hex nibble of md5(doc_id) — reproducible across "
    "engines/runs, no RNG state, embarrassingly parallel (pure per-row "
    "expression, zero shuffle before the final rollup).",
)
def train_val_test_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    return docs.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.count_distinct("lang").alias("n_langs"),
    )


# ---------------------------------------------------------------------------
# Deterministic shuffle-shard layout (training-data write ordering)
# ---------------------------------------------------------------------------
@register(
    "shuffle_shard_documents",
    oracle="""
WITH t AS (
  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         md5('order:' || CAST(doc_id AS VARCHAR)) AS h_ord,
         doc_id, n_chars
  FROM documents
)
SELECT shard, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min_by(doc_id, h_ord) AS first_doc,
       max_by(doc_id, h_ord) AS last_doc
FROM t GROUP BY shard
""",
    doc="Deterministic shuffle-shard layout: the reproducible global "
    "shuffle a training pipeline runs before writing shards — shard = "
    "first md5 nibble (16-way), intra-shard order = md5 of a salted key, "
    "so the permutation is content-stable across engines/runs with no RNG "
    "state.  At 100 TB the write form is repartition(n_shards, shard) + "
    "sortWithinPartitions(order_hash) + write (one shuffle, no global "
    "sort); this query form pins the permutation for the oracle via each "
    "shard's first/last document in shuffle order (min_by/max_by on the "
    "order hash — md5 is collision-free on distinct ids, so the order is "
    "total and the check deterministic).",
)
def shuffle_shard_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    shard = F.substring(F.md5(sid), 1, 1)
    h_ord = F.md5(F.concat(F.lit("order:"), sid))
    return docs.groupBy(shard.alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min_by("doc_id", h_ord).alias("first_doc"),
        F.max_by("doc_id", h_ord).alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Top terms per language (explode -> count -> window rank)
# ---------------------------------------------------------------------------
@register(
    "top_terms_per_lang",
    oracle="""
WITH words AS (
  SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents
),
counts AS (SELECT lang, w, count(*) AS cnt FROM words GROUP BY lang, w),
ranked AS (
  SELECT lang, w, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, w ASC) AS rnk
  FROM counts
)
SELECT lang, w AS term, cnt, rnk FROM ranked WHERE rnk <= 5
""",
    doc="Exact top-5 terms per language: explode to (lang, word), "
    "hash-aggregate counts (map-side combine collapses the token "
    "stream), then a per-language window rank over the tiny count "
    "table.  The exact ground truth the Space-Saving sketch "
    "approximates at stream scale.",
)
def top_terms_per_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .groupBy("lang", "w")
        .agg(F.count("*").alias("cnt"))
    )
    win = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("w"))
    return (
        counts.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 5)
        .select("lang", F.col("w").alias("term"), "cnt", "rnk")
    )


# ---------------------------------------------------------------------------
# Event inter-arrival time statistics (lag + percentile over gaps)
# ---------------------------------------------------------------------------
@register(
    "inter_arrival_stats",
    oracle="""
WITH d AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       count(gap_us) AS n_gaps,
       round(avg(gap_us) / 1e6, 6) AS avg_gap_s,
       round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS median_gap_s,
       round(max(gap_us) / 1e6, 6) AS max_gap_s
FROM d GROUP BY event_type
""",
    doc="Per-user event inter-arrival gaps (lag window over exact integer "
    "microseconds), rolled up per event type with exact median — "
    "telemetry cadence profiling; one shuffle for the window, one for "
    "the rollup.",
)
def inter_arrival_stats(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    win = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "event_type", (us - F.lag(us).over(win)).alias("gap_us")
    )
    return d.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(F.avg("gap_us") / 1e6, 6).alias("avg_gap_s"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1e6, 6).alias("median_gap_s"),
        F.round(F.max("gap_us") / 1e6, 6).alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# Stratified deterministic downsampling (rebalance a skewed corpus)
# ---------------------------------------------------------------------------
@register(
    "stratified_sample_documents",
    oracle="""
WITH tagged AS (
  SELECT lang,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
           CASE lang WHEN 'en' THEN '40' WHEN 'fr' THEN '80' ELSE 'zz' END AS keep
  FROM documents
)
SELECT lang, count(*) AS n_total,
       count(*) FILTER (WHERE keep) AS n_kept,
       round(count(*) FILTER (WHERE keep) * 1.0 / count(*), 4) AS kept_ratio
FROM tagged GROUP BY lang
""",
    doc="Stratified deterministic downsampling: per-language keep rates "
    "(en 25%, fr 50%, rest 100%) decided by comparing the first md5 "
    "byte of the doc id against the rate threshold — reproducible "
    "across engines and runs (no RNG), pure per-row expression, the "
    "corpus-rebalancing step of a training pipeline.",
)
def stratified_sample_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    byte0 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thresh = (
        F.when(F.col("lang") == "en", "40")
        .when(F.col("lang") == "fr", "80")
        .otherwise("zz")
    )
    tagged = docs.select("lang", (byte0 < thresh).alias("keep"))
    return tagged.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count_if(F.col("keep")).alias("n_kept"),
        F.round(F.count_if(F.col("keep")) / F.count("*"), 4).alias("kept_ratio"),
    )


# ---------------------------------------------------------------------------
# Domain mixing: resample the corpus to a target per-source distribution
# ---------------------------------------------------------------------------
@register(
    "domain_mix_resample",
    oracle="""
WITH counts AS (
  SELECT source, count(*) AS n_total,
         (20 - CAST(substr(source, 4) AS INT)) / 210.0 AS share
  FROM documents GROUP BY source
),
t AS (SELECT min(n_total / share) AS T FROM counts),
rates AS (
  SELECT source, n_total, least(1.0, t.T * share / n_total) AS keep_rate
  FROM counts, t
),
kept AS (
  SELECT d.source, r.n_total, r.keep_rate, count(*) AS n_kept
  FROM documents d JOIN rates r USING (source)
  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
          / 16777216.0 < r.keep_rate
  GROUP BY d.source, r.n_total, r.keep_rate
)
SELECT source, n_total, n_kept, round(keep_rate, 6) AS keep_rate,
       round(n_kept * 1.0 / sum(n_kept) OVER (), 6) AS realized_share
FROM kept
""",
    doc="Domain mixing: deterministically resample so per-source shares "
    "match a target mix (share of srcK proportional to 20-K).  Keep "
    "rates come from a tiny counts aggregate (downsample-only feasible "
    "total = min n_s/share_s) broadcast back onto the corpus; the md5 "
    "coin makes the sample reproducible with zero corpus shuffle.",
)
def domain_mix_resample_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    share = (
        F.lit(20) - F.substring(F.col("source"), 4, 10).cast("int")
    ) / F.lit(210.0)
    return domain_mix_summary(docs, "source", share, "doc_id")


# ---------------------------------------------------------------------------
# Discrete percentile (percentile_disc / quantile_disc parity)
# ---------------------------------------------------------------------------
@register(
    "percentile_disc_quantity",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS p25_disc,
       quantile_disc(l_quantity, 0.50) AS p50_disc,
       quantile_disc(l_quantity, 0.75) AS p75_disc
FROM lineitem GROUP BY l_returnflag
""",
    doc="Discrete percentiles (smallest value at cumulative probability "
    ">= q — actual data values, no interpolation): the percentile_disc "
    "twin of the continuous percentile queries.",
)
def percentile_disc_quantity(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_pd")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_disc,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity) AS p50_disc,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75_disc
        FROM lineitem_pd GROUP BY l_returnflag
        """
    )


# ---------------------------------------------------------------------------
# Moving-frame window aggregate (trailing 3-order average)
# ---------------------------------------------------------------------------
@register(
    "moving_avg_customer_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS trailing3_avg
FROM orders
""",
    doc="Bounded-frame window aggregate: trailing 3-order moving average "
    "per customer (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — the "
    "frame-spec coverage the running-total query doesn't exercise.",
)
def moving_avg_customer_spend(spark, sf_dir):
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    win = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(win), 4).alias("trailing3_avg"),
    )


# ---------------------------------------------------------------------------
# Subquery coverage: scalar subquery, correlated EXISTS, NOT IN
# ---------------------------------------------------------------------------
@register(
    "subqueries_customer_orders",
    oracle="""
SELECT c.c_mktsegment,
       count(*) AS n_big_spenders,
       round(avg(c.c_acctbal), 4) AS avg_acctbal
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)
      )
  AND c.c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        AND o_totalprice < 50000
      )
GROUP BY c.c_mktsegment
""",
    doc="Subquery surface: uncorrelated scalar subquery (global average, "
    "computed once and broadcast), correlated EXISTS (planned as a "
    "left-semi hash join), NOT IN (null-aware anti join) — rolled up "
    "per segment.  Catalyst decorrelates all three; no per-row "
    "re-execution anywhere.",
)
def subqueries_customer_orders(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cust.createOrReplaceTempView("sq_customer")
    orders.createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(*) AS n_big_spenders,
               round(avg(c.c_acctbal), 4) AS avg_acctbal
        FROM sq_customer c
        WHERE EXISTS (
                SELECT 1 FROM sq_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > (SELECT avg(o_totalprice) * 2 FROM sq_orders)
              )
          AND c.c_custkey NOT IN (
                SELECT o_custkey FROM sq_orders WHERE o_orderstatus = 'F'
                AND o_totalprice < 50000
              )
        GROUP BY c.c_mktsegment
        """
    )


# ---------------------------------------------------------------------------
# Array / map function coverage over the embedding column
# ---------------------------------------------------------------------------
@register(
    "array_functions_embeddings",
    oracle="""
SELECT label,
       count(*) AS n,
       round(avg(len(list_filter(embedding, x -> x > 0))), 6) AS avg_n_positive,
       round(avg(list_max(embedding)), 6) AS avg_max_elem,
       round(avg(list_min(embedding)), 6) AS avg_min_elem,
       round(avg(embedding[1] + embedding[-1]), 6) AS avg_first_plus_last
FROM embeddings
GROUP BY label
""",
    doc="Array-function coverage (filter/max/min/indexing incl. negative "
    "index) over the embedding vectors, rolled up per label — element "
    "ops stay per-row (no explode, no shuffle of vectors).",
)
def array_functions_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.size(F.filter(e, lambda x: x > 0))), 6).alias(
            "avg_n_positive"
        ),
        F.round(F.avg(F.array_max(e)), 6).alias("avg_max_elem"),
        F.round(F.avg(F.array_min(e)), 6).alias("avg_min_elem"),
        F.round(
            F.avg(F.element_at(e, 1) + F.element_at(e, -1)), 6
        ).alias("avg_first_plus_last"),
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS + grouping_id
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc="Explicit GROUPING SETS (two one-dim rollups + grand total in a "
    "single pass) with grouping_id to distinguish 'NULL group key' from "
    "'aggregated-away' — one Expand+hash-aggregate, not three scans.",
)
def grouping_sets_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
               count(*) AS cnt,
               round(sum(o_totalprice), 2) AS revenue
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Rank-family window functions
# ---------------------------------------------------------------------------
@register(
    "rank_functions_orders",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       dense_rank()  OVER w AS drk,
       round(percent_rank() OVER w, 6) AS prk,
       round(cume_dist()    OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
    doc="Rank-family window coverage (dense_rank / percent_rank / "
    "cume_dist) with a total tie-break order for determinism.",
)
def rank_functions_orders(spark, sf_dir):
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.dense_rank().over(w).alias("drk"),
        F.round(F.percent_rank().over(w), 6).alias("prk"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# ---------------------------------------------------------------------------
# Null-handling semantics: coalesce / nullif / null-safe equality
# ---------------------------------------------------------------------------
@register(
    "null_semantics_events",
    oracle="""
SELECT event_type,
       count(*) AS cnt,
       count(value) AS n_nonnull,
       count(*) - count(value) AS n_null,
       round(sum(coalesce(value, 0.0)), 4) AS sum_coalesced,
       count(nullif(event_type, 'click')) AS n_not_click,
       count(*) FILTER (WHERE value IS NOT DISTINCT FROM NULL) AS n_nullsafe_null
FROM events
GROUP BY event_type
""",
    doc="NULL-semantics coverage: coalesce, nullif, and null-safe "
    "equality (Spark <=> / SQL IS NOT DISTINCT FROM) — aggregate "
    "null-skipping made explicit.",
)
def null_semantics_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.count("value").alias("n_nonnull"),
        (F.count("*") - F.count("value")).alias("n_null"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 4).alias(
            "sum_coalesced"
        ),
        F.count(F.nullif(F.col("event_type"), F.lit("click"))).alias(
            "n_not_click"
        ),
        F.count_if(F.col("value").eqNullSafe(F.lit(None).cast("double"))).alias(
            "n_nullsafe_null"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic bottom-k (KMV) uniform sample per group
# ---------------------------------------------------------------------------
@register(
    "bottomk_sample_per_source",
    oracle="""
SELECT source, doc_id, lang, hx
FROM (
  SELECT source, doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hx,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 20
""",
    doc="Bottom-k-by-hash (KMV) sampling: a deterministic, MERGEABLE "
    "uniform sample — the k smallest md5(doc_id) per source.  Same "
    "contract as the crick sketches (single pass, bounded state k, merge "
    "= keep k smallest of the union), and the k-th hash value doubles as "
    "a distinct-count estimator (tested).  Spark's WindowGroupLimit "
    "pushes the rank<=k cut to the map side, so only k rows per "
    "partition per group reach the shuffle.",
)
def bottomk_sample_per_source(spark, sf_dir):
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("hx")
    )
    w = Window.partitionBy("source").orderBy("hx", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sample (A-ES bottom-k by u^(1/w))
# ---------------------------------------------------------------------------
@register(
    "weighted_sample_documents",
    oracle="""
SELECT lang, doc_id, n_chars
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY pow(
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0,
             1.0 / n_chars) DESC, doc_id) AS rn
  FROM documents WHERE n_chars > 0)
WHERE rn <= 15
""",
    doc="Weighted sampling without replacement, deterministic: "
    "Efraimidis-Spirakis A-ES keys u^(1/w) with u derived from "
    "md5(doc_id) instead of a PRNG (same trick as the md5 train/val "
    "split), w = n_chars, top-15 keys per language.  Mergeable bounded "
    "state like every sampler here (keep the k largest keys of a "
    "union); WindowGroupLimit keeps the rank cut map-side.",
)
def weighted_sample_documents(spark, sf_dir):
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    key = F.pow(u, 1.0 / F.col("n_chars"))
    w = Window.partitionBy("lang").orderBy(F.desc("aes_key"), F.asc("doc_id"))
    return (
        d.select("lang", "doc_id", "n_chars", key.alias("aes_key"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 15)
        .select("lang", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# One-pass data-quality audit: null fractions, range violations, FK orphans
# ---------------------------------------------------------------------------
@register(
    "dq_audit_orders_lineitem",
    oracle="""
SELECT 'orders' AS tbl,
       count(*) AS n_rows,
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_measure,
       CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_range_violation,
       (SELECT count(*) FROM orders o2
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o2.o_custkey)) AS n_fk_orphans
FROM orders
UNION ALL
SELECT 'lineitem', count(*),
       CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT),
       (SELECT count(*) FROM lineitem l2
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l2.l_orderkey))
FROM lineitem
""",
    doc="Data-quality gate a training pipeline runs before ingest: per "
    "table one scan computes row count, null fraction of the measure, "
    "domain-range violations, and referential orphans (LEFT ANTI join "
    "counted, dimension side broadcast-able).  Everything is a "
    "conditional aggregate — no second scan per check.",
)
def dq_audit_orders_lineitem(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    okeys = o.select("o_orderkey")

    o_orph = o.join(c, o.o_custkey == c.c_custkey, "left_anti").count()
    l_orph = l.join(okeys, l.l_orderkey == okeys.o_orderkey, "left_anti").count()

    o_stats = o.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "n_null_measure"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_range_violation"
        ),
        F.lit(o_orph).cast("long").alias("n_fk_orphans"),
    )
    l_stats = l.agg(
        F.lit("lineitem").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("l_extendedprice").isNull(), 1).otherwise(0)).alias(
            "n_null_measure"
        ),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(
                0
            )
        ).alias("n_range_violation"),
        F.lit(l_orph).cast("long").alias("n_fk_orphans"),
    )
    return o_stats.unionByName(l_stats)


# ---------------------------------------------------------------------------
# Full-outer reconciliation of two independent aggregates
# ---------------------------------------------------------------------------
@register(
    "full_outer_reconciliation",
    oracle="""
SELECT coalesce(o.k, e.k) AS entity_id,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(e.n_events, 0) AS n_events,
       CASE WHEN o.k IS NULL THEN 'events_only'
            WHEN e.k IS NULL THEN 'orders_only'
            ELSE 'both' END AS presence
FROM (SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY 1) o
FULL JOIN (SELECT user_id AS k, count(*) AS n_events
           FROM events GROUP BY 1) e
  ON o.k = e.k
""",
    doc="Reconciliation between two systems (orders ledger vs event "
    "stream): aggregate each side FIRST (the join input is the key set, "
    "not the facts), then FULL OUTER join to classify every entity as "
    "both / orders_only / events_only — the audit shape for pipeline "
    "completeness checks.  Full-outer completes the join-type coverage "
    "(inner/left/semi/anti elsewhere).",
)
def full_outer_reconciliation(spark, sf_dir):
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ok"))
        .agg(F.count("*").alias("n_orders"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("ek"))
        .agg(F.count("*").alias("n_events"))
    )
    j = o.join(e, o.ok == e.ek, "full_outer")
    return j.select(
        F.coalesce("ok", "ek").alias("entity_id"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("ok").isNull(), "events_only")
        .when(F.col("ek").isNull(), "orders_only")
        .otherwise("both")
        .alias("presence"),
    )


# ---------------------------------------------------------------------------
# Ordered funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------
@register(
    "funnel_conversion_users",
    oracle="""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM s1) AS n_viewed,
       (SELECT count(*) FROM s2) AS n_clicked_after_view,
       (SELECT count(*) FROM s3) AS n_purchased_after_click,
       round((SELECT count(*) FROM s3) * 1.0 /
             (SELECT count(*) FROM s1), 6) AS view_to_purchase_rate
""",
    doc="Ordered three-stage funnel (view -> click -> purchase, each stage "
    "strictly at-or-after the previous stage's first completion) — the "
    "classic event-analytics sequence query.  Three stage aggregates, "
    "each a groupBy(user) co-partitioned with the previous stage's join: "
    "every shuffle is on user_id, so at scale AQE reuses one exchange "
    "layout; no window over the full stream, no row explosion.",
)
def funnel_conversion_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        ev.agg(F.count_distinct("user_id").alias("n_users"))
        .crossJoin(F.broadcast(s1.agg(F.count("*").alias("n_viewed"))))
        .crossJoin(F.broadcast(s2.agg(F.count("*").alias("n_clicked_after_view"))))
        .crossJoin(F.broadcast(s3.agg(F.count("*").alias("n_purchased_after_click"))))
        .select(
            "n_users",
            "n_viewed",
            "n_clicked_after_view",
            "n_purchased_after_click",
            F.round(
                F.col("n_purchased_after_click") / F.col("n_viewed"), 6
            ).alias("view_to_purchase_rate"),
        )
    )


# ---------------------------------------------------------------------------
# SCD2-style validity intervals from the event changelog
# ---------------------------------------------------------------------------
@register(
    "scd2_event_type_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island
  FROM events),
islands AS (
  SELECT user_id, event_type, min(ts) AS valid_from, count(*) AS n_events
  FROM ordered GROUP BY user_id, event_type, island)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_type)
         AS valid_to,
       n_events
FROM islands
""",
    doc="SCD2-style dimension history from a changelog: collapse each "
    "user's consecutive same-type events into validity intervals "
    "[valid_from, valid_to) with the gaps-and-islands double-row_number "
    "trick, then one lead() for the closing bound — the standard "
    "slowly-changing-dimension compaction a warehouse maintains from CDC "
    "feeds.  Two window passes + one aggregate, all partitioned by "
    "user_id: one shuffle layout reused end-to-end; no self-join.",
)
def scd2_event_type_intervals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = (
        ev.withColumn(
            "island", F.row_number().over(w_all) - F.row_number().over(w_type)
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.min("ts").alias("valid_from"), F.count("*").alias("n_events"))
    )
    # tiebreak on event_type: two same-user islands can share valid_from
    # (same-ts events of different types) but never (valid_from, type) —
    # without it the lead() assignment is cross-engine nondeterministic
    w_seq = Window.partitionBy("user_id").orderBy("valid_from", "event_type")
    return islands.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_seq).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix (weekly)
# ---------------------------------------------------------------------------
@register(
    "cohort_retention_weekly",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id),
sizes AS (
  SELECT cohort_week, count(*) AS cohort_size FROM firsts GROUP BY cohort_week)
SELECT CAST(a.cohort_week AS TIMESTAMP) AS cohort_week,
       a.week_offset,
       count(*) AS n_active,
       round(count(*) * 1.0 / any_value(s.cohort_size), 6) AS retention
FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
GROUP BY a.cohort_week, a.week_offset
""",
    doc="Weekly cohort retention matrix — the standard growth-analytics "
    "rollup: users are cohorted by the week of their first event, and "
    "each (cohort, week-offset) cell counts distinct users still active, "
    "normalized by cohort size.  Two shuffles on user_id (first-event "
    "aggregate, activity join) then one small matrix aggregate; the "
    "cohort-size side is broadcast.  ISO Monday week truncation matches "
    "DuckDB's date_trunc('week').",
)
def cohort_retention_weekly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        activity.join(F.broadcast(sizes), "cohort_week")
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.count("*").alias("n_active"),
            F.round(F.count("*") / F.any_value("cohort_size"), 6).alias("retention"),
        )
        .select("cohort_week", "week_offset", "n_active", "retention")
    )


# ---------------------------------------------------------------------------
# Fuzzy (approximate string) join — entity resolution over the part
# dictionary
# ---------------------------------------------------------------------------
@register(
    "fuzzy_match_part_names",
    oracle=r"""
WITH n AS (
  SELECT p_name, count(*) AS cnt FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, c.p_name AS name_b,
       levenshtein(a.p_name, c.p_name) AS edit_dist,
       a.cnt AS cnt_a, c.cnt AS cnt_b
FROM n a JOIN n c ON a.p_name < c.p_name
WHERE levenshtein(a.p_name, c.p_name) <= 3
""",
    doc="Fuzzy string match (entity resolution): near-identical part "
    "names at Levenshtein ≤ 3.  The oracle is the pure brute-force "
    "pair semantics (every pair within the bound, no blocking term) — "
    "possible because the default blocking is recall-complete for the "
    "edit bound (q-gram lemma, see default_fuzzy_blocks), so the "
    "blocked equi-join provably returns the same pairs as the O(n²) "
    "scan.  The 100 TB shape is the operator's whole point: fuzzy-join "
    "the DISTINCT name dictionary (64 names here vs 2k parts; the same "
    "ratio holds on real catalogs), explode 3-gram keys, equi-join + "
    "length-band prune + per-pair dedup, then one threshold-bounded "
    "levenshtein per candidate pair — JVM codegen, no UDF, never a "
    "BNLJ theta-join — and map matches back to fact rows by exact key.",
)
def fuzzy_match_part_names(spark, sf_dir):
    from crick_spark.operators.relational import fuzzy_join

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("cnt"))
    left = names.select(
        F.col("p_name").alias("name_a"), F.col("cnt").alias("cnt_a")
    )
    right = names.select(
        F.col("p_name").alias("name_b"), F.col("cnt").alias("cnt_b")
    )
    out = fuzzy_join(
        left, right, "name_a", "name_b", max_dist=3, values_distinct=True
    )
    return out.where(F.col("name_a") < F.col("name_b")).select(
        "name_a",
        "name_b",
        F.col("edit_dist").cast("bigint").alias("edit_dist"),
        "cnt_a",
        "cnt_b",
    )


@register(
    "fuzzy_match_recall",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_injected,
       CAST(count(*) AS BIGINT) AS n_found,
       1.0 AS recall
FROM (SELECT DISTINCT p_name FROM part WHERE length(p_name) >= 8)
""",
    doc="Measured recall of fuzzy_join's DEFAULT blocking on injected "
    "typos, full-value oracle.  Every distinct part name gets a "
    "deterministic 2-edit corruption that deliberately hits the FIRST "
    "token (delete char 1, replace char 6 with '#') — the exact "
    "failure mode of naive first-token blocking, which silently drops "
    "such pairs.  The recall-complete 3-gram scheme "
    "(default_fuzzy_blocks) must recover 100% of them: the oracle "
    "asserts n_found == n_injected and recall == 1.0 — a hash "
    "mismatch, not a soft warning, if the blocking ever loses a pair.",
)
def fuzzy_match_recall(spark, sf_dir):
    from crick_spark.operators.relational import fuzzy_join

    part = load_table(spark, sf_dir, "part")
    names = (
        part.select("p_name").where(F.length("p_name") >= 8).distinct()
    )
    typos = names.select(
        F.col("p_name").alias("orig"),
        F.concat(
            F.substring("p_name", 2, 4),
            F.lit("#"),
            F.expr("substring(p_name, 7)"),
        ).alias("typo"),
    )
    found = fuzzy_join(
        typos.select("typo"),
        names.select("p_name"),
        "typo",
        "p_name",
        max_dist=2,
        values_distinct=True,
    )
    matched = found.select(
        "typo", F.col("p_name").alias("orig"), F.lit(1).alias("__hit")
    ).dropDuplicates(["typo", "orig"])
    hits = typos.join(matched, ["typo", "orig"], "left")
    return hits.agg(
        F.count("*").alias("n_injected"),
        F.count("__hit").alias("n_found"),
        F.round(F.count("__hit") / F.count("*"), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Batch sessionization (gap-based) — the at-rest twin of session_window
# ---------------------------------------------------------------------------
@register(
    "sessionize_user_events",
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
  FROM events
), f AS (
  SELECT user_id, ts, event_id,
         CASE WHEN pts IS NULL OR epoch(ts) - epoch(pts) > 1800.0
              THEN 1 ELSE 0 END AS is_new
  FROM o
), s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - 1 AS session_id
  FROM f
), ps AS (
  SELECT user_id, session_id, count(*) AS n_ev,
         epoch(max(ts)) - epoch(min(ts)) AS dur
  FROM s GROUP BY 1, 2
)
SELECT user_id,
       count(*) AS n_sessions,
       CAST(sum(n_ev) AS BIGINT) AS n_events,
       max(n_ev) AS max_session_events,
       round(avg(dur), 4) AS avg_session_sec
FROM ps GROUP BY user_id
""",
    doc="Gap-based batch sessionization (30-min inactivity breaks) + "
    "per-user session rollup, full-value oracle.  One shuffle on "
    "user_id; lag + running-sum windows share a single (user, ts, id) "
    "sort; fractional-second epoch math (timestamp→double, not "
    "truncating unix_timestamp); event_id tie-break keeps session "
    "assignment engine-deterministic under equal timestamps.",
)
def sessionize_user_events(spark, sf_dir):
    from crick_spark.operators.timeseries import sessionize

    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", 30, tiebreak="event_id")
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_ev"),
        (
            F.max(F.col("ts").cast("double"))
            - F.min(F.col("ts").cast("double"))
        ).alias("dur"),
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("n_ev").alias("max_session_events"),
        F.round(F.avg("dur"), 4).alias("avg_session_sec"),
    )


# ---------------------------------------------------------------------------
# Market-basket analysis: brand co-purchase lift
# ---------------------------------------------------------------------------
@register(
    "copurchase_brand_lift",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), singles AS (
  SELECT p_brand, count(*) AS cnt FROM ob GROUP BY 1
), total AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS pair_cnt
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.pair_cnt,
       round(p.pair_cnt * t.n_orders * 1.0 / (sa.cnt * sb.cnt), 6) AS lift,
       round(p.pair_cnt * 1.0 / t.n_orders, 6) AS support
FROM pairs p
JOIN singles sa ON sa.p_brand = p.brand_a
JOIN singles sb ON sb.p_brand = p.brand_b
CROSS JOIN total t
""",
    doc="Market-basket analysis: brand co-purchase lift/support over "
    "orders, full-value oracle.  100 TB shape: ONE shuffle of "
    "(order, brand) into per-order sorted basket arrays "
    "(collect_set), then pair expansion map-side via nested "
    "transform/slice — fan-out bounded by basket size choose 2, never "
    "|brands|^2 and never an orderkey self-join; pair/single/total "
    "counts all come from ONE second shuffle (marker structs in the "
    "same explode), cached tiny and broadcast back — 2 data shuffles "
    "end to end.",
)
def copurchase_brand_lift(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    baskets = ob.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("p_brand")).alias("brands")
    )
    # map-side pair expansion: for sorted array a, all (a[i], a[j]) i<j;
    # plus one marker struct per single brand (brand_b NULL) and one per
    # basket (both NULL) so singles/pair/total counts come from a SINGLE
    # second shuffle instead of three derivations of `baskets`
    null_s = F.lit(None).cast("string")
    pair_structs = F.flatten(
        F.transform(
            "brands",
            lambda x, i: F.transform(
                F.slice(
                    F.col("brands"),
                    i + F.lit(2),
                    F.greatest(F.size("brands") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(
                    x.alias("brand_a"), y.alias("brand_b")
                ),
            ),
        )
    )
    single_structs = F.transform(
        "brands",
        lambda x: F.struct(x.alias("brand_a"), null_s.alias("brand_b")),
    )
    marker = F.array(
        F.struct(null_s.alias("brand_a"), null_s.alias("brand_b"))
    )
    mixed = (
        baskets.select(
            F.explode(
                F.concat(pair_structs, single_structs, marker)
            ).alias("p")
        )
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count("*").alias("cnt"))
        # materialized deliberately: ~|brands|^2/2 + |brands| + 1 rows
        # (326 at 25 brands) consumed by three branches — Catalyst does
        # not reuse the exchange across them, and recomputing would
        # replay the basket build (the big shuffle) three times.  An
        # eager localCheckpoint (not .cache()) so the blocks are
        # reclaimed by the ContextCleaner when the plan is GC'd — no
        # unpersist obligation leaks to callers in long-lived sessions.
        # The materialized set is bytes-sized; at 100 TB it is still
        # bounded by the brand dictionary, not the fact table
        .localCheckpoint(eager=True)
    )
    pairs = mixed.where(
        F.col("brand_a").isNotNull() & F.col("brand_b").isNotNull()
    ).select("brand_a", "brand_b", F.col("cnt").alias("pair_cnt"))
    singles = mixed.where(
        F.col("brand_a").isNotNull() & F.col("brand_b").isNull()
    ).select(F.col("brand_a").alias("p_brand"), "cnt")
    total = mixed.where(F.col("brand_a").isNull()).select(
        F.col("cnt").alias("n_orders")
    )
    sa = singles.select(
        F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    sb = singles.select(
        F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.round(
                F.col("pair_cnt")
                * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
            F.round(F.col("pair_cnt") / F.col("n_orders"), 6).alias(
                "support"
            ),
        )
    )


@register(
    "copurchase_lift_minsupport",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), singles AS (
  SELECT p_brand, count(*) AS cnt FROM ob GROUP BY 1
), total AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS pair_cnt
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.pair_cnt,
       round(p.pair_cnt * t.n_orders * 1.0 / (sa.cnt * sb.cnt), 6) AS lift,
       round(p.pair_cnt * 1.0 / t.n_orders, 6) AS support
FROM pairs p
JOIN singles sa ON sa.p_brand = p.brand_a
JOIN singles sb ON sb.p_brand = p.brand_b
CROSS JOIN total t
WHERE p.pair_cnt >= 20
""",
    doc="Market-basket lift with MIN-SUPPORT (r10, VERDICT #5): the "
    "classic a-priori step — brands below the support count are pruned "
    "from baskets BEFORE pair expansion, which is results-preserving "
    "for the thresholded output because pair_cnt(a,b) <= min(cnt_a, "
    "cnt_b): any pair meeting the threshold has both brands meeting it, "
    "and dropping infrequent brands cannot change a surviving pair's "
    "count (the oracle computes ALL pairs and filters — value-equal by "
    "that bound; pruning-effectiveness pytest covers the case where "
    "brands actually drop).  100 TB shape: with an UNBOUNDED item "
    "dictionary (SKU-level baskets) the unpruned expansion is the "
    "scale risk copurchase_brand_lift's order-bounded baskets avoid; "
    "here the frequent-item dictionary (support-bounded, <= N/s items) "
    "broadcasts into a semi-join so infrequent long-tail items never "
    "enter a basket array.",
)
def copurchase_lift_minsupport(spark, sf_dir, min_support_cnt: int = 20):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # r14 (guide §2.4): ob feeds FOUR consumers (singles, total, the
    # frequent semi-join probe, and the pruned basket build) — without
    # materialization each consumer re-runs the join+distinct subtree
    # above the shared exchange.  A LAZY localCheckpoint computes it
    # once: 3.3 s → 2.4 s at sf0.1, identical 300 rows.  Size shape at
    # 100 TB: one (orderkey, brand) row per distinct basket item —
    # the same relation the pair expansion materializes anyway.
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=False)
    )
    singles = ob.groupBy("p_brand").agg(F.count("*").alias("cnt"))
    total = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    # a-priori prune: only frequent brands enter the pair expansion —
    # the frequent dictionary is support-bounded (at most N/s items for
    # N baskets), so the broadcast never scales with the corpus
    frequent = singles.where(F.col("cnt") >= int(min_support_cnt)).select(
        "p_brand"
    )
    obf = ob.join(F.broadcast(frequent), "p_brand", "left_semi")
    baskets = obf.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("p_brand")).alias("brands")
    )
    pair_structs = F.flatten(
        F.transform(
            "brands",
            lambda x, i: F.transform(
                F.slice(
                    F.col("brands"),
                    i + F.lit(2),
                    F.greatest(F.size("brands") - i - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias("brand_a"), y.alias("brand_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"),
            F.col("p.brand_b").alias("brand_b"),
        )
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= int(min_support_cnt))
    )
    sa = singles.select(
        F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a")
    )
    sb = singles.select(
        F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "pair_cnt",
            F.round(
                F.col("pair_cnt")
                * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
            F.round(F.col("pair_cnt") / F.col("n_orders"), 6).alias(
                "support"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: median absolute deviation per series
# ---------------------------------------------------------------------------
@register(
    "mad_outliers_events",
    oracle="""
SELECT event_type,
       count(*) AS n,
       TRUE AS med_cdf_ok,
       TRUE AS mad_cdf_ok,
       TRUE AS outlier_frac_bounded
FROM events GROUP BY event_type
""",
    doc="Robust outlier detection (per-series median + MAD, x1.4826 "
    "consistency constant, 3-sigma rule), PRODUCTION default (r9): both "
    "the median and the MAD come from the engine's mergeable t-digest — "
    "constant aggregation state per partition — broadcast back, flagging "
    "is codegen; three linear scans, no quadratic work and no "
    "buffer-every-value reducer.  The r8 exact form (F.percentile per "
    "group, O(group size) state in one task) is retained as the "
    "hash-matched twin `mad_outliers_events_exact`.  Hash-matched via "
    "the boolean-tolerance promotion pattern: exact group counts, the "
    "median and MAD estimates each cut their distribution within the "
    "reference's CDF tolerance (|cdf − 0.5| ≤ 0.012, "
    "crick/tests/test_tdigest.py:99-102), and the flagged fraction obeys "
    "the MAD bound (3·1.4826·mad ≥ mad ⇒ flagged ≤ 0.5 + tol).",
)
def mad_outliers_events(spark, sf_dir):
    from crick_spark.functions.quantiles import empirical_cdf_at
    from crick_spark.functions.stats import nan_to_null
    from crick_spark.operators import tdigest_quantiles

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", nan_to_null(F.col("value")).alias("value")
    )
    med = tdigest_quantiles(ev, "value", [0.5], by=["event_type"]).select(
        "event_type", F.col("p0_5").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = tdigest_quantiles(
        dev.select("event_type", "adev"), "adev", [0.5], by=["event_type"]
    ).select("event_type", F.col("p0_5").alias("mad"))
    agg = (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            empirical_cdf_at(F.col("value"), F.col("med")).alias("med_cdf"),
            empirical_cdf_at(F.col("adev"), F.col("mad")).alias("mad_cdf"),
            F.avg(
                (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("double")
            ).alias("outlier_frac"),
        )
    )
    return agg.select(
        "event_type",
        "n",
        (F.abs(F.col("med_cdf") - 0.5) <= 0.012).alias("med_cdf_ok"),
        (F.abs(F.col("mad_cdf") - 0.5) <= 0.012).alias("mad_cdf_ok"),
        (F.col("outlier_frac") <= F.lit(0.512)).alias(
            "outlier_frac_bounded"
        ),
    )


@register(
    "mad_outliers_events_exact",
    oracle="""
WITH m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), d AS (
  SELECT e.event_type, e.value, m.med
  FROM events e JOIN m USING (event_type)
), md AS (
  SELECT event_type, any_value(med) AS med,
         quantile_cont(abs(value - med), 0.5) AS mad
  FROM d GROUP BY 1
)
SELECT e.event_type,
       count(*) AS n,
       round(any_value(md.med), 6) AS med,
       round(any_value(md.mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(e.value - md.med) > 3 * 1.4826 * md.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN md USING (event_type)
GROUP BY e.event_type
""",
    doc="EXACT accuracy twin of mad_outliers_events (full-value oracle): "
    "per-series exact median + MAD via F.percentile — deliberately the "
    "buffer-every-value shape, pinning exact med/mad/outlier counts at "
    "test SF while the t-digest form above is the registered production "
    "default for 100 TB.  Not in bench (bench times production shapes).",
)
def mad_outliers_events_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.percentile(
                F.abs(F.col("value") - F.col("med")), F.lit(0.5)
            ).alias("mad"),
        )
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.any_value("med"), 6).alias("med"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling (trailing) window aggregates over the daily revenue series
# ---------------------------------------------------------------------------
@register(
    "rolling_7day_revenue",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS dn,
         sum(o_totalprice) AS rev,
         count(*) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT d,
       round(rev, 2) AS revenue,
       n_orders,
       round(sum(rev) OVER w, 2) AS rev_7d,
       round(avg(rev) OVER w, 4) AS rev_7d_avg,
       CAST(count(*) OVER w AS BIGINT) AS days_in_window
FROM daily
WINDOW w AS (ORDER BY dn RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="Trailing 7-day rolling revenue (sum/avg/window-size) over the "
    "daily orders series, full-value oracle.  RANGE frame on integer "
    "epoch-days (engine-portable, correct across calendar gaps — a "
    "missing day still shrinks the window, unlike ROWS 6 PRECEDING).  "
    "One shuffle to daily grain, then a single unpartitioned window "
    "over the ~date-span-sized series — at 100 TB the daily rollup "
    "does the data reduction; the window runs over thousands of rows, "
    "not billions.",
)
def rolling_7day_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev"),
        F.count("*").alias("n_orders"),
    ).withColumn("dn", F.datediff("d", F.lit("1970-01-01")))
    w = Window.orderBy("dn").rangeBetween(-6, 0)
    return daily.select(
        "d",
        F.round("rev", 2).alias("revenue"),
        "n_orders",
        F.round(F.sum("rev").over(w), 2).alias("rev_7d"),
        F.round(F.avg("rev").over(w), 4).alias("rev_7d_avg"),
        F.count("*").over(w).alias("days_in_window"),
    )


# ---------------------------------------------------------------------------
# Deterministic quantile binning (decile feature transform)
# ---------------------------------------------------------------------------
def _binned_extendedprice(spark, sf_dir, exact: bool):
    """(v, bin) decile assignment for l_extendedprice: edges from ONE
    1-row aggregate broadcast back, bin = 1 + #edges strictly below v —
    deterministic under ties (unlike ntile).  exact=True uses Spark's
    exact F.percentile (aggregation buffer holds EVERY value — fine at
    test scale, O(N) single-task state at 100 TB); exact=False draws
    the edges from the engine's own t-digest (crick tdigest.pyx:144-163
    — the sketch exists precisely for this), constant state per
    partition.  The downstream binning plan is byte-identical either
    way — only the 1-row edge aggregate differs."""
    li = load_table(spark, sf_dir, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    if exact:
        edges = li.agg(
            F.percentile(
                "l_extendedprice", F.array(*[F.lit(q) for q in qs])
            ).alias("qs")
        )
    else:
        from crick_spark.operators import tdigest_quantiles

        est = tdigest_quantiles(li, "l_extendedprice", qs)
        edges = est.select(
            F.array(*[F.col(c) for c in est.columns]).alias("qs")
        )
    return li.crossJoin(F.broadcast(edges)).select(
        F.col("l_extendedprice").alias("v"),
        (
            F.lit(1)
            + F.size(
                F.filter("qs", lambda q: F.col("l_extendedprice") > q)
            )
        ).cast("bigint").alias("bin"),
    )


@register(
    "quantile_binning_extendedprice",
    oracle="""
SELECT CAST(i AS BIGINT) AS bin,
       TRUE AS mass_within_tol,
       TRUE AS contiguous
FROM generate_series(1, 10) t(i)
""",
    doc="Decile binning of l_extendedprice on the PRODUCTION path "
    "(r13, VERDICT r12 #2): edges from the engine's own t-digest — "
    "constant sketch state per partition, never F.percentile's "
    "every-value buffer — broadcast back from a 1-row aggregate, "
    "binning pure codegen.  Hash-matched per-bin boolean oracle (the "
    "tdigest_quantile_accuracy pattern): exactly 10 bins, each bin's "
    "mass within 0.03 of the ideal 0.10 (two t-digest edges bound a "
    "bin; the reference's per-edge CDF tolerance is 0.012, "
    "test_tdigest.py:99-102, so 0.024 worst case + headroom), and "
    "bins value-contiguous (each bin's unrounded min strictly above "
    "the previous bin's max).  The exact-edge form with a full-value "
    "oracle lives on as quantile_binning_exact_extendedprice, the "
    "test-scale twin.",
)
def quantile_binning_extendedprice(spark, sf_dir):
    binned = _binned_extendedprice(spark, sf_dir, exact=False)
    per_bin = binned.groupBy("bin").agg(
        F.count("*").alias("cnt"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    tot = binned.agg(F.count("*").alias("n_total"))
    # Unpartitioned window over the 10-row per-bin aggregate, not the
    # fact table — single-partition is the right plan at any scale.
    w = Window.orderBy("bin")
    return (
        per_bin.crossJoin(F.broadcast(tot))
        .withColumn("prev_hi", F.lag("hi").over(w))
        .select(
            "bin",
            (
                F.abs(F.col("cnt") / F.col("n_total") - F.lit(0.1))
                <= F.lit(0.03)
            ).alias("mass_within_tol"),
            F.coalesce(
                F.col("lo") > F.col("prev_hi"), F.lit(True)
            ).alias("contiguous"),
        )
    )


@register(
    "quantile_binning_exact_extendedprice",
    oracle="""
WITH b AS (
  SELECT quantile_cont(l_extendedprice,
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
  FROM lineitem
), binned AS (
  SELECT l.l_extendedprice AS v,
         1 + len(list_filter(b.qs, q -> l.l_extendedprice > q)) AS bin
  FROM lineitem l, b
)
SELECT bin,
       count(*) AS cnt,
       round(min(v), 2) AS lo,
       round(max(v), 2) AS hi,
       round(avg(v), 4) AS mean_v
FROM binned GROUP BY bin
""",
    doc="Test-scale twin of quantile_binning_extendedprice (r13): exact "
    "decile edges via Spark's F.percentile, every bin's count/lo/hi/"
    "mean hash-matched against DuckDB quantile_cont.  Pins the binning "
    "TRANSFORM exactly so the production form only has edge-placement "
    "freedom; not the 100 TB path (the percentile buffer holds every "
    "value in one task).",
)
def quantile_binning_exact_extendedprice(spark, sf_dir):
    binned = _binned_extendedprice(spark, sf_dir, exact=True)
    return binned.groupBy("bin").agg(
        F.count("*").alias("cnt"),
        F.round(F.min("v"), 2).alias("lo"),
        F.round(F.max("v"), 2).alias("hi"),
        F.round(F.avg("v"), 4).alias("mean_v"),
    )


@register(
    "quantile_binning_approx_accuracy",
    oracle="SELECT CAST(10 AS BIGINT) AS n_bins, "
    "TRUE AS total_preserved, TRUE AS mass_within_tol",
    doc="Accuracy twin for quantile_binning_extendedprice(exact=False) — "
    "the 100 TB path, with t-digest decile edges instead of the exact "
    "F.percentile whose buffer holds every value.  Hash-matched boolean "
    "oracle (the tdigest_quantile_accuracy pattern): all 10 bins "
    "present, every row lands in exactly one bin (sum of bin counts == "
    "table count), and each bin's mass is within 0.03 of the ideal "
    "0.10 (two t-digest edges bound a bin; the reference's per-edge "
    "CDF tolerance is 0.012, test_tdigest.py:99-102, so 0.024 worst "
    "case + headroom).  Downstream binning plan is byte-identical to "
    "the exact form — only the 1-row edge aggregate changes.",
)
def quantile_binning_approx_accuracy(spark, sf_dir):
    binned = _binned_extendedprice(spark, sf_dir, exact=False).groupBy(
        "bin"
    ).agg(F.count("*").alias("cnt"))
    li = load_table(spark, sf_dir, "lineitem")
    tot = li.agg(F.count("l_extendedprice").alias("n_total"))
    return binned.crossJoin(F.broadcast(tot)).agg(
        F.countDistinct("bin").alias("n_bins"),
        (F.sum("cnt") == F.min("n_total")).alias("total_preserved"),
        (
            F.max(F.abs(F.col("cnt") / F.col("n_total") - F.lit(0.1)))
            <= F.lit(0.03)
        ).alias("mass_within_tol"),
    )


# ---------------------------------------------------------------------------
# Data-quality constraint suite (deequ/dbt-test style) in one plan
# ---------------------------------------------------------------------------
@register(
    "data_quality_checks",
    oracle="""
SELECT 'orders_pk_unique' AS check_name,
       count(*) = count(DISTINCT o_orderkey) AS passed,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'orders_custkey_fk', count(*) = 0, CAST(count(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'lineitem_orderkey_fk', count(*) = 0, CAST(count(*) AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'lineitem_qty_range',
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                THEN 1 ELSE 0 END) AS BIGINT) = 0,
       CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_totalprice_nonnull',
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) = 0,
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)
FROM orders
UNION ALL
SELECT 'events_value_finite',
       CAST(sum(CASE WHEN isnan(value) OR value IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) = 0,
       CAST(sum(CASE WHEN isnan(value) OR value IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)
FROM events
""",
    doc="Constraint-validation suite (deequ/dbt-test style) as one "
    "union plan: PK uniqueness, two FK referential checks (anti-join "
    "counts), a range constraint, null/NaN rates — each row a named "
    "check with pass boolean + violation count, full-value oracle.  "
    "At 100 TB each check is an independent scan/agg branch; the FK "
    "checks broadcast the dimension side; all branches pipeline "
    "independently (no cross-branch barrier).",
)
def data_quality_checks(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    def row(name, violations_col):
        return (
            (F.lit(name).alias("check_name")),
            (violations_col == 0).alias("passed"),
            violations_col.cast("bigint").alias("violations"),
        )

    pk = o.agg(
        *row(
            "orders_pk_unique",
            F.count("*") - F.countDistinct("o_orderkey"),
        )
    )
    fk1 = (
        o.join(
            F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti"
        ).agg(*row("orders_custkey_fk", F.count("*")))
    )
    fk2 = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
            *row("lineitem_orderkey_fk", F.count("*"))
        )
    )
    rng = li.agg(
        *row(
            "lineitem_qty_range",
            F.sum(
                (
                    (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
                ).cast("long")
            ),
        )
    )
    nn = o.agg(
        *row(
            "orders_totalprice_nonnull",
            F.sum(F.col("o_totalprice").isNull().cast("long")),
        )
    )
    fin = ev.agg(
        *row(
            "events_value_finite",
            F.sum(
                (F.isnan("value") | F.col("value").isNull()).cast("long")
            ),
        )
    )
    out = pk
    for part_df in (fk1, fk2, rng, nn, fin):
        out = out.unionByName(part_df)
    return out


# ---------------------------------------------------------------------------
# Chi-square test of independence: event_type x day-of-week
# ---------------------------------------------------------------------------
@register(
    "chisq_event_type_weekday",
    oracle="""
WITH obs AS (
  SELECT event_type, dayofweek(ts) AS dow, count(*) AS o
  FROM events GROUP BY 1, 2
), rows_t AS (
  SELECT event_type, sum(o) AS rt FROM obs GROUP BY 1
), cols_t AS (
  SELECT dow, sum(o) AS ct FROM obs GROUP BY 1
), n_t AS (
  SELECT sum(o) AS n FROM obs
)
SELECT CAST(count(*) AS BIGINT) AS n_cells,
       CAST((count(DISTINCT obs.event_type) - 1)
            * (count(DISTINCT obs.dow) - 1) AS BIGINT) AS dof,
       round(sum(power(obs.o - rt * ct * 1.0 / n, 2)
                 / (rt * ct * 1.0 / n)), 6) AS chi2
FROM obs
JOIN rows_t USING (event_type)
JOIN cols_t USING (dow)
CROSS JOIN n_t
""",
    doc="Chi-square independence statistic for event_type x day-of-week "
    "(observed vs expected under independence), full-value oracle.  "
    "The contingency table is one shuffle; margins and the scalar N "
    "are tiny re-aggregations of it broadcast back — the fact table "
    "is scanned once regardless of scale.",
)
def chisq_event_type_weekday(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("o"))
    # materialized deliberately: the contingency table is
    # |types|x|weekdays| rows (35 here, dictionary-bounded at any
    # scale) and feeds four branches; recomputation would re-scan
    # events four times.  Eager localCheckpoint instead of .cache() so
    # the blocks are ContextCleaner-reclaimed with the plan — repeated
    # builder invocations in a long-lived session leak nothing.
    obs = obs.localCheckpoint(eager=True)
    rows_t = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_t = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    n_t = obs.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    return (
        obs.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "dow")
        .crossJoin(F.broadcast(n_t))
        .agg(
            F.count("*").alias("n_cells"),
            (
                (F.countDistinct("event_type") - 1)
                * (F.countDistinct("dow") - 1)
            ).alias("dof"),
            F.round(
                F.sum(F.pow(F.col("o") - e, F.lit(2)) / e), 6
            ).alias("chi2"),
        )
    )


# ---------------------------------------------------------------------------
# Pareto / cumulative-contribution analysis
# ---------------------------------------------------------------------------
@register(
    "pareto_revenue_concentration",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_rev,
       TRUE AS thresholds_monotone,
       TRUE AS share50_within_tol,
       TRUE AS share80_within_tol,
       TRUE AS share95_within_tol,
       TRUE AS top20_count_within_tol,
       TRUE AS top20_share_exceeds_count_share
FROM orders
""",
    doc="Pareto concentration analysis (how many top orders carry "
    "50/80/95% of revenue; revenue share of the top-20% of orders), "
    "PRODUCTION default (r9): the t-digest CDF value-threshold form.  "
    "A revenue-WEIGHTED t-digest over o_totalprice (weight = the price "
    "itself — crick's weighted add, tdigest.pyx:118-142) yields the "
    "value thresholds where the revenue-weighted CDF hits 0.5/0.2/0.05 "
    "(= top orders carrying 50/80/95% of revenue); an unweighted digest "
    "yields the top-20%-by-count threshold.  Counting orders above each "
    "broadcast threshold is then one codegen scan — NO global sort, NO "
    "single-partition WindowExec (the r8 shape funnelled every row "
    "through ONE task; it is retained as the hash-matched twin "
    "`pareto_revenue_exact`).  Hash-matched via the boolean-tolerance "
    "promotion pattern: exact count/total, threshold monotonicity "
    "(wq(0.5) ≥ wq(0.2) ≥ wq(0.05)), each threshold's ACTUAL revenue "
    "share above it within tolerance of target (the scan re-measures "
    "the digest's claim against the full data — itself scale-safe), "
    "and the top-20% share dominating its count share (mean of top "
    "values ≥ overall mean).",
)
def pareto_revenue_concentration(spark, sf_dir):
    from crick_spark.operators import tdigest_quantiles

    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    # revenue-weighted digest: wq(q) = value below which a q-fraction of
    # REVENUE lies, so revenue above wq(1-s) is s of the total (the
    # weight is the value itself, aliased — the sketch UDAF selects
    # [col, weight_col] and duplicate names collide in the Arrow batch)
    wq = tdigest_quantiles(
        o.withColumn("rev_w", F.col("o_totalprice")),
        "o_totalprice",
        [0.5, 0.2, 0.05],
        weight_col="rev_w",
    ).select(
        F.col("p0_5").alias("v50"),
        F.col("p0_2").alias("v80"),
        F.col("p0_05").alias("v95"),
    )
    uq = tdigest_quantiles(o, "o_totalprice", [0.8]).select(
        F.col("p0_8").alias("t20")
    )
    p = F.col("o_totalprice")
    share_above = lambda v: F.sum(F.when(p >= v, p)) / F.sum(p)
    agg = o.crossJoin(F.broadcast(wq)).crossJoin(F.broadcast(uq)).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum(p), 2).alias("total_rev"),
        F.any_value("v50").alias("v50"),
        F.any_value("v80").alias("v80"),
        F.any_value("v95").alias("v95"),
        share_above(F.col("v50")).alias("s50"),
        share_above(F.col("v80")).alias("s80"),
        share_above(F.col("v95")).alias("s95"),
        F.avg((p >= F.col("t20")).cast("double")).alias("frac20"),
        share_above(F.col("t20")).alias("share20"),
    )
    tol = 0.02
    return agg.select(
        "n_orders",
        "total_rev",
        (
            (F.col("v50") >= F.col("v80")) & (F.col("v80") >= F.col("v95"))
        ).alias("thresholds_monotone"),
        (F.abs(F.col("s50") - 0.5) <= tol).alias("share50_within_tol"),
        (F.abs(F.col("s80") - 0.8) <= tol).alias("share80_within_tol"),
        (F.abs(F.col("s95") - 0.95) <= tol).alias("share95_within_tol"),
        (F.abs(F.col("frac20") - 0.2) <= tol).alias(
            "top20_count_within_tol"
        ),
        (F.col("share20") >= F.col("frac20")).alias(
            "top20_share_exceeds_count_share"
        ),
    )


@register(
    "pareto_revenue_exact",
    oracle="""
WITH ranked AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         sum(o_totalprice) OVER (ORDER BY o_totalprice DESC, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS cum_rev,
         sum(o_totalprice) OVER () AS total_rev,
         count(*) OVER () AS n_orders
  FROM orders
)
SELECT CAST(min(n_orders) AS BIGINT) AS n_orders,
       round(min(total_rev), 2) AS total_rev,
       CAST(min(CASE WHEN cum_rev >= 0.5 * total_rev THEN rn END)
            AS BIGINT) AS orders_for_50pct,
       CAST(min(CASE WHEN cum_rev >= 0.8 * total_rev THEN rn END)
            AS BIGINT) AS orders_for_80pct,
       CAST(min(CASE WHEN cum_rev >= 0.95 * total_rev THEN rn END)
            AS BIGINT) AS orders_for_95pct,
       round(sum(CASE WHEN rn <= CAST(floor(0.2 * n_orders) AS BIGINT)
                 THEN o_totalprice END) / min(total_rev), 6)
         AS top20pct_share
FROM ranked
""",
    doc="EXACT accuracy twin of pareto_revenue_concentration (full-value "
    "oracle): deterministic cumulative ranking (orderkey tie-break) via "
    "a GLOBAL ordered window — every row funnels through one "
    "WindowExec task, so this is deliberately the test-SF-only shape "
    "pinning exact counts while the value-threshold form above is the "
    "registered production default for 100 TB.  Not in bench (bench "
    "times production shapes).",
)
def pareto_revenue_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    ranked = o.select(
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.sum("o_totalprice")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rev"),
        F.sum("o_totalprice")
        .over(Window.partitionBy())
        .alias("total_rev"),
        F.count("*").over(Window.partitionBy()).alias("n_orders"),
    )
    hit = lambda frac: F.min(
        F.when(
            F.col("cum_rev") >= frac * F.col("total_rev"), F.col("rn")
        )
    ).cast("bigint")
    return ranked.agg(
        F.min("n_orders").cast("bigint").alias("n_orders"),
        F.round(F.min("total_rev"), 2).alias("total_rev"),
        hit(0.5).alias("orders_for_50pct"),
        hit(0.8).alias("orders_for_80pct"),
        hit(0.95).alias("orders_for_95pct"),
        F.round(
            F.sum(
                F.when(
                    F.col("rn")
                    <= F.floor(0.2 * F.col("n_orders")).cast("bigint"),
                    F.col("o_totalprice"),
                )
            )
            / F.min("total_rev"),
            6,
        ).alias("top20pct_share"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing of the daily revenue series (bounded 30-day kernel)
# ---------------------------------------------------------------------------
@register(
    "ewma_daily_revenue",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS dn,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
), wl AS (
  SELECT d, rev,
         list(rev) OVER (ORDER BY dn
                         ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS xs
  FROM daily
)
SELECT d, round(rev, 2) AS revenue,
       round(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc), 4) AS ewma30
FROM wl
""",
    doc="EWMA smoothing (alpha=0.3) of the daily revenue series with a "
    "30-day truncated kernel, full-value oracle: both engines fold the "
    "windowed list left-to-right with the identical recurrence "
    "acc = a*x + (1-a)*acc, so results are bit-comparable before "
    "rounding (the truncation also bounds work — an unbounded EWMA is "
    "inherently sequential; 30 taps ≈ (1-a)^30 < 2e-5 residual).  Same "
    "scale story as rolling_7day: the window runs over the daily "
    "rollup, never the fact table.",
)
def ewma_daily_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    ).withColumn("dn", F.datediff("d", F.lit("1970-01-01")))
    w = Window.orderBy("dn").rowsBetween(-29, 0)
    xs = F.collect_list("rev").over(w)
    ewma = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return daily.select(
        "d",
        F.round("rev", 2).alias("revenue"),
        F.round(ewma, 4).alias("ewma30"),
    )


# ---------------------------------------------------------------------------
# Period-over-period growth (MoM / YoY)
# ---------------------------------------------------------------------------
@register(
    "period_over_period_revenue",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1
)
SELECT m,
       round(rev, 2) AS revenue,
       round(100.0 * (rev - lag(rev, 1) OVER (ORDER BY m))
                   / lag(rev, 1) OVER (ORDER BY m), 4) AS mom_pct,
       round(100.0 * (rev - lag(rev, 12) OVER (ORDER BY m))
                   / lag(rev, 12) OVER (ORDER BY m), 4) AS yoy_pct
FROM monthly
""",
    doc="Period-over-period growth: monthly revenue with MoM and YoY "
    "percent change via lag windows, full-value oracle (NULL for the "
    "first periods in both engines).  Windows run over the monthly "
    "rollup (~tens of rows), never the fact table.",
)
def period_over_period_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("m")
    mom = F.lag("rev", 1).over(w)
    yoy = F.lag("rev", 12).over(w)
    return monthly.select(
        "m",
        F.round("rev", 2).alias("revenue"),
        F.round(100.0 * (F.col("rev") - mom) / mom, 4).alias("mom_pct"),
        F.round(100.0 * (F.col("rev") - yoy) / yoy, 4).alias("yoy_pct"),
    )


# ---------------------------------------------------------------------------
# Moving median (robust rolling statistic) of the daily revenue series
# ---------------------------------------------------------------------------
@register(
    "moving_median_revenue",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS dn,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT d, round(rev, 2) AS revenue,
       round(quantile_cont(rev, 0.5)
               OVER (ORDER BY dn ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             4) AS med7
FROM daily
""",
    doc="7-observation moving median of daily revenue — the robust twin "
    "of rolling_7day_revenue (a single outlier day moves the mean but "
    "not the median), full-value oracle.  Spark lacks a windowed exact "
    "median, so the frame's values are collected, sorted, and "
    "interpolated at the midpoint per quantile_cont semantics — "
    "bounded by the 7-row frame, and the window again runs over the "
    "daily rollup, never the fact table.",
)
def moving_median_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    ).withColumn("dn", F.datediff("d", F.lit("1970-01-01")))
    w = Window.orderBy("dn").rowsBetween(-6, 0)
    xs = F.sort_array(F.collect_list("rev").over(w))
    n = F.size(xs)
    mid_lo = F.floor((n + 1) / 2).cast("int")
    mid_hi = (F.floor(n / 2) + 1).cast("int")
    lo = F.element_at(xs, mid_lo)
    hi = F.element_at(xs, mid_hi)
    med = F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return daily.select(
        "d",
        F.round("rev", 2).alias("revenue"),
        F.round(med, 4).alias("med7"),
    )


@register(
    "snapshot_diff_orders",
    oracle="""
SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders) AS o_orderkey,
       'insert' AS change_type
FROM orders WHERE o_orderkey % 101 = 0
UNION ALL
SELECT o_orderkey, 'delete' FROM orders WHERE o_orderkey % 97 = 0
UNION ALL
SELECT o_orderkey, 'update'
FROM orders WHERE o_orderkey % 53 = 0 AND o_orderkey % 97 <> 0
""",
    doc="Row-level snapshot diff (the Delta/Iceberg table_changes "
    "primitive): two deterministic snapshots of orders — deletes "
    "(key%97=0), price updates (key%53=0), inserts (key%101=0 cloned "
    "to max-key-offset keys) — diffed by snapshot_diff's key+xxhash64 "
    "full-outer join, so the shuffle carries (key, 8-byte hash), never "
    "full rows.  FULLY value-oracled: DuckDB derives the same change "
    "set from the construction arithmetic, an independent path that "
    "never touches the hash comparison.",
)
def snapshot_diff_orders(spark, sf_dir):
    from crick_spark.operators.relational import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    new = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 53 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 101 == 0)
            .crossJoin(
                F.broadcast(o.agg((F.max("o_orderkey") + 1).alias("__maxk__")))
            )
            .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__maxk__"))
            .drop("__maxk__")
        )
    )
    return snapshot_diff(o, new, ["o_orderkey"])


@register(
    "twap_daily_by_event_type",
    oracle="""
WITH s AS (
  SELECT event_type, date_trunc('day', ts) AS d, value,
         epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type, d, count(*) AS n_samples,
       round(sum(value * (nxt - us)) / nullif(sum(nxt - us), 0), 6) AS twap,
       round(avg(value), 6) AS plain_avg
FROM s GROUP BY event_type, d
""",
    doc="Time-weighted average (TWAP, step interpolation: each sample "
    "holds until the next) per (event_type, day) — the telemetry/"
    "financial aggregate a plain avg() misstates under irregular "
    "sampling.  FULLY value-oracled (identical lead/epoch arithmetic in "
    "DuckDB; single-sample days yield NULL twap on both engines).  "
    "Scale shape: the window is keyed (event_type, day), so partition "
    "state is one day of one type — bounded at any corpus size — "
    "instead of a per-type global sort; the (ts, event_id) tie-break "
    "keeps the step sequence deterministic.",
)
def twap_daily_by_event_type(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = F.date_trunc("day", F.col("ts"))
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("event_type", d).orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        d.alias("d"),
        "value",
        us.alias("us"),
        F.lead(us).over(w).alias("nxt"),
    )
    # try_divide: a group whose samples all share one timestamp has
    # Σdur = 0 — twap is undefined (NULL), it must not abort the plan
    # under ANSI mode (oracle's NULLIF matches)
    return s.groupBy("event_type", "d").agg(
        F.count("*").alias("n_samples"),
        F.round(
            F.try_divide(
                F.sum(F.col("value") * (F.col("nxt") - F.col("us"))),
                F.sum(F.col("nxt") - F.col("us")),
            ),
            6,
        ).alias("twap"),
        F.round(F.avg("value"), 6).alias("plain_avg"),
    )


@register(
    "weighted_sample_orders_per_priority",
    oracle="""
WITH scored AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY pow((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 6))::BIGINT
                         / 16777216.0),
                        1.0 / o_totalprice) DESC,
                    o_orderkey
         ) AS sample_rank
  FROM orders WHERE o_totalprice > 0
)
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
       sample_rank
FROM scored WHERE sample_rank <= 5
""",
    doc="Weighted sampling without replacement, 5 orders per priority "
    "class, weight = order value — the Efraimidis–Spirakis u^(1/w) "
    "reservoir rule with the repo's deterministic md5 coin, so the draw "
    "is reproducible and FULLY value-oracled (DuckDB computes the "
    "identical score; key spacings are ~1e-9 while cross-engine pow "
    "differs at ~1e-16, so the ranking is stable).  One codegen scan + "
    "one group-key shuffle; only rank ≤ k rows survive.",
)
def weighted_sample_orders_per_priority(spark, sf_dir):
    from crick_spark.pipeline.sampling import weighted_sample_per_group

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    s = weighted_sample_per_group(
        o, ["o_orderpriority"], "o_orderkey", "o_totalprice", 5
    )
    return s.select(
        "o_orderpriority",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "sample_rank",
    )


@register(
    "drift_ks_events_base_delta",
    oracle="""
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_base
  FROM events WHERE value IS NOT NULL
),
n AS (
  SELECT event_type,
         CAST(sum(is_base) AS BIGINT) AS n_base,
         CAST(sum(1 - is_base) AS BIGINT) AS n_delta
  FROM tagged GROUP BY event_type
),
cdf AS (
  SELECT t.event_type,
         sum(t.is_base) OVER w / CAST(nullif(n.n_base, 0) AS DOUBLE) AS f_base,
         sum(1 - t.is_base) OVER w / CAST(nullif(n.n_delta, 0) AS DOUBLE) AS f_delta
  FROM tagged t JOIN n USING (event_type)
  WINDOW w AS (PARTITION BY t.event_type ORDER BY t.value
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT c.event_type, n.n_base, n.n_delta,
       round(max(abs(f_base - f_delta)), 6) AS ks,
       max(abs(f_base - f_delta)) > 0.1 AS drifted
FROM cdf c JOIN n USING (event_type)
GROUP BY c.event_type, n.n_base, n.n_delta
""",
    doc="Distribution-drift detection between a base corpus and a new "
    "batch (event_id parity split): the EXACT two-sample "
    "Kolmogorov–Smirnov statistic per event_type — sup|F_base − "
    "F_delta| via one RANGE-frame window (ties enter both CDFs "
    "together, the textbook convention).  FULLY value-oracled; the "
    "parity split should show no drift (drifted=false rides along as "
    "the monitoring verdict at the 0.1 alert threshold).  At 100 TB "
    "the global per-type sort is the cost — the documented swap is "
    "probing both sides' t-digest CDFs on a fixed grid "
    "(tdigest_cdf), which bounds state at 2·digest per type and "
    "approximates sup over the grid; downstream unchanged.",
)
def drift_ks_events_base_delta(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    tagged = ev.select(
        "event_type",
        "value",
        (F.col("event_id") % 2 == 0).cast("int").alias("is_base"),
    )
    n = tagged.groupBy("event_type").agg(
        F.sum("is_base").alias("n_base"),
        F.sum(F.lit(1) - F.col("is_base")).alias("n_delta"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("value")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    # try_divide: a type whose rows are all one parity has an empty side
    # (n=0) — its KS is undefined (NULL), it must not abort the whole
    # monitoring job under ANSI mode
    cdf = tagged.join(n, "event_type").select(
        "event_type",
        "n_base",
        "n_delta",
        F.try_divide(F.sum("is_base").over(w), F.col("n_base")).alias("f_base"),
        F.try_divide(
            F.sum(F.lit(1) - F.col("is_base")).over(w), F.col("n_delta")
        ).alias("f_delta"),
    )
    return cdf.groupBy("event_type", "n_base", "n_delta").agg(
        F.round(F.max(F.abs(F.col("f_base") - F.col("f_delta"))), 6).alias("ks"),
        (F.max(F.abs(F.col("f_base") - F.col("f_delta"))) > 0.1).alias("drifted"),
    )


@register(
    "entropy_mi_event_weekday",
    oracle="""
WITH joint AS (
  SELECT event_type AS x, CAST(dayofweek(ts) AS BIGINT) AS y,
         count(*) AS nxy
  FROM events GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(nxy) AS DOUBLE) AS n FROM joint),
mx AS (SELECT x, sum(nxy) AS nx FROM joint GROUP BY x),
my AS (SELECT y, sum(nxy) AS ny FROM joint GROUP BY y)
SELECT round((SELECT -sum((nx / n) * ln(nx / n)) FROM mx, tot), 6) AS h_x,
       round((SELECT -sum((ny / n) * ln(ny / n)) FROM my, tot), 6) AS h_y,
       round((SELECT sum((nxy / n) * ln((nxy / n) / ((nx / n) * (ny / n))))
              FROM joint JOIN mx USING (x) JOIN my USING (y), tot), 6)
         AS mutual_info,
       CAST((SELECT count(*) FROM joint) AS BIGINT) AS n_cells
""",
    doc="Information-theoretic dependence — Shannon entropies H(X), H(Y) "
    "and mutual information I(X;Y) of (event_type, weekday), the "
    "feature-relevance companion to chisq_event_type_weekday (MI = 0 "
    "iff independent; unlike chi-square it is comparable across "
    "cardinalities).  FULLY value-oracled: both engines compute the "
    "same plug-in estimator from the same contingency rollup.  Scale "
    "shape: ONE shuffle builds the joint contingency table "
    "(|X|·|Y| rows); margins re-aggregate from it — the chisq plan "
    "shape, fact table scanned once.",
)
def entropy_mi_event_weekday(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    joint = (
        ev.groupBy(
            F.col("event_type").alias("x"),
            F.dayofweek("ts").cast("long").alias("y"),
        )
        .agg(F.count("*").alias("nxy"))
        .localCheckpoint(eager=True)  # tiny; margins re-read it, not the scan
    )
    tot = joint.agg(F.sum("nxy").cast("double").alias("n"))
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    px = F.col("nx") / F.col("n")
    py = F.col("ny") / F.col("n")
    pxy = F.col("nxy") / F.col("n")
    h_x = mx.crossJoin(F.broadcast(tot)).agg(
        F.round(-F.sum(px * F.log(px)), 6).alias("h_x")
    )
    h_y = my.crossJoin(F.broadcast(tot)).agg(
        F.round(-F.sum(py * F.log(py)), 6).alias("h_y")
    )
    mi = (
        joint.join(mx, "x")
        .join(my, "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(pxy * F.log(pxy / (px * py))), 6).alias(
                "mutual_info"
            ),
            F.count("*").alias("n_cells"),
        )
    )
    return (
        h_x.crossJoin(F.broadcast(h_y))
        .crossJoin(F.broadcast(mi))
        .select("h_x", "h_y", "mutual_info", "n_cells")
    )


@register(
    "markov_transitions_events",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, count(*) AS n_transitions,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_type), 6)
         AS p_transition
FROM seq WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
""",
    doc="First-order Markov transition matrix over per-user event "
    "sequences — the behavioral model behind next-event prediction and "
    "anomalous-flow detection: counts and conditional probabilities "
    "P(to|from) for consecutive event pairs within a user's timeline "
    "((ts, event_id) tie-broken).  FULLY value-oracled.  Scale shape: "
    "the lead() window is keyed by user_id (bounded per-user state, "
    "co-partitioned with every other per-user query), and the "
    "|types|² transition rollup + the row-normalizing window run on "
    "the aggregated matrix, not the fact table.",
)
def markov_transitions_events(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wrow = W.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wrow), 6
        ).alias("p_transition"),
    )


@register(
    "conversion_latency_quantiles",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_buy
  FROM events GROUP BY user_id
),
lat AS (
  SELECT (t_buy - t_view) / 1000000.0 AS latency_s
  FROM firsts WHERE t_view IS NOT NULL AND t_buy IS NOT NULL
              AND t_buy >= t_view
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_disc(latency_s, 0.5), 6) AS p50_latency_s,
       round(quantile_disc(latency_s, 0.9), 6) AS p90_latency_s,
       round(avg(latency_s), 6) AS avg_latency_s
FROM lat
""",
    doc="Funnel conversion LATENCY: per user, first 'view' → first "
    "'purchase' delay; p50/p90 via DISCRETE percentile (an actual "
    "observed latency, exact and hash-matchable — quantile_disc / "
    "percentile(…) on the sorted set agree bit-for-bit, unlike "
    "interpolated forms) plus the mean.  The time-to-convert metric "
    "beside funnel_conversion_users' rate metric.  Scale shape: one "
    "user-keyed conditional-min rollup (co-partitioned with every "
    "other per-user query), then quantiles over the converted-users "
    "table — fact table scanned once; swap percentile for the "
    "engine's t-digest at 100 TB per the winsorize family's documented "
    "pattern.",
)
def conversion_latency_quantiles(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
    )
    lat = firsts.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select(((F.col("t_buy") - F.col("t_view")) / 1e6).alias("latency_s"))
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s)"), 6).alias(
            "p50_latency_s"
        ),
        F.round(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s)"), 6).alias(
            "p90_latency_s"
        ),
        F.round(F.avg("latency_s"), 6).alias("avg_latency_s"),
    )


@register(
    "snapshot_roundtrip_orders",
    oracle="""
WITH new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice + 1
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
         o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 101 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(o_totalprice), 2) AS total_price,
       count(DISTINCT o_orderstatus) AS n_statuses,
       TRUE AS roundtrip_equal
FROM new
""",
    doc="CDC round trip — the MERGE INTO side of the versioning pair: "
    "apply_changes(old, snapshot_diff_with_payload(old, new)) must "
    "reproduce the new snapshot EXACTLY.  The same deterministic "
    "delete/update/insert construction as snapshot_diff_orders; the "
    "reconstructed table's aggregates hash-match DuckDB computing them "
    "from the construction arithmetic directly, and roundtrip_equal "
    "verifies row-level equality (key+value full-outer hash compare "
    "between reconstructed and target finds ZERO differing rows).  "
    "Scale: both legs co-partition on the key; only changed keys move.",
)
def snapshot_roundtrip_orders(spark, sf_dir):
    from crick_spark.operators.relational import (
        apply_changes,
        snapshot_diff,
        snapshot_diff_with_payload,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 53 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            # insert keys offset by max(o_orderkey) — data-derived, so
            # synthesized keys (k + max + 1) never collide with live keys at ANY sf
            # (a fixed +10M constant would collide once sf ≳ 1.7)
            o.where(F.col("o_orderkey") % 101 == 0)
            .crossJoin(
                F.broadcast(o.agg((F.max("o_orderkey") + 1).alias("__maxk__")))
            )
            .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__maxk__"))
            .drop("__maxk__")
        )
    )
    feed = snapshot_diff_with_payload(o, new, ["o_orderkey"])
    # materialize once: both the residual-diff branch and the aggregate
    # branch read `rebuilt` — without this the full diff+apply pipeline
    # (the expensive part) would execute twice in one plan
    rebuilt = apply_changes(o, feed, ["o_orderkey"]).localCheckpoint(
        eager=True
    )
    # row-level equality: a diff of (rebuilt, new) must be empty
    residual = snapshot_diff(rebuilt, new, ["o_orderkey"]).agg(
        F.count("*").alias("__n_diff__")
    )
    agg = rebuilt.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.count_distinct("o_orderstatus").alias("n_statuses"),
    )
    return agg.crossJoin(F.broadcast(residual)).select(
        "n_rows",
        "total_price",
        "n_statuses",
        (F.col("__n_diff__") == 0).alias("roundtrip_equal"),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]
_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", (SELECT count(*) FROM orders) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM orders"""
    for c in _PROFILE_COLS
)


@register(
    "profile_columns_orders",
    oracle=_PROFILE_ORACLE,
    doc="Column profiler, EXACT opt-in mode (exact_distinct=True): "
    "per-column null/distinct/min/max census over a mixed-type table "
    "(bigint, varchar, double, timestamp) - the schema-drift check an "
    "ingestion pipeline runs before trusting new data.  FULLY "
    "value-oracled including the cross-engine string rendering of "
    "min/max.  The exact mode pays an Expand node (N count-distincts "
    "replay the scan N-fold into the shuffle); the production DEFAULT "
    "is the Expand-free HLL census certified by "
    "profile_columns_orders_approx.",
)
def profile_columns_orders(spark, sf_dir):
    from crick_spark.functions.profile import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, _PROFILE_COLS, exact_distinct=True)


_PROFILE_APPROX_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", (SELECT count(*) FROM orders) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val,
       TRUE AS nd_within_bound
FROM orders"""
    for c in _PROFILE_COLS
)


@register(
    "profile_columns_orders_approx",
    oracle=_PROFILE_APPROX_ORACLE,
    doc="Accuracy twin certifying the profiler's DEFAULT approx-distinct "
    "mode (r6 VERDICT weak #1): the HLL++ census (one true pass, no "
    "Expand - N approx_count_distinct sketches ride the same single "
    "partial aggregation as min/max/nulls) joined against the exact "
    "census, emitting the exact-matched fields plus a per-column "
    "boolean asserting |hll - exact| <= 4*rsd*exact (rsd=0.02) - the "
    "same tolerance-as-correctness pattern as approx_distinct_users.  "
    "A drifted estimate flips a boolean and breaks the hash.",
)
def profile_columns_orders_approx(spark, sf_dir):
    from crick_spark.functions.profile import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    approx = profile_columns(orders, _PROFILE_COLS, rsd=0.02).select(
        "column", F.col("n_distinct").alias("nd_est")
    )
    exact = profile_columns(orders, _PROFILE_COLS, exact_distinct=True)
    return (
        exact.join(F.broadcast(approx), "column")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            "min_val",
            "max_val",
            (
                F.abs(F.col("nd_est") - F.col("n_distinct"))
                <= 4 * 0.02 * F.col("n_distinct")
            ).alias("nd_within_bound"),
        )
    )


@register(
    "ols_simple_lineitem",
    oracle="""
SELECT round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 3) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       count(*) AS n
FROM lineitem
WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
""",
    doc="One-pass distributed OLS (normal equations: one codegen "
    "aggregate of pairwise-product sums, driver solves the tiny "
    "system), single-feature case hash-matched against DuckDB's "
    "regr_slope/regr_intercept/regr_r2 - the closed form the SQL "
    "regr_* family specializes.",
)
def ols_simple_lineitem(spark, sf_dir):
    from crick_spark.functions.stats import linear_fit

    li = load_table(spark, sf_dir, "lineitem")
    beta, r2, n = linear_fit(li, "l_extendedprice", ["l_quantity"])
    return spark.createDataFrame(
        [
            (
                round(float(beta[1]), 3),
                round(float(beta[0]), 3),
                round(float(r2), 6),
                n,
            )
        ],
        "slope double, intercept double, r2 double, n long",
    )


@register(
    "ols_multi_lineitem",
    oracle="""
WITH s AS (
  SELECT covar_pop(l_quantity, l_quantity) AS saa,
         covar_pop(l_quantity, l_discount) AS sab,
         covar_pop(l_discount, l_discount) AS sbb,
         covar_pop(l_quantity, l_extendedprice) AS say,
         covar_pop(l_discount, l_extendedprice) AS sby,
         avg(l_quantity) AS ma, avg(l_discount) AS mb,
         avg(l_extendedprice) AS my
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
    AND l_extendedprice IS NOT NULL
)
SELECT round((say * sbb - sby * sab) / (saa * sbb - sab * sab), 3)
         AS beta_quantity,
       round((sby * saa - say * sab) / (saa * sbb - sab * sab), 3)
         AS beta_discount,
       round(my - (say * sbb - sby * sab) / (saa * sbb - sab * sab) * ma
                - (sby * saa - say * sab) / (saa * sbb - sab * sab) * mb, 3)
         AS intercept
FROM s
""",
    doc="Two-feature distributed OLS, hash-matched against the explicit "
    "Cramer's-rule solution of the centered normal equations written in "
    "SQL (covar_pop algebra) - proving the one-pass moment-matrix + "
    "driver-solve path computes exactly the closed form.",
)
def ols_multi_lineitem(spark, sf_dir):
    from crick_spark.functions.stats import linear_fit

    li = load_table(spark, sf_dir, "lineitem")
    beta, r2, n = linear_fit(
        li, "l_extendedprice", ["l_quantity", "l_discount"]
    )
    return spark.createDataFrame(
        [
            (
                round(float(beta[1]), 3),
                round(float(beta[2]), 3),
                round(float(beta[0]), 3),
            )
        ],
        "beta_quantity double, beta_discount double, intercept double",
    )
