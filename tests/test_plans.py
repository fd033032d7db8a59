"""Physical-plan invariants for the headline queries.

Bench timings catch perf regressions after the fact; these tests catch the
STRUCTURAL causes up front, per plan, at sf0.001 cost: a lost broadcast, a
filter that stopped reaching the scan, a join that degraded to a cartesian
product, or a shuffle-count blowup all fail here with the query name.
Counts come from the same `explain("formatted")` summary the PLANS.md
audit uses (tools/plan_audit.py).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_SMALL
from tools.plan_audit import summarize


def plan_text(spark, name: str) -> str:
    from crick_spark.plans import QUERIES

    df = QUERIES[name].fn(spark, SF_SMALL)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_summary(spark, name: str) -> dict:
    return summarize(plan_text(spark, name))


# Queries where a nested-loop/cartesian node is INTENTIONAL and bounded:
# single-row broadcasts (thresholds, totals, query vectors) cross-joined
# back onto the data, or deliberately tiny candidate sets.
CARTESIAN_ALLOWED = {
    "winsorize_extendedprice",
    "tdigest_quantile_accuracy",
    "funnel_conversion_users",
    "knn_bruteforce_cosine",
    "boilerplate_ngram_filter",
    "tpch_q11_important_parts",
    "tpch_q22_dormant_customers",
    "decontaminate_documents",
    "cms_freq_event_types",
    # r4: 1-row corpus-stats / basket-total broadcasts cross-joined back
    "bm25_top_docs",
    "copurchase_brand_lift",
    # r5: 1-row corpus-token-total broadcast joined onto the V vocab rows
    "build_vocab_documents",
    # r5: 1-row max-key broadcast for collision-free synthetic insert keys
    "snapshot_diff_orders",
    # r6: 1-row token-total broadcast cross-joined onto the scored bigrams
    "bigram_lm_scores_documents",
    # r6: ~170-row level/period rollup broadcast, CASE non-equi join back
    # to events for the per-period empirical-CDF accuracy check
    "tdigest_rollup_hierarchy_events",
    # r10: 1-row n_orders total broadcast cross-joined onto the
    # support-filtered pair rows (same shape as copurchase_brand_lift)
    "copurchase_lift_minsupport",
}

# (query, max shuffle exchanges) — the shuffle budget the current plan
# meets with headroom; a regression past it means a lost broadcast or a
# new wide dependency, which is exactly what should fail loudly.
SHUFFLE_BUDGETS = [
    ("q1_pricing_summary", 2),
    ("revenue_by_nation", 3),
    ("topk_users_by_events", 2),
    ("events_hourly_rollup", 2),
    ("tpch_q3_shipping_priority", 4),
    ("tpch_q9_product_profit", 5),
    ("dedup_exact_documents", 2),
    ("scd2_event_type_intervals", 3),
    ("cohort_retention_weekly", 5),
    # round-4 depth operators: budgets pin the designed shapes —
    # sessionize is one key shuffle; basket lift is basket-build +
    # marker-struct count (+1 AQE read); bm25 is stats agg + top-k;
    # interpolate is bucket agg + series window (+ broadcast join)
    ("sessionize_user_events", 3),
    ("copurchase_brand_lift", 4),
    ("bm25_top_docs", 3),
    ("interpolate_hourly_gaps", 3),
    ("mad_outliers_events", 4),
    # r5: recall-complete fuzzy join — every exchange is DICTIONARY-
    # sized (name agg + two value-dict distincts + candidate-pair dedup
    # + broadcasts for the gram join and the map-back), never fact-table
    # sized; the budget pins that none of the small sides degrades to a
    # fact-side shuffle
    ("fuzzy_match_part_names", 8),
    # r5 curation depth: budgets pin the designed shapes — snapshot diff
    # is ONE co-partitioned full-outer SMJ over (key, 8-byte hash); TWAP
    # is one (type, day) shuffle reused by window + rollup; the
    # threshold sweep and mixture plan are single-aggregation scans;
    # BPE is word-table agg + pair agg
    ("snapshot_diff_orders", 3),
    ("twap_daily_by_event_type", 3),
    ("quality_threshold_sweep", 2),
    ("mixture_epoch_plan_documents", 2),
    ("bpe_merge_candidates_documents", 3),
    ("build_vocab_documents", 4),
]


@pytest.mark.parametrize("name,budget", SHUFFLE_BUDGETS)
def test_shuffle_budget(spark, name, budget):
    s = plan_summary(spark, name)
    assert s["exchange_nodes"] <= budget, (
        f"{name}: {s['exchange_nodes']} exchanges > budget {budget} — "
        f"a broadcast was lost or a new wide dependency appeared"
    )


def test_no_unexpected_cartesian_products(spark):
    from crick_spark.plans import QUERIES

    bad = []
    for name in [n for n, _ in SHUFFLE_BUDGETS] + [
        "join_types_customer_orders",
        "asof_join_events_orders",
        "range_join_event_pairs",
        "jaccard_ngram_dup_pairs",
        "minhash_near_dup_pairs",
        "simhash_near_dup_pairs",
    ]:
        if name in CARTESIAN_ALLOWED:
            continue
        s = plan_summary(spark, name)
        if s["bnlj"] or s["cartesian"]:
            bad.append(name)
    assert bad == [], f"unexpected nested-loop/cartesian joins in: {bad}"


def test_star_joins_broadcast_dimensions(spark):
    """revenue_by_nation joins facts to nation/region dims — the dims must
    broadcast, never shuffle-join."""
    s = plan_summary(spark, "revenue_by_nation")
    assert s["bhj"] >= 2, "dimension joins stopped broadcasting"
    assert s["smj"] == 0, "a dimension join degraded to sort-merge"


def test_pruned_scan_prunes_partitions_and_columns(spark):
    """partition_pruned_scan exists to prove pruning: the partition-column
    filter must reach the scan as a PartitionFilter (directory-level
    skipping), and the scan must not read every column."""
    text = plan_text(spark, "partition_pruned_scan")
    assert "PartitionFilters: [" in text and "o_year" in text.split(
        "PartitionFilters:"
    )[1].split("]")[0], "partition filter no longer reaches the scan"
    s = summarize(text)
    assert s["scan_cols"] and max(s["scan_cols"]) <= 6, (
        f"column pruning regressed: scan reads {s['scan_cols']} columns"
    )


@pytest.mark.parametrize(
    "name", ["jaccard_ngram_dup_pairs", "containment_ngram_pairs_documents"]
)
def test_exact_pair_dedup_has_no_forced_broadcast(spark, name):
    """The exact-pair dedup joins must NOT force-broadcast the per-doc
    size relation: it is O(|corpus|) rows, so a mandatory broadcast hint
    is an executor OOM at 1e9 docs.  The joins are id equi-joins — AQE
    broadcasts at runtime when the side is actually small, which is the
    only acceptable way to get the broadcast.  Assert no broadcast hint
    survives analysis (the physical plan MAY still pick a broadcast join;
    that is the planner's size-based call, not a forced one)."""
    from crick_spark.plans import QUERIES

    df = QUERIES[name].fn(spark, SF_SMALL)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower(), (
        f"{name}: a broadcast hint survives in the logical plan — the "
        "per-doc side must stay AQE-decided"
    )


def test_profile_columns_default_has_no_expand(spark):
    """The profiler's DEFAULT (approx-distinct) plan must stay a single
    Expand-free pass: N exact count-distincts in one aggregate force an
    Expand node that replays every scan row N times into the shuffle
    (the sole 9.3x entry in SCALE.md before r7).  HLL sketches are
    map-side combinable, so the default census is one true pass; the
    exact mode is the opt-in that MAY expand."""
    from crick_spark.functions.profile import profile_columns
    from crick_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]

    def text(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    default_plan = text(profile_columns(orders, cols))
    assert "Expand" not in default_plan, (
        "default profile plan contains an Expand node - the approx "
        "census must be a single pass"
    )
    exact_plan = text(profile_columns(orders, cols, exact_distinct=True))
    assert "Expand" in exact_plan  # documents WHY approx is the default


def test_selective_filter_pushes_to_scan(spark):
    """tpch_q6's selective predicates must reach the parquet scan as
    PushedFilters (row-group skipping at scale)."""
    s = plan_summary(spark, "tpch_q6_forecast_revenue")
    assert s["pushed"] >= 1, "filters no longer pushed to the parquet scan"


@pytest.mark.parametrize(
    "name",
    [
        "pareto_revenue_concentration",
        "winsorize_extendedprice",
        "mad_outliers_events",
    ],
)
def test_sketch_default_has_no_single_task_shape(spark, name):
    """r9 (VERDICT r8 item 1): the registered DEFAULTS of the percentile
    family must be the sketch-backed 100 TB shapes — no global ordered
    window (WindowExec with no partition funnels every row through ONE
    task) and no F.percentile over the fact table (its aggregation
    buffer holds every group value in one reducer).  The exact forms
    live on as the `*_exact` hash-matched twins."""
    text = plan_text(spark, name)
    assert "Window" not in text, (
        f"{name}: a window node returned to the sketch default — the "
        "global-ordered ranking belongs in the *_exact twin only"
    )
    assert "percentile" not in text.lower(), (
        f"{name}: F.percentile returned to the sketch default — exact "
        "percentile buffers belong in the *_exact twin only"
    )


def test_tfidf_pair_join_reads_materialized_postings(spark):
    """r9 (VERDICT r8 item 2): tfidf_similar_pairs materializes the
    normalized posting relation ONCE (eager localCheckpoint) before the
    salted self-join — salting rewrites the two sides differently, so
    without the checkpoint Catalyst cannot reuse the exchange and each
    side recomputes the tokenize→explode→tf→idf→window chain (the
    pinned cause of the r7/r8 timing swings: 5.6/7.6/12.4 s min/med/max
    recomputing vs 3.3/4.9/5.6 s materialized, 6-run sweep at sf0.1).
    Pin the shape: both join sides scan the checkpointed RDD, so no
    parquet scan of documents survives anywhere in the pair-join plan
    (the salt-range explode above the checkpoint is fine — it's the
    term explode whose recompute hurt)."""
    text = plan_text(spark, "tfidf_similar_docs")
    assert text.count("ExistingRDD") >= 2, (
        "tfidf pair join no longer reads the materialized postings — "
        "the duplicate-subtree recompute is back"
    )
    assert "Scan parquet" not in text, (
        "a parquet scan survives in the pair-join plan: the posting "
        "subtree is being recomputed past the checkpoint"
    )


def test_sketch_aggregation_stays_narrow(spark):
    """The two-phase sketch path must shuffle sketch buffers, not rows:
    tdigest grouped quantiles gets at most 2 exchanges (partial shuffle +
    final), and its scans read only the value + group columns."""
    s = plan_summary(spark, "tdigest_quantiles_by_returnflag")
    assert s["exchange_nodes"] <= 2
    assert s["scan_cols"] and max(s["scan_cols"]) <= 2, (
        f"sketch scan reads {s['scan_cols']} columns — pruning regressed"
    )


def test_pack_sequences_windows_stay_sharded(spark):
    """Sequence packing must never collapse to a global sort: both its
    window and its rollup partition on the shard key, so the plan has no
    SinglePartition exchange — the property that lets 64 shards pack
    independently at any corpus size."""
    text = plan_text(spark, "pack_training_sequences")
    assert "SinglePartition" not in text, (
        "packing plan fell back to a global single-partition exchange"
    )
    assert "hashpartitioning(shard" in text, (
        "packing window no longer partitioned by shard"
    )


def test_aqe_splits_skewed_join_partitions(spark):
    """The engine's answer to hot join keys at 100 TB is AQE skew-join
    (enabled in get_session): prove it actually fires.  A join where one
    key holds 50% of the rows must execute as SortMergeJoin(skew=true)
    with an AQEShuffleRead that splits the hot partition — thresholds are
    lowered to make the fixture-scale skew visible, then restored."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        hot = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = hot.join(dim, "k")
        rows = j.collect()
        assert len(rows) == 200_000  # every row joins; the hot key too
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not mark the join as skew-split"
        assert "skewed" in plan, "no AQEShuffleRead skew split in final plan"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Star-join pruning at 100 TB: when the partition-column value set
    comes from a FILTERED DIMENSION (not a literal), static pruning
    can't fire — the fact scan must instead carry a
    dynamicpruningexpression PartitionFilter fed by the dim's broadcast
    (DPP).  Round-6 proof: the partitioned orders fact joined to a
    3-row year dim filtered on a non-partition column."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from crick_spark.sources.tables import load_table

    o = load_table(spark, SF_SMALL, "orders")
    base = str(tmp_path / "orders_by_year")
    o.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year"
    ).parquet(base)
    fact = spark.read.parquet(base)
    dim = spark.createDataFrame(
        [(1995, "target"), (1996, "other"), (1997, "other")],
        "d_year int, tag string",
    )
    j = (
        fact.join(dim, fact["o_year"] == dim["d_year"])
        .where(F.col("tag") == "target")
        .groupBy("o_orderpriority")
        .count()
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        j.explain("formatted")
    text = buf.getvalue()
    pf = [l for l in text.splitlines() if "PartitionFilters" in l]
    assert pf and any("dynamicpruningexpression" in l for l in pf), (
        "fact scan lost its dynamic partition filter:\n" + "\n".join(pf)
    )
    # and the pruned result is still correct vs a plain filter
    expect = {
        (r["o_orderpriority"], r["count"])
        for r in o.where(F.year("o_orderdate") == 1995)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    }
    got = {(r["o_orderpriority"], r["count"]) for r in j.collect()}
    assert got == expect


def test_runtime_bloom_filter_injection_fires(spark):
    """Row-level runtime filtering at 100 TB: when a shuffle join's build
    side is selective but NOT broadcastable, Catalyst can inject a
    bloom_filter_agg on the build keys and prefilter the probe-side scan
    with might_contain — the optimizer's own version of the engine's
    explicit bloom_semi_join (crick_spark/operators/crick_ops.py), proof
    that the declarative plan leaves room for runtime filters.  The
    engine's operator remains the statistics-independent form; this test
    pins the confs under which Spark's automatic one fires."""
    from pyspark.sql import functions as F

    from crick_spark.sources.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join: with a broadcast build side Spark prefers
        # its broadcast-hash runtime filter and skips the bloom
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_SMALL, "lineitem")
        orders = load_table(spark, SF_SMALL, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt, (
            "runtime bloom filter not injected:\n" + opt[:2000]
        )
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in phys.lower()
        # and the filtered plan computes the same answer
        got = {(r["l_returnflag"], r["count"]) for r in j.collect()}
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        expect = {
            (r["l_returnflag"], r["count"])
            for r in li.join(
                orders, li["l_orderkey"] == orders["o_orderkey"]
            )
            .groupBy("l_returnflag")
            .count()
            .collect()
        }
        assert got == expect
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_repeated_spans_single_corpus_pass(spark):
    """The corpus must be tokenized+hashed ONCE: before r8 the
    tokenize+slice+md5 posexplode executed twice (census + semi-join
    probe — two FileScan+Generate pairs, no ReusedExchange), doubling
    the most expensive registered query.  r8 fixed it with an eager
    localCheckpoint feeding both consumers; r15 replaced the
    census+semi-join pair with ONE count-over-wh-partition window, so
    the plan now has a single consumer chain — the property to pin is
    exactly ONE Generate node (one explode execution), no second
    FileScan+Generate pair."""
    from crick_spark.pipeline.dedup import repeated_window_spans
    from crick_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMALL, "documents").where(
        F.col("text").isNotNull()
    )
    spans = repeated_window_spans(docs, window_words=10)
    text = spans._jdf.queryExecution().executedPlan().toString()
    n_generate = text.count("Generate")
    assert n_generate == 1, (
        f"expected exactly one window-hash explode in the plan, found "
        f"{n_generate} — the corpus would be tokenized+hashed once per "
        "consumer again"
    )


def test_span_removal_keep_first_has_no_rank_window_or_broadcast(spark):
    """keep-first winner selection must be a map-side-combinable
    aggregate, not row_number over the passage family (a boilerplate
    passage repeated in millions of docs is ONE window partition), and
    must not force-broadcast any corpus-scaled relation."""
    from crick_spark.pipeline.dedup import (
        remove_repeated_spans,
        repeated_window_spans,
    )
    from crick_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMALL, "documents").where(
        F.col("text").isNotNull()
    )
    spans = repeated_window_spans(docs, window_words=10)
    cleaned = remove_repeated_spans(docs, spans)
    analyzed = cleaned._jdf.queryExecution().analyzed().toString()
    assert "broadcast" not in analyzed.lower()
    assert "row_number" not in analyzed.lower(), (
        "keep-first fell back to a rank window over the passage family"
    )


def test_image_decode_plan_is_map_only(spark):
    """The real-decode query (r10) is embarrassingly parallel: one
    column-pruned scan of doc_id, two Arrow-batched python stages
    (attach PPM bytes, decode+feature), ZERO exchanges — the plan a
    100 TB media pipeline needs (decode never shuffles)."""
    # another test's cached documents relation would substitute an
    # InMemoryTableScan for the parquet scan here (CacheManager matches
    # subtrees session-wide), hiding the pruned ReadSchema this test
    # asserts on — order-independence needs a clean cache
    spark.catalog.clearCache()
    s = plan_summary(spark, "image_decode_features_documents")
    assert s["exchange_nodes"] == 0, "decode path grew a shuffle"
    assert s["scan_cols"] == [1], "scan reads more than doc_id"
    assert s["python_nodes"] >= 1


def test_collect_metrics_is_a_pushdown_barrier(spark):
    """r11: the observe()/CollectMetrics audit counts EVERY scanned row —
    which is only true while Catalyst keeps the downstream quality
    filter ABOVE the CollectMetrics node and out of the parquet scan.
    Pin the structure so a future optimizer change that starts pushing
    through the barrier (silently shrinking the audited row set) fails
    here, not just in the value oracle."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from crick_spark.sources.tables import load_table

    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMALL, "documents")
    obs = Observation("audit_barrier")
    audited = docs.observe(obs, F.count(F.lit(1)).alias("n_scanned"))
    kept = audited.where(F.col("n_chars") >= 200)
    buf = io.StringIO()
    with redirect_stdout(buf):
        kept.explain("formatted")
    t = buf.getvalue()
    assert "CollectMetrics" in t
    # the filter stays above the metrics node: the scan block (before
    # the CollectMetrics mention) must carry no pushed/partition filter
    scan_block = t[: t.index("CollectMetrics")]
    assert "PushedFilters" not in scan_block
    # and behaviorally: the metric equals the FULL table row count even
    # though the action only touched the filtered survivors
    n_kept = kept.count()
    n_all = docs.count()
    assert obs.get["n_scanned"] == n_all
    assert n_kept < n_all
