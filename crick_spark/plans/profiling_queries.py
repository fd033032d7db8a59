r"""Data-profiling, discretization, and corpus-curation queries.

The operational layer a training-data pipeline runs before/after the
sketch and dedup operators: column profiling (null/distinct/range per
column in one scan), quantile-bin discretization (ntile), the long tail
of aggregate functions (median / bool / ordered string agg), per-label
embedding centroids, and the end-to-end curation composite
(quality-filter -> exact-dedup -> deterministic split) that chains the
pipeline operators into one plan.  All DuckDB-oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crick_spark.plans.registry import register
from crick_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Column profiling: one scan, every column's null/distinct/range stats
# ---------------------------------------------------------------------------
_PROFILE_NUM = ["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]


@register(
    "profile_lineitem_columns",
    oracle="""
SELECT 'l_orderkey' AS column_name, count(*) - count(l_orderkey) AS n_nulls,
       count(DISTINCT l_orderkey) AS n_distinct,
       round(min(l_orderkey), 6) AS min_d, round(max(l_orderkey), 6) AS max_d
FROM lineitem
UNION ALL
SELECT 'l_partkey', count(*) - count(l_partkey), count(DISTINCT l_partkey),
       round(min(l_partkey), 6), round(max(l_partkey), 6) FROM lineitem
UNION ALL
SELECT 'l_quantity', count(*) - count(l_quantity), count(DISTINCT l_quantity),
       round(min(l_quantity), 6), round(max(l_quantity), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
       count(DISTINCT l_extendedprice),
       round(min(l_extendedprice), 6), round(max(l_extendedprice), 6) FROM lineitem
UNION ALL
SELECT 'l_discount', count(*) - count(l_discount), count(DISTINCT l_discount),
       round(min(l_discount), 6), round(max(l_discount), 6) FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*) - count(l_returnflag),
       count(DISTINCT l_returnflag), NULL, NULL FROM lineitem
UNION ALL
SELECT 'l_linestatus', count(*) - count(l_linestatus),
       count(DISTINCT l_linestatus), NULL, NULL FROM lineitem
""",
    doc="Data profiling: per-column null count, exact distinct count, and "
    "numeric range — computed in a SINGLE scan (one aggregate row of "
    "3x7 expressions, unpivoted driver-side with stack()), where the "
    "naive per-column formulation (the oracle) scans 7 times.  At 100 "
    "TB swap count_distinct for approx_count_distinct per column.",
)
def profile_lineitem_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    for c in _PROFILE_NUM:
        aggs += [
            F.round(F.min(c).cast("double"), 6).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 6).alias(f"{c}__max"),
        ]
    row = li.agg(*aggs)
    stacked = []
    for c in _PROFILE_NUM:
        stacked.append(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        )
    for c in _PROFILE_STR:
        stacked.append(
            f"'{c}', {c}__nulls, {c}__distinct, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
        )
    n = len(_PROFILE_NUM) + len(_PROFILE_STR)
    return row.selectExpr(
        f"stack({n}, {', '.join(stacked)}) AS "
        "(column_name, n_nulls, n_distinct, min_d, max_d)"
    )


# ---------------------------------------------------------------------------
# Quantile-bin discretization (ntile)
# ---------------------------------------------------------------------------
@register(
    "ntile_price_quartiles",
    oracle="""
WITH binned AS (
  SELECT l_returnflag, l_extendedprice,
         ntile(4) OVER (PARTITION BY l_returnflag
                        ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS q
  FROM lineitem
)
SELECT l_returnflag, q AS quartile, count(*) AS cnt,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(min(l_extendedprice), 4) AS min_price,
       round(max(l_extendedprice), 4) AS max_price
FROM binned GROUP BY l_returnflag, q
""",
    doc="Quantile-bin discretization (feature bucketing): ntile(4) per "
    "group with a total tie-break order, then per-bin stats.  One "
    "shuffle + sort; at 100 TB prefer width_bucket against t-digest "
    "cutpoints (no global sort) — both forms are exposed.",
)
def ntile_price_quartiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    win = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    binned = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.ntile(4).over(win).alias("quartile"),
    )
    return binned.groupBy("l_returnflag", "quartile").agg(
        F.count("*").alias("cnt"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# Aggregate-function long tail: median, bool_and/or, count_if, ordered listagg
# ---------------------------------------------------------------------------
@register(
    "misc_aggregates_orders",
    oracle="""
WITH pr AS (
  SELECT o_orderstatus,
         string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       round(median(o.o_totalprice), 4) AS median_price,
       bool_and(o.o_totalprice > 0) AS all_positive,
       bool_or(o.o_totalprice > 400000) AS any_over_400k,
       count(*) FILTER (WHERE o.o_totalprice > 200000) AS n_over_200k,
       any_value(pr.priorities) AS priorities
FROM orders o JOIN pr USING (o_orderstatus)
GROUP BY o.o_orderstatus
""",
    doc="Long-tail aggregates: exact median (interpolated), bool_and/"
    "bool_or, filtered count, and a deterministic ordered list-agg of "
    "the distinct priorities (sorted collect_set, so order never "
    "depends on partitioning).",
)
def misc_aggregates_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_totalprice") > 200000).alias("n_over_200k"),
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities"),
    )


# ---------------------------------------------------------------------------
# Embedding centroids per label (leading dimensions)
# ---------------------------------------------------------------------------
@register(
    "embedding_centroids_by_label",
    oracle="""
SELECT label, count(*) AS n_vecs,
       round(avg(CAST(embedding[1] AS DOUBLE)), 6) AS dim0,
       round(avg(CAST(embedding[2] AS DOUBLE)), 6) AS dim1,
       round(avg(CAST(embedding[3] AS DOUBLE)), 6) AS dim2,
       round(avg(CAST(embedding[4] AS DOUBLE)), 6) AS dim3
FROM embeddings GROUP BY label
""",
    doc="Per-label centroid of the embedding column (leading 4 dims "
    "shown): plain columnar aggregation over array elements — the "
    "feature-space rollup behind IVF coarse quantizers and label "
    "diagnostics.  Scales as one map-side-combined agg; no shuffle of "
    "the vectors themselves.",
)
def embedding_centroids_by_label(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        *[
            F.round(F.avg(F.col("embedding")[i].cast("double")), 6).alias(f"dim{i}")
            for i in range(4)
        ],
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation: quality filter -> exact dedup -> split rollup
# ---------------------------------------------------------------------------
@register(
    "corpus_curation_pipeline",
    oracle=r"""
WITH scored AS (
  SELECT doc_id, text, lang,
         0.5 * least(len(string_split_regex(trim(text), '\s+')) / 64.0, 1.0)
       + 0.5 * (CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
                / len(string_split_regex(trim(text), '\s+'))) AS q
  FROM documents
),
kept AS (SELECT * FROM scored WHERE q >= 0.5),
canonical AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
final AS (
  SELECT k.lang, k.q,
         CASE WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
              WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
              ELSE 'test' END AS split
  FROM kept k JOIN canonical c USING (doc_id)
)
SELECT split, lang, count(*) AS n_docs, round(avg(q), 6) AS avg_quality
FROM final GROUP BY split, lang
""",
    doc="The curation composite an LLM-data pipeline runs end-to-end: "
    "quality-score filter (pure expressions) -> exact content dedup "
    "keeping the smallest doc_id (one shuffle on the 16-byte md5) -> "
    "deterministic md5 train/val/test assignment -> per-(split, lang) "
    "rollup.  Catalyst fuses score+filter+hash into the scan stage; "
    "only ids and hashes ever shuffle, never document text.",
)
def corpus_curation_pipeline(spark, sf_dir):
    from crick_spark.pipeline.text import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.select(
        "doc_id", "text", "lang", quality_score_expr(F.col("text")).alias("q")
    ).where(F.col("q") >= 0.5)
    canonical = (
        kept.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    final = kept.join(canonical, "doc_id").select(
        split.alias("split"), "lang", "q"
    )
    return final.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
    )


@register(
    "curation_pipeline_v2",
    oracle=r"""
WITH scored AS (
  SELECT doc_id, text, lang, source,
         0.5 * least(len(string_split_regex(trim(text), '\s+')) / 64.0, 1.0)
       + 0.5 * (CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
                / len(string_split_regex(trim(text), '\s+'))) AS q
  FROM documents
),
kept AS (SELECT * FROM scored WHERE q >= 0.5),
canonical AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
uniq AS (SELECT k.* FROM kept k JOIN canonical c USING (doc_id)),
sh AS (
  SELECT doc_id, lang,
    CASE WHEN len(string_split_regex(trim(text), '\s+')) - 2 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(text), '\s+')) - 2),
             i -> array_to_string(string_split_regex(trim(text), '\s+')[i:i+2], ' ')))
      ELSE [array_to_string(string_split_regex(trim(text), '\s+'), ' ')]
    END AS s
  FROM uniq
),
removed AS (
  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
),
final AS (SELECT u.* FROM uniq u ANTI JOIN removed r ON u.doc_id = r.doc_id)
SELECT d.source,
       count(*) AS n_input,
       CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(sum(CASE WHEN u.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_final,
       round(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             / (SELECT CAST(count(*) AS DOUBLE) FROM final), 6)
         AS realized_share
FROM documents d
LEFT JOIN kept k ON d.doc_id = k.doc_id
LEFT JOIN uniq u ON d.doc_id = u.doc_id
LEFT JOIN final f ON d.doc_id = f.doc_id
GROUP BY d.source
""",
    doc="The full curation funnel a training-data pipeline runs, composed "
    "from the repo's own stages and rolled up per source: quality filter "
    "(composite score ≥ 0.5, pure codegen) → exact content dedup (min "
    "doc_id per md5) → near-dup removal (exact 3-gram Jaccard ≥ 0.5 "
    "within language blocks — the oracle-able configuration of the "
    "MinHash path; keep-smaller-id rule) → per-source survivor counts "
    "and realized corpus shares.  FULLY value-oracled end-to-end: every "
    "stage is deterministic, so DuckDB reproduces the whole funnel.  At "
    "100 TB the same composition swaps the exact pair stage for the "
    "banded-LSH candidate join (identical interface, sub-quadratic) and "
    "feeds realized_share into mixture_epoch_plan.",
)
def curation_pipeline_v2(spark, sf_dir):
    from crick_spark.pipeline.dedup import jaccard_ngram_pairs
    from crick_spark.pipeline.text import quality_score_expr

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    kept = docs.withColumn("q", quality_score_expr(F.col("text"))).where(
        F.col("q") >= 0.5
    )
    canonical = (
        kept.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    uniq = kept.join(canonical, "doc_id")
    pairs = jaccard_ngram_pairs(
        uniq, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    )
    removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = uniq.join(removed, "doc_id", "left_anti")
    marks = (
        docs.join(kept.select("doc_id", F.lit(1).alias("__k__")), "doc_id", "left")
        .join(uniq.select("doc_id", F.lit(1).alias("__u__")), "doc_id", "left")
        .join(final.select("doc_id", F.lit(1).alias("__f__")), "doc_id", "left")
    )
    # realized_share's denominator comes from a window sum over the
    # |sources|-row grouped result — NOT a separate final.count() branch,
    # which would replay the dominant posting-join shuffle (Catalyst does
    # not reuse exchanges across branches; same rationale as the r5
    # copurchase/chisq localCheckpoint conversion)
    from pyspark.sql import Window as W

    grouped = marks.groupBy("source").agg(
        F.count("*").alias("n_input"),
        F.sum(F.coalesce(F.col("__k__"), F.lit(0))).alias("n_quality"),
        F.sum(F.coalesce(F.col("__u__"), F.lit(0))).alias("n_exact"),
        F.sum(F.coalesce(F.col("__f__"), F.lit(0))).alias("n_final"),
    )
    total = F.sum("n_final").over(
        W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return grouped.select(
        "source",
        "n_input",
        "n_quality",
        "n_exact",
        "n_final",
        F.round(F.col("n_final") / total, 6).alias("realized_share"),
    )


@register(
    "curation_pipeline_v3",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS ws
  FROM documents WHERE text IS NOT NULL
),
win AS (
  SELECT doc_id, i AS s, array_to_string(ws[i:i+9], ' ') AS w
  FROM wrd, unnest(generate_series(1, len(ws) - 9)) AS t(i)
  WHERE len(ws) >= 10
),
census AS (SELECT w, count(*) AS occ FROM win GROUP BY w),
dup AS (SELECT win.doc_id, win.s FROM win JOIN census USING (w) WHERE occ > 1),
flag AS (
  SELECT doc_id, s,
         CASE WHEN s > coalesce(max(s) OVER (PARTITION BY doc_id ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -10) + 10
              THEN 1 ELSE 0 END AS ni
  FROM dup
),
isl AS (
  SELECT doc_id, s, sum(ni) OVER (PARTITION BY doc_id ORDER BY s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM flag
),
spans AS (SELECT doc_id, min(s) AS ss, max(s) + 9 AS se FROM isl GROUP BY doc_id, g),
fam AS (
  SELECT sp.doc_id, sp.ss, sp.se,
         md5(array_to_string(w.ws[sp.ss:sp.ss+9], ' ')) AS lead
  FROM spans sp JOIN wrd w USING (doc_id)
),
cut AS (
  SELECT doc_id, ss, se FROM (
    SELECT fam.*, row_number() OVER (PARTITION BY lead ORDER BY doc_id, ss) AS rk
    FROM fam
  ) WHERE rk > 1
),
cutlists AS (SELECT doc_id, list({'s': ss, 'e': se}) AS sp FROM cut GROUP BY doc_id),
cl AS (
  SELECT w.doc_id, w.lang,
         list_transform(list_filter(generate_series(1, len(w.ws)),
            p -> len(list_filter(coalesce(c.sp, []),
                     x -> p >= x.s AND p <= x.e)) = 0),
            p -> w.ws[p]) AS cws
  FROM wrd w LEFT JOIN cutlists c USING (doc_id)
),
bg AS (
  SELECT doc_id, cws[i] AS w1, cws[i + 1] AS w2
  FROM cl, unnest(generate_series(1, len(cws) - 1)) AS t(i)
  WHERE len(cws) >= 2
),
big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n_cont FROM big GROUP BY w1),
cont AS (SELECT w2, count(*) AS n_left FROM big GROUP BY w2),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM big),
scores AS (
  SELECT bg.doc_id,
         round(avg(ln(greatest(big.c12 - 0.75, 0) / c1.c1
                      + 0.75 * c1.n_cont / c1.c1
                        * (cont.n_left / tot.n_types))), 6) AS avg_logp
  FROM bg JOIN big USING (w1, w2) JOIN c1 USING (w1) JOIN cont USING (w2)
  CROSS JOIN tot GROUP BY bg.doc_id
),
cuts AS (
  SELECT quantile_cont(avg_logp, 2.0 / 3.0) AS h,
         quantile_cont(avg_logp, 1.0 / 3.0) AS m FROM scores
),
bkt AS (
  SELECT s.doc_id,
         CASE WHEN avg_logp >= h THEN 'head'
              WHEN avg_logp >= m THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM scores s CROSS JOIN cuts
),
pool AS (
  SELECT b.doc_id, cl.lang, cl.cws FROM bkt b JOIN cl USING (doc_id)
  WHERE b.bucket <> 'tail'
),
ptok AS (SELECT doc_id, unnest(cws) AS tok FROM pool),
ttok AS (SELECT unnest(cws) AS tok FROM pool WHERE lang = 'en'),
src_cnt AS (SELECT tok, count(*) AS c_src FROM ptok GROUP BY tok),
tgt_cnt AS (SELECT tok, count(*) AS c_tgt FROM ttok GROUP BY tok),
vocab AS (
  SELECT v.tok, coalesce(s.c_src, 0) AS c_src, coalesce(t.c_tgt, 0) AS c_tgt
  FROM (SELECT tok FROM src_cnt UNION SELECT tok FROM tgt_cnt) v
  LEFT JOIN src_cnt s USING (tok) LEFT JOIN tgt_cnt t USING (tok)
),
tot2 AS (SELECT CAST(sum(c_src) AS DOUBLE) AS t_src,
                CAST(sum(c_tgt) AS DOUBLE) AS t_tgt,
                CAST(count(*) AS DOUBLE) AS v FROM vocab),
lr AS (
  SELECT ptok.doc_id,
         round(sum(ln((c_tgt + 1) / (t_tgt + v))
                 - ln((c_src + 1) / (t_src + v))), 6) AS log_ratio
  FROM ptok JOIN vocab USING (tok) CROSS JOIN tot2 GROUP BY ptok.doc_id
),
sel AS (
  SELECT doc_id FROM (
    SELECT lr.*, row_number() OVER (ORDER BY
      log_ratio - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                          + 0.5) / 16777216.0)) DESC, doc_id) AS rk
    FROM lr
  ) WHERE rk <= 100
)
SELECT cl.lang, bkt.bucket, count(*) AS n_docs,
       CAST(sum(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected
FROM bkt JOIN cl USING (doc_id) LEFT JOIN sel USING (doc_id)
GROUP BY cl.lang, bkt.bucket
""",
    doc="Curation funnel v3 (r7) - the round's new operators composed "
    "end-to-end, per (lang, perplexity-bucket): repeated-span REMOVAL "
    "(keep-first, the Lee et al. transform) cleans the corpus; a "
    "Kneser-Ney bigram model TRAINED ON THE CLEANED TEXT buckets every "
    "doc at the corpus's own terciles (CCNet head/middle/tail); DSIR "
    "then importance-resamples 100 docs from the head+middle pool "
    "toward the English subcorpus (Gumbel-top-k, md5 coin).  FULLY "
    "value-oracled end-to-end - every stage is deterministic, so DuckDB "
    "reproduces cleaned words, model, buckets, weights, and the exact "
    "selected set.  The composition matters: spans removed BEFORE LM "
    "training change the model (boilerplate no longer dominates "
    "bigram mass), which is the order real pipelines run.",
)
def curation_pipeline_v3(spark, sf_dir):
    from crick_spark.pipeline.dedup import (
        remove_repeated_spans,
        repeated_window_spans,
    )
    from crick_spark.pipeline.sampling import dsir_resample
    from crick_spark.pipeline.text import perplexity_buckets

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text", "lang")
    )
    spans = repeated_window_spans(docs, window_words=10)
    # one materialization: cleaned text feeds the KN model build, the
    # bucket scoring, and both DSIR token censuses
    cleaned = (
        remove_repeated_spans(docs, spans)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "text", "lang")
        .localCheckpoint(eager=True)
    )
    # r13 (VERDICT r12 #4): buckets feeds the pool filter AND the final
    # rollup, and pool feeds BOTH dsir token censuses plus the scoring
    # join — materialize each once (like cleaned above) instead of
    # re-running the KN model + scoring per consumer; plan width drops
    # from ~250 exchanges to the funnel's real shape
    buckets = perplexity_buckets(cleaned).localCheckpoint(eager=True)
    pool = (
        buckets.where(F.col("bucket") != "tail")
        .select("doc_id")
        .join(cleaned, "doc_id")
        .localCheckpoint(eager=True)
    )
    target = pool.where(F.col("lang") == "en")
    sel = dsir_resample(pool, target, k=100).select(
        "doc_id", F.lit(1).alias("__sel__")
    )
    return (
        buckets.join(cleaned.select("doc_id", "lang"), "doc_id")
        .join(sel, "doc_id", "left")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("__sel__"), F.lit(0))).alias("n_selected"),
        )
    )


@register(
    "curation_pipeline_v4",
    oracle=r"""
WITH base AS (
  SELECT doc_id, text, lang, source FROM documents WHERE text IS NOT NULL
),
wrd AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM base
),
raw AS (SELECT doc_id, lang, source, unnest(ws) AS t FROM wrd),
-- stage 1: NB classifier trained on the even half (label = lang)
tr AS (SELECT lang AS label, t AS tok FROM raw WHERE doc_id % 2 = 0),
cnt AS (SELECT label, tok, count(*) AS c FROM tr GROUP BY label, tok),
tot AS (SELECT label, CAST(sum(c) AS DOUBLE) AS t_c FROM cnt GROUP BY label),
voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM cnt),
dc AS (SELECT lang AS label, count(*) AS n_docs
       FROM base WHERE doc_id % 2 = 0 GROUP BY lang),
na AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS n_all FROM dc),
stats AS (
  SELECT dc.label, ln(dc.n_docs / na.n_all) AS log_prior,
         ln(1.0 / (tot.t_c + voc.v)) AS log_default
  FROM dc CROSS JOIN na JOIN tot ON dc.label = tot.label CROSS JOIN voc
),
lik AS (
  SELECT cnt.label, cnt.tok, ln((cnt.c + 1) / (tot.t_c + voc.v)) AS log_lik
  FROM cnt JOIN tot ON cnt.label = tot.label CROSS JOIN voc
),
sc AS (
  SELECT r.doc_id, s.label,
         any_value(s.log_prior)
           + sum(coalesce(l.log_lik, s.log_default)) AS score
  FROM raw r CROSS JOIN stats s
  LEFT JOIN lik l ON l.label = s.label AND l.tok = r.t
  WHERE r.doc_id % 2 = 1
  GROUP BY r.doc_id, s.label
),
pred AS (
  SELECT doc_id, label AS predicted FROM (
    SELECT sc.*, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, label ASC) AS rk FROM sc
  ) WHERE rk = 1
),
pool AS (
  SELECT b.doc_id, b.source FROM base b JOIN pred USING (doc_id)
  WHERE pred.predicted = 'en'
),
-- stage 2: hashed-feature DSIR from the classifier-passed pool toward
-- the even half's true-en seed corpus (512 buckets, V = 512)
ptok AS (
  SELECT r.doc_id,
         ('0x' || substr(md5(r.t), 1, 8))::BIGINT % 512 AS tok
  FROM raw r JOIN pool USING (doc_id)
),
ttok AS (
  SELECT ('0x' || substr(md5(t), 1, 8))::BIGINT % 512 AS tok
  FROM raw WHERE doc_id % 2 = 0 AND lang = 'en'
),
src_cnt AS (SELECT tok, count(*) AS c_src FROM ptok GROUP BY tok),
tgt_cnt AS (SELECT tok, count(*) AS c_tgt FROM ttok GROUP BY tok),
vocab2 AS (
  SELECT v.tok, coalesce(s.c_src, 0) AS c_src, coalesce(t.c_tgt, 0) AS c_tgt
  FROM (SELECT tok FROM src_cnt UNION SELECT tok FROM tgt_cnt) v
  LEFT JOIN src_cnt s USING (tok) LEFT JOIN tgt_cnt t USING (tok)
),
tot2 AS (SELECT CAST(sum(c_src) AS DOUBLE) AS t_src,
                CAST(sum(c_tgt) AS DOUBLE) AS t_tgt,
                512.0 AS v FROM vocab2),
lr AS (
  SELECT ptok.doc_id, sum(ln((c_tgt + 1) / (t_tgt + v))
                        - ln((c_src + 1) / (t_src + v))) AS log_ratio
  FROM ptok JOIN vocab2 USING (tok) CROSS JOIN tot2
  GROUP BY ptok.doc_id
),
sel AS (
  SELECT doc_id FROM (
    SELECT lr.*, row_number() OVER (ORDER BY
      log_ratio - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                          + 0.5) / 16777216.0)) DESC, doc_id) AS rk
    FROM lr
  ) WHERE rk <= 50
)
SELECT p.source,
       count(*) AS n_pool,
       CAST(sum(CASE WHEN sel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_selected,
       TRUE AS roundtrip_ok
FROM pool p LEFT JOIN sel USING (doc_id)
GROUP BY p.source
""",
    doc="Curation funnel v4 (r8) - the round's new operators composed "
    "end-to-end, per source: the closed-form NB classifier (trained on "
    "the even-doc_id half, label = lang) FILTERS the held-out half to "
    "docs it predicts 'en' (the fastText-classifier stage of a real "
    "pipeline); hashed-feature DSIR (512 buckets) importance-resamples "
    "50 of them toward the even half's true-en seed corpus; the "
    "selected docs are TOKENIZED by the unigram-LM Viterbi encoder "
    "(model trained on the seed corpus).  Value-oracled through "
    "selection: per-source pool and selected counts hash-match a "
    "DuckDB replay of classifier + resampler (every stage "
    "deterministic); the encode stage is boolean-gated in the same "
    "row (every selected doc's token stream rebuilds its lowercased "
    "words exactly - iterative EM training itself has no SQL analog).  "
    "Classifier-filter -> importance-resample -> tokenize is the order "
    "real LLM data pipelines run.",
)
def curation_pipeline_v4(spark, sf_dir):
    from crick_spark.pipeline.classify import nb_score, nb_train
    from crick_spark.pipeline.sampling import dsir_resample
    from crick_spark.pipeline.text import (
        lower_tokens_expr,
        unigram_encode,
        unigram_lm_train,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", "text", "lang", "source")
    )
    train = docs.where(F.col("doc_id") % 2 == 0)
    held = docs.where(F.col("doc_id") % 2 == 1)
    lik, stats = nb_train(train, label_col="lang")
    pred = nb_score(held, lik, stats)
    pool = held.join(
        pred.where(F.col("predicted") == "en").select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)  # feeds DSIR censuses + final rollup
    seed = train.where(F.col("lang") == "en")
    sel = dsir_resample(pool, seed, k=50, n_buckets=512).select("doc_id")
    model = unigram_lm_train(seed, vocab_size=200, seed_size=1000, em_rounds=2)
    enc = unigram_encode(pool.join(sel, "doc_id"), model)
    ref = pool.select(
        "doc_id",
        F.array_join(lower_tokens_expr(F.col("text")), "").alias("__wj__"),
    )
    rt = enc.join(ref, "doc_id").agg(
        F.bool_and(F.array_join("tokens", "") == F.col("__wj__")).alias(
            "__rt__"
        )
    )
    return (
        pool.join(sel.select("doc_id", F.lit(1).alias("__s__")), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_pool"),
            F.sum(F.coalesce(F.col("__s__"), F.lit(0)))
            .cast("long")
            .alias("n_selected"),
        )
        .crossJoin(F.broadcast(rt))
        .select(
            "source", "n_pool", "n_selected", F.col("__rt__").alias("roundtrip_ok")
        )
    )
