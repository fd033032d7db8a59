"""Multinomial Naive Bayes text classification — the fastText-classifier
role of an LLM data pipeline (CCNet/LLaMA-style quality and domain
classifiers: train on labeled seed documents, score the whole corpus,
keep/bucket by predicted class) built from closed-form censuses instead
of SGD, so training is TWO hash aggregates and scoring is one
posting join — everything codegen, everything mergeable, and every
number reproducible by a SQL oracle.

Model: add-1-smoothed multinomial NB over whitespace tokens.
log P(c | d) ∝ log prior(c) + Σ_t log((count(t,c) + 1) / (T_c + V))
with V the union training vocabulary (every class a proper distribution
over the same support) and T_c the class token total.  Unseen (t, c)
pairs take the class default log(1/(T_c + V)) — they matter (T_c
differs by class), so scoring LEFT-joins the likelihood table and
coalesces to the default.

Scale shape: the model is two tables — (label, tok, log_lik) bounded by
|vocab| × |classes| (Heaps-bounded; pass ``n_buckets`` to hash tokens
into a fixed feature space exactly like ``dsir_log_ratios``, making the
model O(buckets × classes) at ANY corpus size) and a |classes|-row
stats table (prior + default, broadcast).  Scoring explodes doc tokens
once, cross-joins the tiny label list, left-joins the likelihood table,
and reduces with one hash aggregate per (doc, label) plus a per-doc
argmax — map-side combinable throughout, no driver loop, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feat(col, n_buckets: int | None):
    # ONE shared definition with dsir_log_ratios (retrieval.hashed_feature)
    # so the NB/DSIR same-bucketing claim holds by construction
    from crick_spark.pipeline.retrieval import hashed_feature

    return hashed_feature(col, n_buckets)


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the classifier on labeled documents.

    Returns ``(likelihood, label_stats)``: likelihood is
    (label, tok, log_lik) — one row per SEEN (class, token) pair;
    label_stats is (label, log_prior, log_default) — the per-class
    prior (doc-frequency based) and the smoothed likelihood of a token
    unseen in that class.  Two hash aggregates over the exploded token
    relation; partial aggregation collapses repeated tokens map-side.
    """
    from crick_spark.pipeline.retrieval import tokens_expr

    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens_expr(F.col(text_col))).alias("__t__"),
    ).select("label", _feat(F.col("__t__"), n_buckets).alias("tok"))
    counts = toks.groupBy("label", "tok").agg(F.count("*").alias("c"))
    v = (
        F.lit(float(n_buckets))
        if n_buckets is not None
        else F.count_distinct("tok").cast("double")
    )
    totals = counts.groupBy("label").agg(F.sum("c").alias("t_c"))
    vocab_n = counts.agg(v.alias("v"))
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("n_docs")
    )
    n_total = doc_counts.agg(F.sum("n_docs").alias("n_all"))
    label_stats = (
        doc_counts.crossJoin(F.broadcast(n_total))
        .join(totals, "label")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "label",
            F.log(F.col("n_docs") / F.col("n_all")).alias("log_prior"),
            F.log(F.lit(1.0) / (F.col("t_c") + F.col("v"))).alias(
                "log_default"
            ),
            "t_c",
            "v",
        )
    )
    likelihood = counts.join(
        label_stats.select("label", "t_c", "v"), "label"
    ).select(
        "label",
        "tok",
        F.log((F.col("c") + 1) / (F.col("t_c") + F.col("v"))).alias(
            "log_lik"
        ),
    )
    return likelihood, label_stats.select(
        "label", "log_prior", "log_default"
    )


def nb_score(
    docs: DataFrame,
    likelihood: DataFrame,
    label_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """Score documents against a trained model; emits
    (id, predicted, log_posterior) with the winning class per doc
    (deterministic tie-break: higher score, then lexicographically
    smaller label).  ``n_buckets`` must match training.

    Plan: explode tokens once, cross-join the broadcast |classes|-row
    label list, LEFT-join the likelihood table (unseen (tok, class)
    pairs coalesce to the class default), one (doc, label) hash
    aggregate, one per-doc argmax window over |classes| rows.
    """
    from pyspark.sql import Window

    from crick_spark.pipeline.retrieval import tokens_expr

    toks = docs.select(
        id_col, F.explode(tokens_expr(F.col(text_col))).alias("__t__")
    ).select(id_col, _feat(F.col("__t__"), n_buckets).alias("tok"))
    per = (
        toks.crossJoin(F.broadcast(label_stats))
        .join(likelihood, ["label", "tok"], "left")
        .groupBy(id_col, "label")
        .agg(
            (
                F.first("log_prior")
                + F.sum(F.coalesce("log_lik", F.col("log_default")))
            ).alias("score")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("label")
    )
    return (
        per.withColumn("__rk__", F.row_number().over(w))
        .where(F.col("__rk__") == 1)
        .select(
            id_col,
            F.col("label").alias("predicted"),
            F.round("score", 6).alias("log_posterior"),
        )
    )
