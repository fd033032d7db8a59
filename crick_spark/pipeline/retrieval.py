"""BM25 ranked retrieval over a document corpus — Spark-first.

The standard lexical scorer for training-data curation and RAG corpus
construction (Robertson/Spärck Jones probabilistic relevance framework;
the Lucene-style idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))`` which
is non-negative for every df).

100 TB shape: the query term set is small (human query / seed list), so
per-document term frequencies come from ``size(filter(tokens, ...))`` —
pure whole-stage-codegen array expressions, NO explode and NO
(doc, term) shuffle.  Corpus statistics (N, avgdl, per-term df) are one
tiny aggregate broadcast back as a 1-row cross join, and the only other
movement of data is the final top-k, which Spark executes as
TakeOrderedAndProject (per-partition heap + driver merge of k rows, not
a global sort).  Two linear scans of the corpus total; at 100 TB both
are map-only over columnar text.

For *bulk* scoring (thousands of queries at once) the explode →
(term, doc) posting-list join shape wins instead — that variant is the
same plan as ``pipeline/dedup.py``'s posting joins and is deliberately
not duplicated here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_expr(text: Column) -> Column:
    """Whitespace tokens of a trimmed text column (matches the corpus
    contract used across the pipeline: ``dedup.words_expr``), empty
    strings dropped so blank/whitespace-only docs get dl = 0."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against ``query_terms``; returns
    ``(id_col, dl, bm25)`` with bm25 = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)).

    Documents containing none of the terms score exactly 0.0 (each
    term's contribution has tf = 0 in the numerator).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    base = docs.select(
        id_col, tokens_expr(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks"))
    for i, t in enumerate(query_terms):
        base = base.withColumn(
            f"tf_{i}",
            F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("double"),
        )
    base = base.drop("toks")
    # corpus statistics: ONE small aggregate, broadcast back as a 1-row
    # cross join (BroadcastNestedLoopJoin of a single row — a literal at
    # runtime, not a data join)
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("double")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    contrib = [
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        * (F.col(f"tf_{i}") * F.lit(k1 + 1.0))
        / (
            F.col(f"tf_{i}")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.col("avgdl")
            )
        )
        for i in range(len(query_terms))
    ]
    score = contrib[0]
    for c in contrib[1:]:
        score = score + c
    return scored.select(id_col, "dl", score.alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25, deterministic tie-break on the rounded
    score then id (so the k-set is engine-independent).  Executes as
    TakeOrderedAndProject — no global sort."""
    scored = bm25_scores(docs, query_terms, id_col, text_col, k1, b)
    return (
        scored.select(
            id_col, "dl", F.round("bm25", 6).alias("bm25")
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
