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
(term, doc) posting-list join shape wins instead: ``bm25_bulk_scores``
prunes the exploded corpus tokens to the query vocabulary BEFORE the
posting shuffle (broadcast semi-join on the distinct term set), so the
(term, doc, tf) table — and everything after it — is sized by the
query vocabulary's hit rate, not the corpus token count.  Same plan
family as ``pipeline/dedup.py``'s posting joins.
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


def hashed_feature(col: Column, n_buckets: int | None) -> Column:
    """THE engine-wide hashed-feature convention: ``md5(tok)[0:8]`` (hex)
    mod ``n_buckets`` — deterministic, RNG-free, and reproducible in
    DuckDB (``pmod(conv(substr(md5(t),1,8),16,10), B)``), so every
    oracle can re-derive the exact bucket ids.  ``n_buckets=None``
    passes the raw token through.  One definition shared by the NB
    classifier (classify.nb_train/nb_score) and hashed DSIR
    (sampling.dsir_log_ratios) — the cross-module claim that they
    bucket identically holds by construction, not by parallel copies
    (r9 ADVICE fix)."""
    if n_buckets is None:
        return col
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
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


def bm25_bulk_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 for a PANEL of queries at once (``queries`` =
    (query_id, array<string> terms); duplicate terms within a query are
    deduped — terms are a set).  Returns (query_id, id_col, dl, bm25)
    for every (query, doc) pair sharing ≥1 term; documents matching no
    term of a query score exactly 0 in the per-query formula and are
    therefore *absent* here rather than materialized — at bulk scale
    the zero rows are |panel|×|corpus| dead weight.

    100 TB shape (the posting-join variant the per-query scorer's
    docstring promises): explode corpus tokens → semi-join against the
    broadcast DISTINCT query vocabulary BEFORE the posting shuffle (the
    one big shuffle carries only query-vocab hits) → (term, doc, tf)
    postings → per-term df as a tiny re-aggregation → broadcast panel
    join multiplies postings by matching queries → one final
    (query, doc) sum.  Corpus N/avgdl are a 1-row broadcast.  Work is
    O(vocabulary hit postings × queries-per-term), never
    |panel|×|corpus|.
    """
    qterms = queries.select(
        query_id_col,
        F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
    )
    vocab = qterms.select("term").distinct()
    toks = docs.select(
        id_col, tokens_expr(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks"))
    stats = toks.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    postings = (
        toks.select(id_col, "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(vocab), "term")  # prune BEFORE the shuffle
        .groupBy("term", id_col)
        .agg(F.min("dl").alias("dl"), F.count("*").cast("double").alias("tf"))
    )
    # per-term document frequency: re-aggregate the (term, doc) postings
    # — rows are unique per (term, doc), so df is a plain count
    df = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    contrib = (
        postings.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
        .join(F.broadcast(qterms), "term")
    )
    return contrib.groupBy(query_id_col, id_col).agg(
        F.min("dl").alias("dl"), F.sum("contrib").alias("bm25")
    )


def bm25_bulk_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k per query over :func:`bm25_bulk_scores` — one ranking
    window per query partition (each partition holds only that query's
    matching docs, never the corpus), deterministic tie-break on the
    rounded score then id."""
    from pyspark.sql import Window

    scored = bm25_bulk_scores(
        docs, queries, id_col, text_col, query_id_col, terms_col, k1, b
    ).select(
        query_id_col, id_col, "dl", F.round("bm25", 6).alias("bm25")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("bm25"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


# ---------------------------------------------------------------------------
# TF-IDF vectors + all-pairs cosine via posting-list join
# ---------------------------------------------------------------------------
def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Sparse TF-IDF vectors as (id, term, w) posting rows, plus the
    constant corpus size: w = tf · ln(N/df) with N = |corpus| (all docs,
    including empty ones — the sklearn convention) and df = #docs
    containing the term.

    Terms with idf = 0 (df = N, i.e. corpus-wide stop terms) are dropped:
    their weight is exactly 0, so no downstream sum changes, but they
    would otherwise dominate the posting join's largest bucket.
    ``max_df_ratio`` extends that prune lossily (drop df > ratio·N) — the
    100 TB skew control: the posting self-join's work is Σ_t df_t², so
    capping the largest df caps the hottest join bucket.  The df table
    itself is the exact per-term bucket-size census, computed for free.

    ``ngram`` > 1 uses word n-grams as terms (WITH multiplicity — tf
    counts repeats, unlike the distinct shingles of the Jaccard path).
    On a small-vocabulary corpus this is the structural skew fix, not a
    tuning knob: |vocab|^n possible terms means per-term df collapses
    and the posting self-join goes sparse (measured on the synthetic
    corpus: 31 s → ~2 s at sf0.1 for the pair query).

    The tokenize input is spread to full-core parallelism first
    (``ensure_scan_parallelism``): a small single-row-group parquet
    scan is ONE partition, which single-threads the whole
    tokenize→n-gram→explode pipeline — the measured majority of this
    operator's cost at bench scale (the pair join itself is <1 s; see
    ``tfidf_similar_pairs``).  No-op when the input already has ≥
    defaultParallelism splits, i.e. at any real scale.
    """
    from crick_spark.functions.skew import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    toks = tokens_expr(F.col(text_col))
    if ngram > 1:
        n_terms = F.size(toks) - (ngram - 1)
        terms = F.when(
            n_terms >= 1,
            F.transform(
                F.sequence(F.lit(1), n_terms),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i, ngram)
                ),
            ),
        ).otherwise(F.array())
    else:
        terms = toks
    tok = docs.select(id_col, F.explode(terms).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    stats = docs.agg(F.count("*").cast("double").alias("n_docs"))
    w = (
        tf.join(df_tbl, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .where(F.col("df") < F.col("n_docs"))
    )
    if max_df_ratio is not None:
        w = w.where(F.col("df") <= F.lit(max_df_ratio) * F.col("n_docs"))
    return w.select(id_col, "term", "w")


def tfidf_similar_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
    block_col: str | None = None,
    max_df_ratio: float | None = None,
    salt_df_threshold: int = 1000,
) -> DataFrame:
    """All document pairs with TF-IDF cosine ≥ threshold — the lexical
    near-duplicate/similarity measure between exact Jaccard (set-valued)
    and embedding cosine (dense).  Returns (id_a, id_b, tfidf_cosine)
    with id_a < id_b, cosine rounded to 1e-6.

    Plan: sparse posting self-join on term — cost Σ_t df_t², NEVER the
    |docs|² dense form; per-doc norms are a small second aggregate joined
    back by id.  ``block_col`` restricts pairs to the same block (e.g.
    language, the corpus-pipeline convention) and co-keys the posting
    join on (term, block), splitting every term's bucket by block.
    Exact and fully SQL-expressible → value-oracled (registry:
    ``tfidf_similar_docs``).

    Skew: terms hotter than ``salt_df_threshold`` postings are salted
    RESULTS-PRESERVINGLY (``salted_self_pair_join``): the hot term's
    quadratic pair work is spread over ceil(df/threshold) sub-buckets
    instead of pinning one reducer, and every pair still meets exactly
    once — unlike ``max_df_ratio``, which bounds the same work by
    DROPPING hot terms and changes scores.  Cold terms pay nothing
    (salt 0, no replication); on the bench corpus max_df ≈ 25 at
    sf0.1, so the salting path is measured on the Zipf skew probe
    (hot injected sentence → 3-gram df ≈ 0.4·|corpus|), not here.
    Set ``salt_df_threshold=0`` to disable.
    """
    from pyspark.sql import Window as W

    w = tfidf_weights(docs, id_col, text_col, ngram, max_df_ratio)
    join_keys = ["term"]
    if block_col is not None:
        blocks = docs.select(id_col, block_col)
        w = w.join(blocks, id_col)
        join_keys = ["term", block_col]
    # Unit-normalize per doc IN A WINDOW (one shuffle by id) instead of
    # aggregating norms and joining them back onto the pair results:
    # cosine = Σ ŵa·ŵb then needs no norms relation at all, removing two
    # joins.  The normalized postings are then materialized ONCE
    # (eager localCheckpoint) before the self-join: salting rewrites the
    # two sides differently (left gets hash-salt, right explodes the
    # salt range on hot keys), so their subtrees are NOT canonically
    # identical and Catalyst's exchange reuse cannot kick in — without
    # the checkpoint each side recomputes the full tokenize→explode→
    # tf→idf→window chain, the pinned root cause of the r7/r8
    # round-over-round swings (stage probe: three ~90 s-executor-time
    # stages with 7–23 s GC each on recompute; measured sweep of 6 runs
    # per variant at sf0.1: recompute min/med/max 5.6/7.6/12.4 s,
    # checkpoint 3.3/4.9/5.6 s).  The earlier r7 checkpoint that was
    # removed sat under THREE consumers incl. a norms join; this one
    # has exactly the two join sides reading materialized blocks.  At
    # cluster scale the same materialization is a persist of the
    # posting relation — shuffle-sized, the footprint the join pays
    # anyway.
    nrm = F.sqrt(
        F.sum(F.col("w") * F.col("w")).over(W.partitionBy(id_col))
    )
    w = w.withColumn("w", F.col("w") / nrm).localCheckpoint(eager=True)
    if salt_df_threshold:
        from crick_spark.functions.skew import salted_self_pair_join

        left, right, join_keys = salted_self_pair_join(
            w, join_keys, salt_df_threshold
        )
    else:
        left, right = w, w
    a = left.select(
        F.col(id_col).alias("id_a"), *join_keys, F.col("w").alias("wa")
    )
    b = right.select(
        F.col(id_col).alias("id_b"), *join_keys, F.col("w").alias("wb")
    )
    # merge hint (the jaccard_ngram_pairs precedent): left to itself
    # Spark BROADCASTS the ~10 MB posting side — a driver collect of a
    # computed, corpus-sized subtree (the scale-killer class outright at
    # 100 TB, and the measured in-session instability here: the same
    # query swung 2.5 → 31 s when the broadcast landed badly).  Forcing
    # the shuffle join keeps both sides executor-side and lets the
    # identical posting subtrees share work through exchange reuse.
    sim = (
        a.hint("merge")
        .join(b.hint("merge"), join_keys)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cos"))
        .where(F.col("cos") >= F.lit(threshold))
    )
    return sim.select(
        "id_a", "id_b", F.round("cos", 6).alias("tfidf_cosine")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: float = 60.0,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    fused(d) = Σ_lists 1/(c + rank_d) over the lists that contain d —
    the standard hybrid-retrieval combiner for lexical (BM25) + dense
    (embedding) rankings, robust to incomparable score scales because
    it consumes only RANKS.

    Each input carries (id_col, rank_col); the fusion is a union + one
    hash aggregate over the candidate lists (list-length rows, never
    corpus-sized), then a TakeOrderedAndProject top-k with the
    engine-wide tie-break (score desc, id asc).  Emits
    (id, rrf, n_lists).
    """
    if not ranked_lists:
        raise ValueError("rrf_fuse: need at least one ranked list")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col))).alias("__contrib__"),
        )
        for df in ranked_lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(id_col).agg(
        F.round(F.sum("__contrib__"), 6).alias("rrf"),
        F.count("*").alias("n_lists"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)
