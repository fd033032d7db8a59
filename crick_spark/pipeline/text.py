"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting — all as codegen-friendly Column expressions over
the ``documents`` table (SURVEY §7.4 north-star set).

Everything here is per-row expression work (no shuffle, no UDF): at 100 TB
these run at scan speed and pipeline into whatever aggregation follows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from crick_spark.pipeline.dedup import shingles_expr, words_expr


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------
def token_count_exprs(text: Column) -> list[Column]:
    """Whitespace tokens plus a BPE-ish regex token count (word pieces +
    standalone non-word glyphs), both codegen-side."""
    w = words_expr(text)
    return [
        F.size(w).alias("ws_tokens"),
        F.coalesce(
            F.length(F.regexp_replace(text, r"\s+", "")) , F.lit(0)
        ).alias("non_ws_chars"),
        (F.size(F.split(text, r"\w+|[^\w\s]")) - 1).alias("bpe_ish_tokens"),
    ]


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------
def quality_exprs(text: Column) -> list[Column]:
    """Length / lexical-diversity / repetition heuristics used for corpus
    filtering: avg word length, type-token ratio, max single-word share."""
    w = words_expr(text)
    n = F.size(w)
    total_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    return [
        F.length(text).alias("n_chars_q"),
        n.alias("n_words"),
        (total_chars / n).alias("avg_word_len"),
        (F.size(F.array_distinct(w)) / n).alias("type_token_ratio"),
    ]


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality score: longer, lexically diverse docs score
    higher; degenerate repetition is penalized."""
    w = words_expr(text)
    n = F.size(w)
    ttr = F.size(F.array_distinct(w)) / n
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    return (0.5 * len_score + 0.5 * ttr).alias("quality_score")


# ---------------------------------------------------------------------------
# Language ID (character n-gram heuristic)
# ---------------------------------------------------------------------------
# tiny per-language marker lexicons (public, common stopwords); the operator
# pattern is what matters — swap in a real lexicon for production
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人", "这"],
}


def lang_id_expr(text: Column) -> Column:
    """Marker-word vote: predicted language = argmax over per-language
    marker hits (deterministic tie-break by language code); 'und' when no
    marker matches.  Pure array ops — no UDF."""
    w = F.transform(words_expr(text), lambda x: F.lower(x))
    scores = [
        (lang, F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in markers]))))
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        out = F.when(s == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# Document fingerprinting (min-k rolling-hash sketch)
# ---------------------------------------------------------------------------
def doc_fingerprint_expr(text: Column, k: int = 8, shingle_n: int = 3) -> Column:
    """Min-k sketch fingerprint: the k smallest xxhash64 values over word
    shingles, collapsed to one 64-bit id.  Mergeable (union = min-k of
    concat) and stable under small edits — the bottom-k analog of MinHash."""
    hashes = F.array_sort(
        F.transform(shingles_expr(text, shingle_n), lambda s: F.xxhash64(s))
    )
    min_k = F.slice(hashes, 1, k)
    return F.xxhash64(
        F.concat_ws(",", F.transform(min_k, lambda x: x.cast("string")))
    )


# ---------------------------------------------------------------------------
# Document chunking (training-data prep: token windows with overlap)
# ---------------------------------------------------------------------------
def chunk_exprs(
    text: Column, chunk_tokens: int = 32, overlap: int = 8
) -> Column:
    """Split a document into overlapping word-token windows — the
    training-data chunking step of an LLM pipeline.  Chunk i covers words
    [i·stride, i·stride + chunk_tokens), stride = chunk − overlap; the
    last window is included only if it adds words beyond the previous
    chunk's overlap.  Returns array<struct<chunk_idx, chunk_text,
    n_chunk_tokens>> (posexplode at the call site).  Deterministic and
    SQL-oracle-able; per-row expression work."""
    c, o = int(chunk_tokens), int(overlap)
    stride = c - o
    w = words_expr(text)
    n = F.size(w)
    n_chunks = F.ceil(F.greatest(n - o, F.lit(1)) / F.lit(float(stride))).cast("int")
    return F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            (i - 1).alias("chunk_idx"),
            F.array_join(F.slice(w, (i - 1) * stride + 1, c), " ").alias(
                "chunk_text"
            ),
            F.least(n - (i - 1) * stride, F.lit(c)).alias("n_chunk_tokens"),
        ),
    )


# ---------------------------------------------------------------------------
# Sequence packing (training-data prep: chunks → fixed-token sequences)
# ---------------------------------------------------------------------------
def pack_sequences(
    chunks,
    max_tokens: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_chunk_tokens",
):
    """Assign chunks to fixed-budget training sequences (the packing step
    between chunking and batch assembly in an LLM data pipeline).

    Packing rule — deterministic concat-and-bin: within a shard, chunks
    are ordered by (doc, chunk_idx), and a chunk joins sequence
    ``floor(tokens_before_it / max_tokens)``.  A sequence can overflow
    ``max_tokens`` by at most one chunk's tokens (chunks are never split);
    exact first-fit packing is inherently sequential, and this streaming
    rule is what scale pipelines actually run.

    Scale shape: packing is per-SHARD (``hash-mod`` on the doc id), so
    the window sort is N independent partitions — no global ordering, no
    single-partition shuffle; shards map 1:1 to output training files.
    Fully deterministic and SQL-oracle-able (one window sum).
    Emits (shard, seq_id, chunk identity, seq_pos) per chunk.
    """
    from pyspark.sql.window import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col, idx_col)
    cum_before = F.sum(tok_col).over(w) - F.col(tok_col)
    return (
        chunks.withColumn("shard", shard)
        .withColumn(
            "seq_id", F.floor(cum_before / F.lit(int(max_tokens))).cast("bigint")
        )
        .withColumn("seq_pos", F.row_number().over(
            Window.partitionBy("shard", "seq_id").orderBy(id_col, idx_col)
        ))
    )


# ---------------------------------------------------------------------------
# Repetition filtering (Gopher-style quality rules)
# ---------------------------------------------------------------------------
def repetition_exprs(text: Column) -> list[Column]:
    """Gopher-style repetition signals (Rae et al. 2021, *Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher*, §A1.1):
    duplicate-2-gram fraction (1 − distinct/total bigrams) and top-token
    fraction (most frequent token's share of the document).

    Pure per-row expressions — no shuffle, no UDF; the filter runs at scan
    speed and is embarrassingly parallel at any corpus size.  The top-token
    scan is O(|doc| · |doc vocab|) inside an interpreted higher-order
    function, fine for web-page-sized documents; for very long documents
    move it to the explode → groupBy(doc, token) → max form (two exchanges
    but linear per-doc work).
    """
    w = words_expr(text)
    n = F.size(w)
    t2 = n - 1
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(t2, F.lit(1))),
        lambda i: F.array_join(F.slice(w, i, 2), " "),
    )
    dup2 = F.when(
        t2 >= 1, F.lit(1.0) - F.size(F.array_distinct(grams)) / t2
    ).otherwise(F.lit(0.0))
    top = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda t: F.size(F.filter(w, lambda x: x == t)),
        )
    )
    return [
        n.cast("long").alias("n_tokens"),
        F.round(dup2, 6).alias("dup_2gram_frac"),
        F.round(top / n, 6).alias("top_token_frac"),
    ]


# ---------------------------------------------------------------------------
# PII redaction (regex scrubbing pass of a curation pipeline)
# ---------------------------------------------------------------------------
# Patterns kept to the regex subset with identical semantics in Java regex
# (Spark, codegen-side) and RE2 (DuckDB oracle): char classes, \d, \b,
# bounded repetition.  Order matters only for readability — the patterns
# are mutually non-overlapping by construction.
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_exprs(text: Column) -> list[Column]:
    """Per-kind PII match counts plus the fully redacted text.

    Pure regexp expressions (count via ``regexp_count``, scrub via chained
    ``regexp_replace``) — runs at scan speed, no UDF, no shuffle; at 100 TB
    this is a map-only pass that pipelines into the write."""
    counts = [
        F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in _PII_PATTERNS
    ]
    redacted = text
    for _, pat, rep in _PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, rep)
    return counts + [redacted.alias("redacted_text")]


# ---------------------------------------------------------------------------
# Cross-document boilerplate detection (corpus-level n-gram coverage)
# ---------------------------------------------------------------------------
def boilerplate_ngram_stats(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    doc_frac: float = 0.2,
    max_boiler_frac: float = 0.5,
):
    """Per-document boilerplate coverage: a shingle is *boilerplate* when it
    occurs in ≥ ``doc_frac`` of all documents; each document reports how
    much of its distinct-shingle set is boilerplate and a keep/drop flag
    (the C4/RefinedWeb-style cross-document template-text filter).

    Shape at 100 TB: one explode → groupBy(gram) with map-side partial
    aggregation (distinct shingles per doc keep the explode bounded by
    document length), a single-row count broadcast for the threshold, and
    the boilerplate set itself — small by construction, since only grams
    repeated across ≥ doc_frac of the corpus qualify — broadcasts back onto
    the exploded grams, so the only full shuffle is the gram rollup.

    Grams travel as 8-byte xxhash64 values (``shingle_hash_postings``),
    never as n-gram strings: the per-row cost is word-hash + n-window
    rehash instead of string slicing/concat, and both the rollup shuffle
    and the broadcast boilerplate set carry longs.  Identity-only use of
    the gram (count / membership) makes the hash substitution exact up to
    64-bit collisions (~|grams|²/2⁶⁵ — negligible at any corpus size that
    fits a cluster).  Measured at sf0.1: 1.3 s vs 5.0 s for the
    string-gram variant, same results."""
    from crick_spark.pipeline.dedup import shingle_hash_postings

    grams = shingle_hash_postings(docs, id_col, text_col, n)
    # postings are distinct-per-doc, so count(*) == count(DISTINCT doc):
    # plain count keeps full map-side partial aggregation (measured ~15%
    # faster at sf0.1).  A single-pass window-count-over-gram variant
    # measured 2x faster locally but puts every occurrence of a hot gram in
    # one partition — and boilerplate grams are hot by definition (>=20% of
    # the corpus), so it cannot survive scale; the two-pass groupBy keeps
    # hot keys collapsed map-side.
    ndocs_per_gram = grams.groupBy("th").agg(F.count("*").alias("ndocs"))
    total = docs.agg(F.count("*").alias("ntot"))
    boiler = (
        ndocs_per_gram.join(F.broadcast(total))
        .where(F.col("ndocs") >= F.lit(doc_frac) * F.col("ntot"))
        .select("th", F.lit(1).alias("is_boiler"))
    )
    cov = (
        grams.join(F.broadcast(boiler), "th", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0))).alias("n_boiler"),
        )
    )
    frac = F.col("n_boiler") / F.col("n_grams")
    return cov.select(
        F.col(id_col),
        F.col("n_grams").cast("long"),
        F.col("n_boiler").cast("long"),
        F.round(frac, 6).alias("boiler_frac"),
        (frac <= F.lit(max_boiler_frac)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Tokenizer training: vocabulary selection + BPE merge candidates
# ---------------------------------------------------------------------------
def lower_tokens_expr(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped — the tokenizer-
    training view of the ONE corpus token contract (case-preserved forms:
    ``retrieval.tokens_expr`` / ``dedup.words_expr``).  Changing the
    contract (e.g. unicode whitespace) has exactly one site per casing."""
    from crick_spark.pipeline.retrieval import tokens_expr

    return tokens_expr(F.lower(text))


def build_vocab(
    docs: DataFrame,
    vocab_size: int = 500,
    text_col: str = "text",
) -> DataFrame:
    """Frequency-ranked vocabulary with cumulative corpus coverage — the
    vocab-selection step of tokenizer training: lowercase whitespace
    tokens, top ``vocab_size`` by count (ties by token, deterministic),
    plus each token's share and the running coverage of the corpus a
    prefix of the vocab achieves (the curve that picks V in practice).

    100 TB shape: explode → hash-agg with map-side partial combine (one
    row per distinct token per task crosses the wire), top-V via
    TakeOrderedAndProject; only the V selected rows hit the single-
    partition ranking window.  An unbounded vocabulary tail (adversarial
    corpora) caps with SpaceSaving top-k (spacesaving_topk) at the same
    call shape — counts then carry the evict-min error bound.
    """
    from pyspark.sql import Window as W

    v = int(vocab_size)
    toks = docs.select(
        F.explode(lower_tokens_expr(F.col(text_col))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("freq"))
    total = counts.agg(F.sum("freq").alias("__total__"))
    top = (
        counts.orderBy(F.desc("freq"), F.asc("token"))
        .limit(v)
        .crossJoin(F.broadcast(total))
    )
    w = W.orderBy(F.desc("freq"), F.asc("token")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return top.select(
        F.row_number().over(W.orderBy(F.desc("freq"), F.asc("token"))).alias("rank"),
        "token",
        "freq",
        F.round(F.sum("freq").over(w) / F.col("__total__"), 6).alias("cum_coverage"),
    )


def bpe_merge_candidates(
    docs: DataFrame,
    top_n: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The first BPE merge iteration: count adjacent character pairs
    within corpus words (weighted by word frequency) and rank the merge
    candidates — top pair = the first merge a byte-pair tokenizer would
    learn.  Pure codegen: words aggregate FIRST (one row per distinct
    word — the standard BPE trick, pair counting runs over the word
    TABLE, not the corpus), then each word explodes into its
    length-1 adjacent pairs via ``sequence``/``transform``.

    100 TB shape: the word-frequency table is corpus-vocabulary-sized
    (Heaps' law: ≪ corpus), so each merge iteration is an explode +
    hash-agg over the vocab, not the raw text — exactly why production
    BPE trainers precompute word counts.  Subsequent iterations replace
    the merged pair in the word symbol streams (array transform) and
    repeat the same plan.
    """
    n = int(top_n)
    words = (
        docs.select(
            F.explode(lower_tokens_expr(F.col(text_col))).alias("word")
        )
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("wfreq"))
    )
    pairs = words.select(
        "wfreq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wfreq").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(n)
    )


def _accept_merge_batch(
    top_rows: list, fetched: int
) -> list[tuple[str, str, int]]:
    """Select the longest prefix of the ranked pair list that is PROVABLY
    the next merges sequential greedy BPE would make (round 6 — the
    standard production batching trick, but with an exactness guarantee
    instead of an approximation):

    1. Walk pairs in rank order (freq desc, l asc, r asc — the greedy
       tie-break) and stop at the first pair sharing a symbol with an
       already-accepted one.
    2. Keep only accepted pairs with freq STRICTLY above the first
       non-accepted pair's freq (``bound``).

    Why this equals sequential greedy: merging (a,b) only changes counts
    of pairs containing a or b, and every NEW pair (ab,x)/(x,ab) has
    count ≤ the old count of (b,x)/(x,a) — all of which conflict with
    (a,b) and are therefore non-accepted, so their counts are ≤ bound <
    every remaining accepted pair's freq.  Accepted pairs are mutually
    disjoint, so their own counts are untouched; by induction greedy
    picks exactly the accepted prefix, in order, at these frequencies.
    Fallback: the top-1 pair alone is always exactly greedy's next step
    (same ordering, same tie-break), so a conflict-heavy round still
    progresses."""
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    bound = None
    for row in top_rows:
        l, r, freq = row["l"], row["r"], int(row["freq"])
        if used & {l, r}:
            bound = freq
            break
        accepted.append((l, r, freq))
        used.update((l, r))
    else:
        # no conflict in the fetched window: if we fetched fewer rows
        # than asked, NO other pairs exist and the whole window is safe;
        # otherwise the first unfetched pair bounds at the last freq
        bound = -1 if len(top_rows) < fetched else top_rows[-1]["freq"]
    safe = [m for m in accepted if m[2] > bound]
    return safe if safe else accepted[:1]


def _bpe_train_driver(
    word_rows: list, n_merges: int, fetch: int, stats: dict | None
) -> list[tuple[str, str, int]]:
    """Driver-side twin of ``bpe_train``'s merge loop over an
    already-collected (syms, wfreq) table — the SAME
    ``_accept_merge_batch`` rule, the same (freq desc, l asc, r asc)
    ranking, and the same left-to-right batch application, so the merge
    list is byte-identical to the distributed loop (pytest
    ``test_bpe_driver_path_equals_distributed``)."""
    words = [(list(s), int(wf)) for s, wf in word_rows]
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for s, wf in words:
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + wf
        if not counts:
            break
        ranked = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        top = [
            {"l": l, "r": r, "freq": f} for (l, r), f in ranked[:fetch]
        ]
        rounds += 1
        batch = _accept_merge_batch(top, fetch)[: n_merges - len(merges)]
        merges.extend(batch)
        batch_pairs = [(l, r) for l, r, _ in batch]
        nxt = []
        for s, wf in words:
            for _l, _r in batch_pairs:
                merged, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == _l and s[i + 1] == _r:
                        merged.append(_l + _r)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                s = merged
            nxt.append((s, wf))
        words = nxt
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    batch_size: int = 8,
    stats: dict | None = None,
    driver_max_words: int | None = None,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges — the full trainer loop
    ``bpe_merge_candidates`` shows one step of: represent each distinct
    word as a symbol array (chars to start), and per round (1) count
    adjacent symbol pairs weighted by word frequency, (2) accept a
    batch of top pairs proven equivalent to sequential greedy
    (``_accept_merge_batch`` — mutually-disjoint symbols, strict
    frequency gap to the first excluded pair), (3) apply the whole batch
    left-to-right in every word's symbol stream in ONE pass.  Returns
    [(left, right, freq), …] in merge order — byte-identical to the
    one-merge-per-round sequential list (asserted in tests).

    Scale shape per round: one explode + partial-combine hash agg over
    the WORD table (vocab-sized, Heaps' law ≪ corpus) for the pair
    counts, a ``batch_size+1``-row driver fetch, and one Arrow-batched
    transform applying every accepted merge.  Batching cuts the job
    count from 2·n_merges to 2·n_rounds (typically 3-6× fewer on
    natural-language corpora — round counts land in ``stats``); the word
    table is localCheckpoint-ed each round so plan depth stays bounded.
    The corpus scan is spread first (``ensure_scan_parallelism``):
    MEASURED at sf0.1 the single-row-group scan single-threaded the
    word-table build, 9.3 s → 4.4 s end-to-end.

    Driver merge-loop fast path (r10, the unigram-trainer lever
    applied to BPE): word tables under ``driver_max_words`` (default
    ``DRIVER_EM_MAX_WORDS``; decide-and-use ``limit(cap+1).collect()``)
    run every merge round driver-side — zero Spark jobs per round
    instead of a pair-count aggregate + collect + mapInPandas +
    checkpoint each.  Same ranking, same ``_accept_merge_batch`` rule,
    same application order → byte-identical merge lists (pytest forces
    both paths); above the cap the distributed loop is unchanged.
    """
    import pandas as pd

    from crick_spark.functions.skew import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    words = (
        docs.select(F.explode(lower_tokens_expr(F.col(text_col))).alias("word"))
        .where(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("wfreq"))
        .select(F.split("word", "").alias("syms"), "wfreq")
        .localCheckpoint(eager=True)
    )
    n_merges = int(n_merges)
    fetch = max(2, int(batch_size) + 1)
    cap = int(
        DRIVER_EM_MAX_WORDS if driver_max_words is None else driver_max_words
    )
    head = words.limit(cap + 1).collect() if cap > 0 else None
    if head is not None and len(head) <= cap:
        return _bpe_train_driver(
            [(r["syms"], int(r["wfreq"])) for r in head],
            n_merges,
            fetch,
            stats,
        )
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        # guard: fully-merged single-symbol words have size-1 = 0 and
        # Spark's sequence(1, 0) counts DOWN (the shingles_expr pitfall)
        pairs = words.where(F.size("syms") >= 2).select(
            "wfreq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", (i + 1).cast("int")).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("wfreq").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(fetch)
            .collect()
        )
        if not top:
            break
        rounds += 1
        batch = _accept_merge_batch(top, fetch)[: n_merges - len(merges)]
        merges.extend(batch)
        batch_pairs = [(l, r) for l, r, _ in batch]

        def apply_merges(pdfs, _batch=batch_pairs):
            for pdf in pdfs:
                out = []
                for syms, wf in zip(pdf["syms"], pdf["wfreq"]):
                    s = list(syms)
                    for _l, _r in _batch:
                        merged, i = [], 0
                        while i < len(s):
                            if i + 1 < len(s) and s[i] == _l and s[i + 1] == _r:
                                merged.append(_l + _r)
                                i += 2
                            else:
                                merged.append(s[i])
                                i += 1
                        s = merged
                    out.append({"syms": s, "wfreq": int(wf)})
                yield pd.DataFrame(out, columns=["syms", "wfreq"])

        schema = StructType(
            [
                StructField("syms", ArrayType(StringType())),
                StructField("wfreq", LongType()),
            ]
        )
        words = words.mapInPandas(apply_merges, schema=schema).localCheckpoint(
            eager=True
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    return merges


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer trainer — round 6.  The other
# tokenizer family every training pipeline ships beside BPE (Kudo 2018):
# seed a large candidate vocabulary from frequent substrings, fit piece
# probabilities by EM over the corpus, prune to size by likelihood loss.
# ---------------------------------------------------------------------------
def _viterbi(word: str, logp: dict, max_len: int):
    """Best unigram segmentation of ``word`` under piece log-probs.
    Returns (pieces, score).  Deterministic: candidate lengths scan
    ascending with a strict-improvement rule, so exact ties keep the
    shortest-piece path.  Single chars are always in the vocab, so every
    word segments."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    best[0] = 0.0
    back: list = [None] * (n + 1)
    for i in range(1, n + 1):
        for length in range(1, min(max_len, i) + 1):
            piece = word[i - length : i]
            lp = logp.get(piece)
            if lp is None or best[i - length] == NEG:
                continue
            s = best[i - length] + lp
            if s > best[i]:
                best[i] = s
                back[i] = length
    pieces = []
    i = n
    while i > 0:
        length = back[i]
        pieces.append(word[i - length : i])
        i -= length
    pieces.reverse()
    return pieces, best[n]


def _trellis_groups(words: list, logp: dict, max_len: int):
    """Shared vectorized-trellis core for ``_viterbi_batch`` /
    ``_estep_batch`` (r9, VERDICT item 6).  Words GROUP BY EXACT LENGTH
    (no padding: total trellis work is exactly Σ|word|·max_len, the
    scalar kernel's step count, vectorized).  Within a group the
    U-dtype buffer is VIEWED as an (n, len) uint32 codepoint matrix,
    codepoints densify to ranks 1..K−1 (0 reserved: an out-of-vocab
    char maps to 0, and since every real piece digit is ≥ 1, a base-K
    packed window containing a 0 digit can never equal a piece id),
    and every substring of length l packs into ONE int64 as a base-K
    positional number built cumulatively (id_l = id_{l−1}·K +
    next-char code — integer multiply-adds, no string ops anywhere).
    Vocab pieces pack the same way ONCE per batch, so the per-(word,
    pos, len) dict probe becomes one int64 searchsorted per (group,
    piece length).  Tie-break parity: candidate lengths stack
    ascending and argmax takes the FIRST maximum — exactly the scalar
    kernel's ascending-scan strict-improvement rule (shortest piece
    wins ties).

    Yields (rows, n, IDS, best, back) per length group after one
    ``meta`` dict (keys: pid2piece, K, order).  Returns None instead
    (caller falls back to scalar) when the alphabet is too large to
    pack (K^max_len ≥ 2⁶³, ~1260 distinct chars at max_len 6 —
    large-CJK-vocab corpora)."""
    import numpy as np

    n_words = len(words)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n_words)
    L = int(lens.max())
    ml = min(int(max_len), L)
    by_len: dict[int, list] = {}
    for p, v in logp.items():
        if 1 <= len(p) <= ml:
            by_len.setdefault(len(p), []).append((p, v))
    # char ranks from the VOCAB alone (1..K-1); corpus chars missing
    # from the vocab map to 0 = "matches nothing", exactly the scalar
    # kernel's logp.get(piece) is None
    piece_cps = sorted(
        {ord(c) for entries in by_len.values() for p, _ in entries for c in p}
    )
    K = len(piece_cps) + 1
    # no usable piece (or an alphabet too large to pack): defer to the
    # scalar kernel so degenerate inputs fail/behave exactly as before
    if not piece_cps or K ** ml >= 2 ** 63:
        yield None
        return
    vocab_cps = np.asarray(piece_cps, dtype=np.uint32)
    rank = {int(c): i + 1 for i, c in enumerate(piece_cps)}
    keys: dict[int, "np.ndarray"] = {}
    vals: dict[int, "np.ndarray"] = {}
    pid2piece: dict[int, dict] = {}
    for l, entry in by_len.items():
        keyed = []
        for p, v in entry:
            pid = 0
            for c in p:
                pid = pid * K + rank[ord(c)]
            keyed.append((pid, v, p))
        keyed.sort()
        keys[l] = np.asarray([t[0] for t in keyed], dtype=np.int64)
        vals[l] = np.asarray([t[1] for t in keyed])
        pid2piece[l] = {t[0]: t[2] for t in keyed}

    arr_all = np.asarray(words, dtype=f"<U{L}")
    cp_all = arr_all.view(np.uint32).reshape(n_words, L)
    order = np.argsort(lens, kind="stable")
    lens_sorted = lens[order]
    yield {"pid2piece": pid2piece, "K": K, "order": order}

    start = 0
    while start < n_words:
        n = int(lens_sorted[start])
        stop = int(np.searchsorted(lens_sorted, n, side="right"))
        rows = order[start:stop]
        start = stop
        if n == 0:
            yield rows, 0, None, None, None
            continue
        g = len(rows)
        cp = cp_all[rows, :n]
        # rank lookup: searchsorted over vocab cps, miss → 0
        ri = np.searchsorted(vocab_cps, cp)
        ri[ri == len(vocab_cps)] = 0
        code = np.where(vocab_cps[ri] == cp, ri + 1, 0)
        gml = min(ml, n)
        IDS: dict[int, "np.ndarray"] = {}
        LP: dict[int, "np.ndarray"] = {}
        ids = code.astype(np.int64)
        for l in range(1, gml + 1):
            if l > 1:
                ids = ids[:, : n - l + 1] * K + code[:, l - 1 :]
            IDS[l] = ids
            k_l = keys.get(l)
            if k_l is None or not len(k_l):
                LP[l] = None
                continue
            flat = ids.ravel()
            idx = np.searchsorted(k_l, flat)
            idx[idx == len(k_l)] = 0
            hit = k_l[idx] == flat
            lp_l = np.full(flat.shape, -np.inf)
            lp_l[hit] = vals[l][idx[hit]]
            LP[l] = lp_l.reshape(ids.shape)
        best = np.full((g, n + 1), -np.inf)
        best[:, 0] = 0.0
        back = np.zeros((g, n + 1), dtype=np.int8)
        gr = np.arange(g)
        for i in range(1, n + 1):
            nl = min(gml, i)
            cand = np.empty((g, nl))
            for l in range(1, nl + 1):
                lp_l = LP[l]
                if lp_l is None:
                    cand[:, l - 1] = -np.inf
                else:
                    cand[:, l - 1] = best[:, i - l] + lp_l[:, i - l]
            bidx = cand.argmax(axis=1)
            best[:, i] = cand[gr, bidx]
            back[:, i] = bidx + 1
        yield rows, n, IDS, best, back


def _viterbi_batch(
    words: list, logp: dict, max_len: int
) -> list[tuple[list[str], float]]:
    """``_viterbi`` over a whole batch: byte-identical (pieces, score)
    per word via the vectorized trellis (``_trellis_groups``); scalar
    fallback on unpackable alphabets.  Equivalence pytest-pinned."""
    n_words = len(words)
    if not n_words:
        return []
    gen = _trellis_groups(words, logp, max_len)
    meta = next(gen)
    if meta is None:
        return [_viterbi(w, logp, max_len) for w in words]
    out_rows: list = [None] * n_words
    for rows, n, IDS, best, back in gen:
        if n == 0:
            for r in rows:
                out_rows[int(r)] = ([], 0.0)
            continue
        for j in range(len(rows)):
            r = int(rows[j])
            w = words[r]
            if best[j, n] == float("-inf"):
                # unsegmentable word (a char no piece covers): the DP
                # wrote argmax backpointers over all-(−inf) candidates,
                # so the walk would emit a bogus segmentation — the
                # scalar kernel raises here (back[i] is None); match it
                raise TypeError(
                    f"word {w!r} is not segmentable under the piece "
                    "table (out-of-vocabulary character)"
                )
            pieces = []
            i = n
            while i > 0:
                length = int(back[j, i])
                pieces.append(w[i - length : i])
                i -= length
            pieces.reverse()
            out_rows[r] = (pieces, float(best[j, n]))
    return out_rows


def _estep_batch(
    words: list, wfreqs, logp: dict, max_len: int
) -> tuple[dict, float]:
    """One hard-EM E-step over an Arrow batch, fully vectorized (r9):
    returns (piece → Σ wfreq over words using it, Σ wfreq·score) —
    exactly what the scalar loop `for w: _viterbi(w); counts[p]+=wf`
    produced, byte-identical (pinned by the trainer determinism tests
    and the _viterbi_batch equivalence test; both share the trellis).
    The backtrack walks ALL words of a length group in lockstep —
    piece ids gather from the packed-id matrices per chosen length,
    counts aggregate with one np.unique/bincount per batch, and only
    the ≤|vocab| distinct chosen pieces ever convert back to Python
    strings."""
    import numpy as np

    n_words = len(words)
    if not n_words:
        return {}, 0.0
    wf = np.asarray(wfreqs, dtype=np.float64)
    gen = _trellis_groups(words, logp, max_len)
    meta = next(gen)
    if meta is None:
        counts: dict[str, int] = {}
        ll = 0.0
        for w, f in zip(words, wfreqs):
            pieces, score = _viterbi(w, logp, max_len)
            ll += float(f) * score
            for p in pieces:
                counts[p] = counts.get(p, 0) + int(f)
        return counts, ll
    pid2piece = meta["pid2piece"]
    ll = 0.0
    pid_chunks: list = []
    wf_chunks: list = []
    len_chunks: list = []
    for rows, n, IDS, best, back in gen:
        if n == 0:
            continue
        g = len(rows)
        wf_g = wf[rows]
        finals = best[:, n]
        if np.isinf(finals).any():
            bad = words[int(rows[int(np.isinf(finals).argmax())])]
            # unsegmentable word — scalar-kernel parity (raises on
            # back[i] is None) instead of bogus argmax backpointers
            raise TypeError(
                f"word {bad!r} is not segmentable under the piece "
                "table (out-of-vocabulary character)"
            )
        ll += float(np.dot(finals, wf_g))
        cur = np.full(g, n, dtype=np.int64)
        gr = np.arange(g)
        while True:
            alive = cur > 0
            if not alive.any():
                break
            ga = gr[alive]
            ca = cur[alive]
            la = back[ga, ca].astype(np.int64)
            starts = ca - la
            pids = np.empty(len(ga), dtype=np.int64)
            for lv in np.unique(la):
                m = la == lv
                pids[m] = IDS[int(lv)][ga[m], starts[m]]
            pid_chunks.append(pids)
            wf_chunks.append(wf_g[ga])
            len_chunks.append(la)
            cur[alive] = starts
    if not pid_chunks:
        return {}, ll
    all_pids = np.concatenate(pid_chunks)
    all_wfs = np.concatenate(wf_chunks)
    all_lens = np.concatenate(len_chunks)
    counts = {}
    # (len, pid) uniquely identifies a piece; aggregate per length
    for lv in np.unique(all_lens):
        m = all_lens == lv
        upids, inv = np.unique(all_pids[m], return_inverse=True)
        sums = np.bincount(inv, weights=all_wfs[m])
        lut = pid2piece[int(lv)]
        for pid, s in zip(upids, sums):
            counts[lut[int(pid)]] = int(s)
    return counts, ll


#: word tables at or under this row count run the whole EM loop
#: driver-side off ONE decide-and-use collect (the ClusterStore
#: DRIVER_CLOSE pattern): the table is (word, wfreq) rows — 50k of
#: them ≈ ~2 MB — and every EM round plus the seeding census otherwise
#: pays a full Spark job for kernel work that is milliseconds on a
#: Heaps-bounded relation.  The cap is sized so the driver-side
#: substring census (≈ |words|·|word|·max_len dict increments, the
#: slowest driver phase) stays well under one Spark job's overhead;
#: larger tables keep the distributed path unchanged.
DRIVER_EM_MAX_WORDS = 50_000


def _unigram_lm_train_driver(
    word_rows: list,
    vocab_size: int,
    seed_size: int,
    max_piece_len: int,
    em_rounds: int,
    stats: dict | None,
) -> list[tuple[str, float]]:
    """Driver-side twin of ``unigram_lm_train``'s seeding + EM + prune
    over an already-collected (word, wfreq) table — the SAME
    ``_estep_batch``/``_viterbi`` kernels and the same tie orders, so
    the piece table is byte-identical to the distributed path (pytest
    ``test_unigram_driver_path_equals_distributed``)."""
    import math

    if int(em_rounds) < 1:  # same contract as the distributed path
        raise ValueError(f"em_rounds must be >= 1, got {em_rounds}")
    ml = int(max_piece_len)
    # substring census with multiplicity, weighted by word frequency —
    # the driver twin of the explode + hash-agg seeding
    freq_census: dict[str, int] = {}
    for w, wf in word_rows:
        n = len(w)
        for i in range(n):
            for l in range(1, min(ml, n - i) + 1):
                p = w[i : i + l]
                freq_census[p] = freq_census.get(p, 0) + wf
    seed_rows = sorted(freq_census.items(), key=lambda kv: (-kv[1], kv[0]))[
        : int(seed_size)
    ]
    freqs: dict[str, int] = {
        p: c for p, c in freq_census.items() if len(p) == 1
    }
    for p, c in seed_rows:
        freqs.setdefault(p, c)
    chars = {p for p in freqs if len(p) == 1}

    def normalize(fr: dict) -> dict:
        total = float(sum(fr.values()))
        return {p: math.log(c / total) for p, c in fr.items() if c > 0}

    wl = [w for w, _ in word_rows]
    wf = [f for _, f in word_rows]

    def em_pass(logp_in: dict) -> tuple[dict, float]:
        counts, ll = _estep_batch(wl, wf, dict(logp_in), ml)
        for c in chars:
            counts.setdefault(c, 1)
        return counts, ll

    logp = normalize(freqs)
    loglik_trace: list[float] = []
    for _ in range(int(em_rounds)):
        counts, ll = em_pass(logp)
        loglik_trace.append(ll)
        logp = normalize(counts)
    multi = [p for p in logp if len(p) > 1]
    losses = []
    for p in multi:
        own = logp.pop(p)
        _, alt = _viterbi(p, logp, ml)
        logp[p] = own
        used = counts.get(p, 0)
        losses.append((used * (own - alt), p))
    losses.sort(key=lambda t: (-t[0], t[1]))
    keep_multi = {p for _, p in losses[: max(0, int(vocab_size) - len(chars))]}
    pruned = {
        p: c for p, c in counts.items() if p in keep_multi or len(p) == 1
    }
    logp = normalize(pruned)
    counts, ll = em_pass(logp)
    loglik_trace.append(ll)
    logp = normalize(counts)
    if stats is not None:
        stats["loglik_trace"] = loglik_trace
        stats["n_pieces"] = len(logp)
        stats["n_chars"] = len(chars)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_lm_train(
    docs: DataFrame,
    vocab_size: int = 400,
    seed_size: int = 2000,
    max_piece_len: int = 6,
    em_rounds: int = 4,
    text_col: str = "text",
    stats: dict | None = None,
    driver_em_max_words: int = DRIVER_EM_MAX_WORDS,
) -> list[tuple[str, float]]:
    """SentencePiece-style unigram-LM trainer: (1) seed candidates from
    the ``seed_size`` most frequent substrings (length ≤ max_piece_len)
    of the corpus WORD table plus every single character (coverage
    guarantee), (2) hard (Viterbi) EM — E-step segments each distinct
    word under current piece probabilities, M-step re-normalizes piece
    counts, a coordinate ascent whose corpus log-likelihood is
    non-decreasing (asserted in tests), (3) prune to ``vocab_size`` by
    likelihood LOSS — a piece's loss is its usage count times the gap
    between its own log-prob and its best re-segmentation without
    itself (pieces whose removal costs nothing go first, SentencePiece's
    rule), then (4) one final EM pass on the pruned vocab.  Returns
    [(piece, logprob), …] sorted by (logprob desc, piece asc) —
    deterministic end-to-end: no RNG anywhere, all ties broken
    lexically.

    Scale shape (Heaps-bounded like ``bpe_train``): substring seeding is
    one explode + partial-combine hash agg over the WORD table with a
    TakeOrderedAndProject top-S; each E-step is one Arrow-batched pass
    over the word table with the piece table (≤ seed_size rows, KBs)
    shipped in the task closure; only vocab-sized count rows ever reach
    the driver — the corpus itself is touched once, to build the word
    table.  The per-batch segmentation is the VECTORIZED trellis
    (``_estep_batch``, r9): length-grouped packed-int DP + lockstep
    backtrack + bincount, measured 2.8× over the scalar per-word loop
    on a 46k-word vocabulary with integer-identical piece counts.

    Driver EM fast path (r10, VERDICT #8): when the distinct-word
    table fits ``driver_em_max_words`` (decide-and-use
    ``limit(cap+1).collect()`` — one execution both decides the path
    and feeds the loop, the ClusterStore pattern), the substring
    seeding census and every EM round run driver-side through the SAME
    ``_estep_batch`` kernel — zero Spark jobs per round instead of one
    mapInPandas + aggregate + collect each.  Counts are integer sums
    either way and seeding replicates the exact (freq desc, piece asc)
    order, so the returned piece table is byte-identical to the
    distributed path (pinned by pytest).  MEASURED (sf0.1, 4+1 EM
    passes + seeding): trainer 8.7-11.3 s warm → ~2.7 s.  The r9
    verdict's word-level skip ("rescore only words whose candidate
    piece set changed") was evaluated and REJECTED as inexact: pruning
    renormalizes the survivors, shifting every logp by the same
    constant, and a uniform per-piece shift can flip the Viterbi
    argmax toward more-piece segmentations even for words whose
    candidates all survived — skipping them is not byte-identical.
    The measured cost on Heaps-bounded word tables is per-round JOB
    overhead, which this path removes; above the cap the distributed
    path is unchanged."""
    import math

    import pandas as pd

    from crick_spark.functions.skew import ensure_scan_parallelism

    if int(em_rounds) < 1:
        # the prune loop consumes the E-step's piece usage counts, so at
        # least one EM round must run (em_rounds=0 would hit them
        # unbound — r10 VERDICT #3: fail as a contract, not a NameError)
        raise ValueError(f"em_rounds must be >= 1, got {em_rounds}")
    words = (
        ensure_scan_parallelism(docs)
        .select(F.explode(lower_tokens_expr(F.col(text_col))).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").alias("wfreq"))
        .localCheckpoint(eager=True)
    )
    cap = int(driver_em_max_words)
    head = words.limit(cap + 1).collect() if cap > 0 else None
    if head is not None and len(head) <= cap:
        return _unigram_lm_train_driver(
            [(r["word"], int(r["wfreq"])) for r in head],
            vocab_size,
            seed_size,
            max_piece_len,
            em_rounds,
            stats,
        )
    # candidate substrings: all (start, len<=max_piece_len) windows of
    # every distinct word, weighted by word frequency — flatten of a
    # nested transform, pure codegen
    subs = words.select(
        "wfreq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(max_piece_len)),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda l: F.col("word").substr(i, l),
                    ),
                )
            )
        ).alias("piece"),
    )
    pc = subs.groupBy("piece").agg(F.sum("wfreq").alias("freq"))
    seed_rows = (
        pc.orderBy(F.desc("freq"), F.asc("piece")).limit(int(seed_size)).collect()
    )
    char_rows = pc.where(F.length("piece") == 1).collect()
    freqs: dict[str, int] = {r["piece"]: int(r["freq"]) for r in char_rows}
    for r in seed_rows:
        freqs.setdefault(r["piece"], int(r["freq"]))
    chars = {p for p in freqs if len(p) == 1}

    def normalize(fr: dict) -> dict:
        total = float(sum(fr.values()))
        return {p: math.log(c / total) for p, c in fr.items() if c > 0}

    logp = normalize(freqs)
    loglik_trace: list[float] = []

    def em_pass(logp_in: dict) -> tuple[dict, float]:
        """One hard-EM iteration over the distributed word table:
        returns (new counts, corpus log-likelihood under logp_in)."""
        lp = dict(logp_in)
        ml = int(max_piece_len)

        def estep(pdfs):
            for pdf in pdfs:
                # vectorized trellis + lockstep backtrack + bincount
                # over the whole Arrow batch (r9): byte-identical to
                # the scalar per-word _viterbi loop it replaced
                counts, ll = _estep_batch(
                    pdf["word"].tolist(), pdf["wfreq"].to_numpy(), lp, ml
                )
                yield pd.DataFrame(
                    {
                        "piece": list(counts) + ["\x00ll"],
                        "cnt": list(counts.values()) + [0],
                        "ll": [0.0] * len(counts) + [ll],
                    }
                )

        agg = (
            words.mapInPandas(estep, "piece string, cnt long, ll double")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("cnt"), F.sum("ll").alias("ll"))
            .collect()
        )
        new_counts: dict[str, int] = {}
        total_ll = 0.0
        for r in agg:
            if r["piece"] == "\x00ll":
                total_ll = float(r["ll"])
            else:
                new_counts[r["piece"]] = int(r["cnt"])
        # coverage floor: characters never leave the vocabulary, even at
        # zero count (they anchor segmentation of unseen words)
        for c in chars:
            new_counts.setdefault(c, 1)
        return new_counts, total_ll

    for _ in range(int(em_rounds)):
        counts, ll = em_pass(logp)
        loglik_trace.append(ll)
        logp = normalize(counts)

    # prune multi-char pieces by likelihood loss: usage * (own logprob -
    # best alternative segmentation without self); chars are kept
    # unconditionally.  Driver-side over the vocab table only.
    multi = [p for p in logp if len(p) > 1]
    losses = []
    for p in multi:
        # exclude the piece by pop/restore instead of copying the whole
        # table per piece (r9: the copy made the prune loop O(V²) dict
        # work at seed-size vocabularies; identical lookups either way)
        own = logp.pop(p)
        _, alt = _viterbi(p, logp, int(max_piece_len))
        logp[p] = own
        used = counts.get(p, 0)
        losses.append((used * (own - alt), p))
    losses.sort(key=lambda t: (-t[0], t[1]))
    keep_multi = {p for _, p in losses[: max(0, int(vocab_size) - len(chars))]}
    pruned = {
        p: c for p, c in counts.items() if p in keep_multi or len(p) == 1
    }
    logp = normalize(pruned)
    counts, ll = em_pass(logp)
    loglik_trace.append(ll)
    logp = normalize(counts)

    if stats is not None:
        stats["loglik_trace"] = loglik_trace
        stats["n_pieces"] = len(logp)
        stats["n_chars"] = len(chars)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def bigram_lm_scores(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
):
    """CCNet-style LM quality scoring with a corpus-trained bigram model:
    per doc the mean log-probability of its word bigrams under the
    interpolated model  P(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/T
    (c(w1) is the plain unigram occurrence count — the standard MLE
    context approximation; T = total tokens).  Low avg_logp = text the
    corpus model finds surprising — the perplexity-bucket signal LLM
    curation pipelines (CCNet, Gopher) filter on.

    Emits (id, n_bigrams, avg_logp); docs with < 2 tokens drop out.

    Scale shape: the model tables are Heaps-law-bounded (|bigrams|,
    |vocab| rows — NOT corpus-sized), so scoring is the exploded doc
    bigrams equi-joined to two count tables plus a 1-row broadcast of T,
    then one per-doc aggregate.  Everything is codegen; no Python.
    """
    from crick_spark.pipeline.retrieval import tokens_expr

    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"),
        F.slice(toks, 2, n - 1).alias("w2"),
    )
    bigrams = (
        docs.where(n >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    tokens = docs.select(F.explode(toks).alias("w"))
    uni = tokens.groupBy("w").agg(F.count("*").alias("c"))
    total = tokens.agg(F.count("*").cast("double").alias("t_tokens"))
    big = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))

    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    # r15 (guide §2.3): model folded into ONE per-bigram-type logp table
    # (type-level joins over Heaps-bounded relations), corpus-sized
    # occurrence rows joined ONCE instead of three times — same
    # expression over the same per-type inputs, values unchanged (the
    # kneser_ney_bigram_scores refactor, same shape)
    bglp = (
        big.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.log(
                F.lit(lam) * F.col("c12") / F.col("c1")
                + F.lit(1.0 - lam) * F.col("c2") / F.col("t_tokens")
            ).alias("logp"),
        )
    )
    scored = bigrams.join(bglp, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )


def kneser_ney_bigram_scores(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
):
    """Per-doc mean log-probability under a corpus-trained
    interpolated-Kneser-Ney bigram model — the smoothing family KenLM
    implements and CCNet's perplexity buckets actually use (the plain
    interpolated model of ``bigram_lm_scores`` backs off to raw unigram
    FREQUENCY; KN backs off to CONTINUATION probability, which stops
    frequent-but-contextually-bound words like "Francisco" from
    inflating unseen-bigram scores):

        P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1)
                 + D·N1+(w1,·)/c(w1) · P_cont(w2)
        P_cont(w2) = N1+(·,w2) / N1+(·,·)

    with D = ``discount`` (0.75, the textbook value), N1+(w1,·) the
    number of distinct continuations of w1, N1+(·,w2) the number of
    distinct left contexts of w2, N1+(·,·) the number of distinct
    bigram types.  Every scored bigram was seen in training (the model
    trains on the corpus being scored, CCNet-style), so c(w1) ≥ 1 and
    no zero-denominator guard is needed; the formula is exercised on
    both its branches because c12 = 1 bigrams (the Heaps-law majority)
    score almost entirely through the continuation term.

    Emits (id, n_bigrams, avg_logp); docs with < 2 tokens drop out.
    Scale shape identical to ``bigram_lm_scores``: all model tables are
    type-counted (Heaps-bounded — |bigram types|, |vocab| rows, never
    corpus-sized), scoring is equi-joins plus one per-doc aggregate,
    everything codegen.  Fully SQL-expressible → value-oracled.
    """
    from crick_spark.pipeline.retrieval import tokens_expr

    D = float(discount)
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"),
        F.slice(toks, 2, n - 1).alias("w2"),
    )
    bigrams = (
        docs.where(n >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    big = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count("*").alias("n_cont"),  # N1+(w1, ·): distinct continuations
    )
    # token counts from the bigram table, so c(w1) matches the CONTEXT
    # occurrence count (last token of a doc is never a context)
    cont = big.groupBy("w2").agg(F.count("*").alias("n_left"))  # N1+(·, w2)
    n_types = big.agg(F.count("*").cast("double").alias("n_types"))
    # r15 (guide §2.3 — shuffle fewer bytes): fold the model into ONE
    # per-bigram-TYPE logp table first (type-level joins over the
    # Heaps-bounded big/c1/cont relations), then join the corpus-sized
    # occurrence relation ONCE instead of three times — the pre-r15
    # plan shipped every occurrence row through the big, c1 AND cont
    # joins.  logp is the identical expression over identical inputs
    # per type, so every occurrence row carries the same double as
    # before and the per-doc averages are unchanged (oracle-verified at
    # sf0.01 and sf0.1).
    bglp = (
        big.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(n_types))
        .select(
            "w1",
            "w2",
            F.log(
                F.greatest(F.col("c12") - F.lit(D), F.lit(0.0)) / F.col("c1")
                + F.lit(D)
                * F.col("n_cont")
                / F.col("c1")
                * (F.col("n_left") / F.col("n_types"))
            ).alias("logp"),
        )
    )
    scored = bigrams.join(bglp, ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("logp"), 6).alias("avg_logp"),
    )


def perplexity_buckets(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    cut_head: float = 1.0 / 3.0,
    cut_middle: float = 2.0 / 3.0,
    discount: float = 0.75,
):
    """CCNet's head/middle/tail perplexity bucketing — the artifact its
    pipeline actually ships: every doc scored under the corpus-trained
    Kneser-Ney bigram model (``kneser_ney_bigram_scores``), then split
    at the corpus's own avg-logp terciles.  ``head`` = most fluent
    (highest mean log-prob / lowest perplexity), the slice CCNet keeps
    preferentially for LM training; ``tail`` = the most surprising
    text.  Cut points are exact corpus quantiles (percentile_cont
    semantics, interpolated), computed as a 2-value aggregate broadcast
    back — no per-row rank window, so the bucketing adds one tiny
    aggregate to the scoring plan.  Docs with < 2 tokens (no bigrams)
    drop out, as in the scorer.

    Emits (id, n_bigrams, avg_logp, bucket ∈ {'head','middle','tail'});
    boundary docs land in the EARLIER bucket (avg_logp ≥ cut → head,
    matching percentile interpolation on both engines).
    """
    scores = kneser_ney_bigram_scores(docs, id_col, text_col, discount)
    # r14 (guide §2.4 / §5.4): scores feeds BOTH the tercile-cut
    # aggregate and the final bucketing select; without materialization
    # the whole KN-model subtree (explode → 3 model joins, 8 exchanges)
    # is planned — and its broadcast branches executed — twice per run
    # (17-exchange plan).  A LAZY localCheckpoint materializes the
    # per-doc score rows on the first action and reuses them for the
    # second consumer: 2.2 s → 1.7 s at sf0.1, plan 17 → 9 exchanges.
    # Size shape at 100 TB: one ~20-byte row per scored doc (id,
    # n_bigrams, avg_logp) — corpus-cardinality but payload-free, the
    # same class as the CC label vectors this codebase already
    # checkpoints; MEMORY_AND_DISK spills safely.  Lazy (eager=False)
    # so plan construction stays side-effect-free for preflight.
    scores = scores.localCheckpoint(eager=False)
    cuts = scores.agg(
        F.expr(f"percentile(avg_logp, {1.0 - cut_head})").alias("__h__"),
        F.expr(f"percentile(avg_logp, {1.0 - cut_middle})").alias("__m__"),
    )
    return (
        scores.crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            "n_bigrams",
            "avg_logp",
            F.when(F.col("avg_logp") >= F.col("__h__"), F.lit("head"))
            .when(F.col("avg_logp") >= F.col("__m__"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def bpe_encode(
    docs,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """APPLY step of BPE: tokenize every document with a learned merge
    list (``bpe_train``'s output) — the encode half of the tokenizer
    story, train's symmetric twin exactly as ``remove_repeated_spans``
    is detection's.

    Standard rank-priority encoding: each word starts as characters;
    repeatedly merge the adjacent pair with the LOWEST merge rank until
    none applies — byte-identical to replaying the merges in training
    order.  The corpus is never encoded row by row: the DISTINCT word
    table (Heaps-law ≪ corpus) is encoded once in an Arrow-batched
    kernel with the vocab-sized merge list in the closure, then docs
    rebuild their token sequences by joining words back positionally
    (posexplode → join → flatten ordered by position).

    Emits (id, n_words, n_tokens, tokens array<string>); empty docs
    emit empty arrays.  Lowercased words, matching the trainer's
    ``lower_tokens_expr`` — encode must see the trainer's distribution.
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    rank = {(l, r): i for i, (l, r, *_) in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            best, best_rank = -1, None
            for i in range(len(syms) - 1):
                rk = rank.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best, best_rank = i, rk
            if best_rank is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return syms

    @F.pandas_udf(ArrayType(StringType()))
    def encode(words: pd.Series) -> pd.Series:
        return words.map(encode_word)

    wpos = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            lower_tokens_expr(F.col(text_col))
        ).alias("__pos__", "__w__"),
    )
    vocab = wpos.select("__w__").where(F.col("__w__").isNotNull()).distinct()
    encoded = vocab.withColumn("__toks__", encode(F.col("__w__")))
    joined = wpos.join(encoded, "__w__", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.array_compact(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("__pos__"), F.col("__toks__"))
                        )
                    ).getField("__toks__")
                )
            ).alias("tokens"),
            F.count(F.col("__w__")).alias("n_words"),
        )
        .select(
            id_col,
            "n_words",
            F.size("tokens").alias("n_tokens"),
            "tokens",
        )
    )


def unigram_encode(
    docs,
    model: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """APPLY step of the unigram LM: tokenize every document with a
    trained piece table (``unigram_lm_train``'s output) by Viterbi
    segmentation — the encode half of the SECOND tokenizer family,
    completing its train→encode loop exactly as ``bpe_encode`` does for
    BPE.

    Each word takes its maximum-likelihood segmentation under the piece
    log-probs (same ``_viterbi`` kernel as training's E-step, so encode
    is byte-consistent with what EM optimized; deterministic tie-break
    keeps the shortest-piece path).  Out-of-vocabulary CHARACTERS
    (impossible when encoding the training corpus — single chars are
    seeded unconditionally — but possible on held-out text) fall back
    to single-char pieces so every word still segments losslessly.

    The corpus is never encoded row by row: the DISTINCT word table
    (Heaps-law ≪ corpus) is encoded once in an Arrow-batched kernel
    with the vocab-sized piece table in the closure, then docs rebuild
    their token sequences positionally (posexplode → join → flatten) —
    the identical plan shape as ``bpe_encode``.

    Emits (id, n_words, n_tokens, tokens array<string>); empty docs
    emit empty arrays.
    """
    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType

    logp = dict(model)
    max_len = max((len(p) for p in logp), default=1)

    def encode_word(word: str) -> list[str]:
        lp = logp
        if any(c not in lp for c in word):
            # held-out chars: extend the table with a floor prob so the
            # DP still covers every position (lossless fallback)
            floor = min(lp.values(), default=0.0) - 1.0
            lp = dict(lp)
            for c in word:
                lp.setdefault(c, floor)
        pieces, _ = _viterbi(word, lp, max_len)
        return pieces

    @F.pandas_udf(ArrayType(StringType()))
    def encode(words: pd.Series) -> pd.Series:
        return words.map(encode_word)

    wpos = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            lower_tokens_expr(F.col(text_col))
        ).alias("__pos__", "__w__"),
    )
    vocab = wpos.select("__w__").where(F.col("__w__").isNotNull()).distinct()
    encoded = vocab.withColumn("__toks__", encode(F.col("__w__")))
    joined = wpos.join(encoded, "__w__", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.array_compact(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("__pos__"), F.col("__toks__"))
                        )
                    ).getField("__toks__")
                )
            ).alias("tokens"),
            F.count(F.col("__w__")).alias("n_words"),
        )
        .select(
            id_col,
            "n_words",
            F.size("tokens").alias("n_tokens"),
            "tokens",
        )
    )
