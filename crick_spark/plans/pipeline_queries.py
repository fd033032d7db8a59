"""LLM-data-pipeline queries (SURVEY §7.4): dedup, similarity search, text
analysis, multimodal — over the driver's documents/embeddings tables.

Oracle-able entries (exact, deterministic in both engines): exact dedup,
token/quality stats, marker-vote language ID, embedding norms, brute-force
cosine top-k.  Hash-based
operators (MinHash/SimHash/fingerprints use Spark's xxhash64, which DuckDB
can't reproduce) and the ANN path keep rows-only headliners, but each has
a hash-matched quality twin in the registry (``minhash_recall_high_jaccard``,
``simhash_finds_exact_dups``, ``knn_lsh_recall_vs_exact``,
``knn_ivf_recall_vs_exact``) plus accuracy assertions in
``tests/test_pipeline.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from crick_spark.pipeline.dedup import (
    decontaminate,
    exact_dedup,
    jaccard_ngram_pairs,
    near_dup_pairs,
    simhash_near_dup_pairs,
)
from crick_spark.pipeline.similarity import (
    bulk_cosine_topk,
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_ann_topk,
    lsh_bulk_topk,
)
from crick_spark.pipeline.text import (
    doc_fingerprint_expr,
    lang_id_expr,
    quality_exprs,
    repetition_exprs,
    token_count_exprs,
)
from crick_spark.pipeline.multimodal import attach_fake_media, extract_image_features
from crick_spark.plans.registry import register
from crick_spark.sources.tables import load_table
from crick_spark.tmpdirs import run_tmpdir


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_documents",
    oracle="""
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_cnt
FROM documents GROUP BY md5(text)
""",
    doc="Exact content dedup: hash-groupBy, keep min id (16-byte hash "
    "shuffles, never the text).",
)
def dedup_exact_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", ["text"])


@register(
    "minhash_near_dup_pairs",
    doc="MinHash(64)+LSH(16×4) near-dup pairs, exact-Jaccard verified ≥0.7 "
    "(shingle→minhash→band→bucket-join→verify); xxhash64-based → rows-only; "
    "recall/precision asserted in tests vs exact pairwise Jaccard.",
)
def minhash_near_dup_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return near_dup_pairs(docs, "doc_id", "text", threshold=0.7)


@register(
    "jaccard_ngram_dup_pairs",
    oracle=r"""
WITH s AS (
  SELECT doc_id, lang,
    CASE WHEN len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2),
             i -> array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+')[i:i+2], ' ')))
      ELSE [array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+'), ' ')]
    END AS sh
  FROM documents
)
SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
           / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
) WHERE j >= 0.5
""",
    doc="Exact 3-gram Jaccard duplicate pairs (≥0.5) blocked by language — "
    "the deterministic ground truth the MinHash/SimHash paths approximate; "
    "size-ratio prune before the set intersection.",
)
def jaccard_ngram_dup_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    )


@register(
    "pack_training_sequences",
    oracle=r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
  FROM documents
),
n AS (
  SELECT doc_id, len(words) AS nw,
         CAST(ceil(greatest(len(words) - 8, 1) / 24.0) AS INT) AS n_chunks
  FROM w
),
c AS (
  SELECT doc_id, i - 1 AS chunk_idx, least(nw - (i - 1) * 24, 32) AS n_chunk_tokens
  FROM n, unnest(generate_series(1, n_chunks)) AS t(i)
),
p AS (
  SELECT doc_id % 64 AS shard, doc_id, n_chunk_tokens,
         CAST(floor((sum(n_chunk_tokens)
                       OVER (PARTITION BY doc_id % 64 ORDER BY doc_id, chunk_idx
                             ROWS UNBOUNDED PRECEDING)
                     - n_chunk_tokens) / 2048.0) AS BIGINT) AS seq_id
  FROM c
)
SELECT shard, seq_id, count(*) AS n_chunks,
       CAST(sum(n_chunk_tokens) AS BIGINT) AS seq_tokens,
       count(DISTINCT doc_id) AS n_docs
FROM p GROUP BY shard, seq_id
""",
    doc="Sequence packing — the step between chunking and batch assembly "
    "in an LLM training-data pipeline: chunks are concatenated per shard "
    "(doc_id mod 64; shards map to output training files) and binned "
    "into 2048-token sequences by the deterministic concat-and-bin rule "
    "seq = ⌊tokens_before / budget⌋, so a sequence overflows by at most "
    "one chunk (chunks are never split; exact first-fit is inherently "
    "sequential).  Per-shard windows → 64 independent sorts, no global "
    "ordering — the shape that scales.  Fully value-oracled: the rollup "
    "(chunks, tokens, docs per sequence) hash-matches the identical "
    "window arithmetic in DuckDB; fill bounds asserted in tests.",
)
def pack_training_sequences(spark, sf_dir):
    from crick_spark.pipeline.text import chunk_exprs, pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id", F.explode(chunk_exprs(F.col("text"), 32, 8)).alias("ch")
    ).select(
        "doc_id",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.n_chunk_tokens").alias("n_chunk_tokens"),
    )
    packed = pack_sequences(chunks, max_tokens=2048, n_shards=64)
    return packed.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("seq_tokens"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


@register(
    "minhash_recall_high_jaccard",
    oracle=r"""
WITH s AS (
  SELECT doc_id, lang,
    CASE WHEN len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2),
             i -> array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+')[i:i+2], ' ')))
      ELSE [array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+'), ' ')]
    END AS sh
  FROM documents
)
SELECT count(*) AS n_high_pairs, TRUE AS all_found_by_lsh FROM (
  SELECT 1
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.85
)
""",
    doc="MinHash/LSH recall cross-validation, hash-matched: every exact "
    "pair with 3-gram Jaccard ≥ 0.85 (the DuckDB-computable ground "
    "truth; count rides along and hash-matches) must appear in the LSH "
    "candidate set — at J=0.85 a 16-band×4-row scheme misses with "
    "probability (1−J⁴)¹⁶ ≈ 8·10⁻⁶, so all_found_by_lsh is "
    "deterministically TRUE in practice.  This is the driver-visible "
    "recall statement for the rows-only minhash_near_dup_pairs headline.",
)
def minhash_recall_high_jaccard(spark, sf_dir):
    from crick_spark.pipeline.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    exact_high = jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.85, n=3
    ).select("id_a", "id_b")
    cand = lsh_candidate_pairs(
        minhash_signatures(docs, "doc_id", "text"), "doc_id"
    )
    missed = exact_high.join(cand, ["id_a", "id_b"], "left_anti")
    return exact_high.agg(F.count("*").alias("n_high_pairs")).crossJoin(
        missed.agg((F.count("*") == 0).alias("all_found_by_lsh"))
    )


@register(
    "simhash_finds_exact_dups",
    oracle="""
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE trim(coalesce(text, '')) <> ''
)
SELECT count(*) AS n_exact_dup_pairs,
       TRUE AS all_found_at_hamming_0
FROM d a JOIN d b
  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
""",
    doc="SimHash recall cross-validation, hash-matched (the minhash twin's "
    "counterpart): every pair of byte-identical TOKEN-BEARING documents "
    "— the DuckDB-computable ground truth via md5(text), count rides "
    "along — must appear in the SimHash near-dup pair set at hamming "
    "distance 0 (identical word multisets give identical fingerprints, "
    "so this is deterministic).  Token-less docs (NULL/empty/whitespace "
    "text) are excluded on BOTH sides: they emit no SimHash fingerprint "
    "at all, so a fixture with two of them would otherwise break the "
    "recall statement vacuously.  The driver-visible recall statement "
    "for the rows-only simhash_near_dup_pairs headline.",
)
def simhash_finds_exact_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(
        F.trim(F.coalesce(F.col("text"), F.lit(""))) != ""
    )
    keyed = docs.select("doc_id", F.md5(F.col("text")).alias("tkey"))
    a, b = keyed.alias("a"), keyed.alias("b")
    exact = a.join(
        b,
        (F.col("a.tkey") == F.col("b.tkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
    )
    found0 = simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3).where(
        F.col("hamming") == 0
    ).select("id_a", "id_b")
    missed = exact.join(found0, ["id_a", "id_b"], "left_anti")
    return exact.agg(F.count("*").alias("n_exact_dup_pairs")).crossJoin(
        missed.agg((F.count("*") == 0).alias("all_found_at_hamming_0"))
    )


@register(
    "simhash_near_dup_pairs",
    doc="SimHash-64 near-dup pairs (hamming ≤ 3) with 16-bit chunk blocking.",
)
def simhash_near_dup_pairs_q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3)


@register(
    "decontaminate_documents",
    oracle=r"""
WITH s AS (
  SELECT doc_id,
    CASE WHEN len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 3 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 3),
             i -> array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+')[i:i+3], ' ')))
      ELSE [array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+'), ' ')]
    END AS sh
  FROM documents
),
e AS (SELECT DISTINCT unnest(sh) AS gram FROM s WHERE doc_id % 97 = 0),
c AS (SELECT doc_id, len(sh) AS total_grams, unnest(sh) AS gram
      FROM s WHERE doc_id % 97 != 0)
SELECT c.doc_id, count(*) AS hit_grams,
       any_value(c.total_grams) AS total_grams,
       round(count(*)::DOUBLE / any_value(c.total_grams), 6) AS contam_frac
FROM c JOIN e USING (gram)
GROUP BY c.doc_id
""",
    doc="Benchmark decontamination: corpus docs sharing >=1 distinct word "
    "4-gram with the eval split (doc_id % 97 = 0 stands in for the "
    "benchmark set).  Eval gram set is broadcast; corpus side is the "
    "shared hashed-posting scan — no corpus shuffle by gram.",
)
def decontaminate_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return decontaminate(corpus, ev, "doc_id", "text", n=4, min_hits=1)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@register(
    "repetition_filter_documents",
    oracle=r"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, lang, len(toks) AS n_tokens,
    round(CASE WHEN len(toks) - 1 >= 1
      THEN 1.0 - len(list_distinct(list_transform(
             generate_series(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1])))::DOUBLE / (len(toks) - 1)
      ELSE 0.0 END, 6) AS dup_2gram_frac,
    round((SELECT max(cnt)::DOUBLE FROM (
             SELECT count(*) AS cnt FROM unnest(toks) AS u(tok) GROUP BY tok))
          / len(toks), 6) AS top_token_frac
  FROM t
)
SELECT doc_id, lang, n_tokens, dup_2gram_frac, top_token_frac
FROM m WHERE dup_2gram_frac > 0.08 OR top_token_frac > 0.18
""",
    doc="Gopher-style repetition filter: flag docs with duplicate-2-gram "
    "fraction > 0.08 or top-token fraction > 0.18 — pure per-row "
    "expressions, runs at scan speed.",
)
def repetition_filter_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select("doc_id", "lang", *repetition_exprs(F.col("text")))
    return m.where(
        (F.col("dup_2gram_frac") > 0.08) | (F.col("top_token_frac") > 0.18)
    )


@register(
    "token_stats_by_lang",
    oracle=r"""
WITH t AS (
  SELECT lang,
         len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
         length(regexp_replace(text, '\s+', '', 'g')) AS non_ws_chars
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
       round(avg(ws_tokens), 6) AS avg_tokens,
       round(avg(non_ws_chars), 6) AS avg_non_ws_chars
FROM t GROUP BY lang
""",
    doc="Whitespace token counting rolled up per language.",
)
def token_stats_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", *token_count_exprs(F.col("text")))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("total_tokens"),
        F.round(F.avg("ws_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("non_ws_chars"), 6).alias("avg_non_ws_chars"),
    )


@register(
    "text_quality_by_lang",
    oracle=r"""
WITH t AS (
  SELECT lang,
         length(text) AS n_chars_q,
         len(string_split_regex(trim(text), '\s+')) AS n_words,
         CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                                      w -> length(w))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS avg_word_len,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\s+')) AS type_token_ratio
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       round(avg(n_chars_q), 6) AS avg_chars,
       round(avg(avg_word_len), 6) AS avg_word_len,
       round(avg(type_token_ratio), 6) AS avg_ttr
FROM t GROUP BY lang
""",
    doc="Quality heuristics (length, avg word length, type-token ratio) "
    "per language — corpus-filtering features at scan speed.",
)
def text_quality_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", *quality_exprs(F.col("text")))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars_q"), 6).alias("avg_chars"),
        F.round(F.avg("avg_word_len"), 6).alias("avg_word_len"),
        F.round(F.avg("type_token_ratio"), 6).alias("avg_ttr"),
    )


def _lang_id_oracle() -> str:
    """DuckDB twin of ``lang_id_expr``, generated from the same
    ``_LANG_MARKERS`` table so the two can never drift: distinct-marker
    votes (``list_intersect`` dedups exactly like Spark's
    ``array_intersect``), argmax with earliest-language tie-break, 'und'
    on zero votes."""
    from crick_spark.pipeline.text import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    scores = ",\n         ".join(
        "len(list_intersect(ws, [{}])) AS s_{}".format(
            ", ".join("'%s'" % m for m in _LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    best = "greatest({})".format(", ".join(f"s_{l}" for l in langs))
    whens = "\n              ".join(
        f"WHEN s_{l} = best THEN '{l}'" for l in langs
    )
    return rf"""
WITH w AS (
  SELECT lang,
         list_transform(string_split_regex(trim(text), '\s+'),
                        x -> lower(x)) AS ws
  FROM documents
), s AS (
  SELECT lang,
         {scores}
  FROM w
), b AS (
  SELECT *, {best} AS best FROM s
), p AS (
  SELECT lang,
         CASE WHEN best = 0 THEN 'und'
              {whens}
              ELSE 'und' END AS predicted
  FROM b
)
SELECT lang, predicted, count(*) AS cnt FROM p GROUP BY lang, predicted
"""


@register(
    "lang_id_documents",
    oracle=_lang_id_oracle(),
    doc="Marker-lexicon language ID votes per document, rolled up into a "
    "predicted×labeled confusion table.  Fully deterministic (distinct-"
    "marker votes, earliest-language tie-break) so the oracle is generated "
    "from the same marker table; classification accuracy on separable "
    "fixtures is additionally exercised in tests.",
)
def lang_id_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id_expr(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "doc_fingerprints",
    oracle="""
SELECT count(*) AS n_docs,
       count(DISTINCT md5(coalesce(text, ''))) AS n_distinct_texts,
       TRUE AS exact_dups_share_fingerprint
FROM documents
""",
    doc="Min-k rolling-hash fingerprints (bottom-k sketch per doc).  "
    "Hash-matched boolean oracle: fingerprints are a pure function of "
    "text, so every group of byte-identical texts (keyed by md5, which "
    "DuckDB computes too) must carry exactly ONE distinct fingerprint — "
    "emitted beside the exact doc/text counts.  The xxhash64 fingerprint "
    "VALUES stay Spark-only; their collision statistics are what near-dup "
    "tests consume.",
)
def doc_fingerprints(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # fingerprint the SAME normalization the group key uses
    # (coalesce(text, '')): NULL-text and empty-text docs share an md5
    # key, so they must also share a fingerprint or the invariant
    # breaks on fixtures containing both
    fp = docs.select(
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("tkey"),
        F.coalesce(
            doc_fingerprint_expr(
                F.coalesce(F.col("text"), F.lit(""))
            ).cast("string"),
            F.lit("∅"),
        ).alias("fp"),
    )
    per_text = fp.groupBy("tkey").agg(
        F.count("*").alias("nd"), F.count_distinct("fp").alias("nfp")
    )
    return per_text.agg(
        F.sum("nd").alias("n_docs"),
        F.count("*").alias("n_distinct_texts"),
        (F.max("nfp") <= 1).alias("exact_dups_share_fingerprint"),
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
_KNN_ORACLE = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(
           list_sum(list_transform(list_zip(e.embedding, q.qe),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
              * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))),
           6) AS cosine
  FROM embeddings e, q
)
SELECT vec_id, cosine FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rk
  FROM scored
) WHERE rk <= 10
"""


@register(
    "knn_bruteforce_cosine",
    oracle=_KNN_ORACLE,
    doc="Brute-force cosine top-10 neighbors of vec 0 — exact ANN baseline, "
    "zip_with/aggregate fold in codegen (no UDF).",
)
def knn_bruteforce_cosine(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    out = cosine_topk(emb, list(query), k=10)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


@register(
    "knn_lsh_ann",
    doc="LSH-bucketed ANN (12-bit hyperplane fingerprint, hamming-1 "
    "multiprobe, exact rerank) — the 100 TB path; recall vs brute force "
    "asserted in tests.",
)
def knn_lsh_ann(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    # nbits sized to corpus: ~2^6 buckets for O(500) vectors; at 10^9+
    # vectors use 16-24 bits so candidate sets stay small
    out = lsh_ann_topk(emb, list(query), k=10, nbits=6, num_tables=8)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


@register(
    "knn_lsh_recall_vs_exact",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id, TRUE AS recall_ok
""",
    doc="ANN quality gate, hash-matched boolean oracle (the rows-only→"
    "oracle promotion pattern): recall@10 of the LSH-bucketed ANN vs the "
    "exact brute-force top-10, for 5 query vectors in ONE job (the exact "
    "and ANN top-k subplans union with a query_id tag and join on "
    "(query_id, vec_id)).  Measured per-query recall 0.8–1.0 at sf0.01; "
    "asserted ≥0.5 per query and ≥0.7 on average — margins sized to "
    "survive testdata regeneration.  An at-scale eval harness would "
    "batch all queries through one matmul (lsh_buckets_udf already "
    "vectorizes per Arrow batch); the per-query union here keeps the "
    "fixture plan simple.",
)
def knn_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return _ann_recall_gate(
        emb,
        lambda qv: lsh_ann_topk(emb, qv, k=10, nbits=6, num_tables=8),
        per_query_min=0.5,
        avg_min=0.7,
    )


def _ann_recall_gate(
    emb,
    ann_fn,
    per_query_min: float,
    avg_min: float,
    n_queries: int = 5,
    k: int = 10,
):
    """Shared recall@k harness for the ANN gate queries: exact vs ANN
    top-k for the first ``n_queries`` vectors in ONE job.  A query whose
    ANN result has ZERO overlap with the exact top-k still surfaces as a
    recall_ok=false row (left join from the query panel with
    coalesce(recall, 0)), and the overall average runs over the full
    panel — a dropped row would both hide the failure and inflate the
    average."""
    qvecs = {
        r.vec_id: list(r.embedding)
        for r in emb.where(F.col("vec_id") < n_queries).collect()
    }
    exact_all = None
    ann_all = None
    for qid in sorted(qvecs):
        ex = cosine_topk(emb, qvecs[qid], k=k).select(
            F.lit(qid).cast("bigint").alias("query_id"), "vec_id"
        )
        an = ann_fn(qvecs[qid]).select(
            F.lit(qid).cast("bigint").alias("query_id"), "vec_id"
        )
        exact_all = ex if exact_all is None else exact_all.unionByName(ex)
        ann_all = an if ann_all is None else ann_all.unionByName(an)
    hits = (
        exact_all.join(ann_all, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg((F.count("*") / float(k)).alias("recall"))
    )
    panel = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("bigint").alias("query_id")
    )
    full = panel.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("recall", F.lit(0.0)).alias("recall")
    )
    per_query = full.select(
        "query_id", (F.col("recall") >= per_query_min).alias("recall_ok")
    )
    overall = full.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        (F.avg("recall") >= avg_min).alias("recall_ok"),
    )
    return per_query.unionByName(overall)


_KNN_BULK_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(
           list_sum(list_transform(list_zip(e.embedding, q.qe),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
              * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))),
           6) AS cosine
  FROM embeddings e, q
)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""


@register(
    "knn_bulk_bruteforce",
    oracle=_KNN_BULK_ORACLE,
    doc="BULK exact cosine top-10 for a 5-query panel in ONE job "
    "(round 6): broadcast query panel x corpus scan, per-query window "
    "top-k — the exact baseline and recall oracle for the bulk LSH path. "
    "Closes the one-job-per-query gap: every prior ANN entry point took "
    "a single driver-side vector.",
)
def knn_bulk_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return bulk_cosine_topk(queries, emb, k=10)


@register(
    "knn_lsh_bulk",
    doc="Bulk LSH ANN (rows-only headline; hash path — seeded hyperplanes "
    "aren't DuckDB-reproducible): the whole 5-query panel resolves in ONE "
    "job via bucket equi-join on (table, bucket) + grouped Arrow rerank. "
    "Quality twin: knn_lsh_bulk_recall; per-query-path equivalence "
    "asserted in tests/test_pipeline.py on a 20-query panel.",
)
def knn_lsh_bulk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bulk_topk(queries, emb, k=10, nbits=6, num_tables=8)


@register(
    "knn_lsh_bulk_recall",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id, TRUE AS recall_ok
""",
    doc="Bulk-ANN quality gate, hash-matched boolean oracle (same "
    "promotion pattern as knn_lsh_recall_vs_exact, but with NO per-query "
    "driver loop on either side): bulk LSH top-10 vs bulk exact top-10, "
    "each ONE job.  Measured recall 0.92 at sf0.001; asserted >=0.5 per "
    "query and >=0.7 on average — margins sized to survive testdata "
    "regeneration.",
)
def knn_lsh_bulk_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    exact = bulk_cosine_topk(queries, emb, k=10).select("query_id", "vec_id")
    ann = lsh_bulk_topk(queries, emb, k=10, nbits=6, num_tables=8).select(
        "query_id", "vec_id"
    )
    hits = (
        exact.join(ann, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg((F.count("*") / 10.0).alias("recall"))
    )
    panel = queries.select("query_id")
    full = panel.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("recall", F.lit(0.0)).alias("recall")
    )
    per_query = full.select(
        "query_id", (F.col("recall") >= 0.5).alias("recall_ok")
    )
    overall = full.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        (F.avg("recall") >= 0.7).alias("recall_ok"),
    )
    return per_query.unionByName(overall)


@register(
    "embedding_norms_by_label",
    oracle="""
SELECT label,
       count(*) AS n_vecs,
       round(avg(sqrt(list_sum(list_transform(embedding,
                                              x -> CAST(x AS DOUBLE) * x)))), 6)
         AS avg_norm
FROM embeddings GROUP BY label
""",
    doc="L2 norms per label (embedding hygiene check).",
)
def embedding_norms_by_label(spark, sf_dir):
    from crick_spark.pipeline.similarity import norm_expr

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(norm_expr(F.col("embedding"))), 6).alias("avg_norm"),
    )


@register(
    "embedding_near_dup_pairs",
    oracle="""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
)
SELECT id_a, id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (a.nrm * b.nrm) AS c
  FROM n a JOIN n b ON a.vec_id < b.vec_id
) WHERE c >= 0.4
""",
    doc="Exact embedding-cosine near-duplicate pairs (≥0.4) via distributed "
    "block-pair triangle join: O(n·√P) replication, the O(n²) pair space "
    "exists only inside per-task numpy matmuls.",
)
def embedding_near_dup_pairs_q(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4, n_blocks=8)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------
@register(
    "multimodal_feature_stats",
    oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
       END AS kind,
       count(*) AS n_items,
       round(avg(octet_length(encode(coalesce(text, '')))), 6) AS avg_bytes,
       TRUE AS intensity_in_range
FROM documents GROUP BY 1
""",
    doc="Binary media columns + Arrow-batched decode/feature plumbing "
    "(decode stubbed deterministically — no media libs in container; the "
    "Spark-side schema/batching/partitioning is real), rolled up per "
    "kind.  Hash-matched oracle: the PLUMBING outputs are deterministic "
    "— kind assignment (doc_id % 3) and per-kind blob byte sizes "
    "(utf-8 octet length) reproduce exactly in DuckDB — while the "
    "stub-PRNG intensities are checked as a range boolean "
    "(mean ∈ [0,255], std ≥ 0).",
)
def multimodal_feature_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = extract_image_features(media)
    return feats.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        F.min(
            F.col("mean_intensity").between(0.0, 255.0)
            & (F.col("std_intensity") >= 0.0)
        ).alias("intensity_in_range"),
    )


@register(
    "video_frame_samples",
    oracle="""
WITH v AS (
  SELECT doc_id,
         least(8, greatest(CAST(floor(coalesce(n_chars, 0) / 100.0) AS BIGINT),
                           1)) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, n_frames,
       256.0 AS avg_frame_bytes,
       CAST(n_frames - 1 AS DOUBLE) AS last_offset_s
FROM v
""",
    doc="Video frame sampling (1 fps, ≤8 frames/video): decode stubbed, "
    "the 1→N frame-explosion plumbing, timing math, and binary frame "
    "columns are real — and FULLY value-oracled: frame count per video "
    "(min(8, max(⌊duration⌋, 1)) with duration = n_chars/100), constant "
    "256-byte stub frames, and the last frame offset are all "
    "deterministic arithmetic DuckDB reproduces exactly.",
)
def video_frame_samples(spark, sf_dir):
    from crick_spark.pipeline.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    frames = sample_frames(media, fps=1.0, max_frames=8)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.round(F.avg(F.length("frame")), 1).alias("avg_frame_bytes"),
        F.max("t_offset_s").alias("last_offset_s"),
    )


@register(
    "image_decode_features_documents",
    oracle="""
SELECT d.doc_id,
       CAST(107 AS BIGINT) AS n_bytes,
       round(avg((d.doc_id * 7 + t.i * 13) % 256), 6) AS mean_intensity,
       round(stddev_pop((d.doc_id * 7 + t.i * 13) % 256), 6) AS std_intensity
FROM documents d, range(96) t(i)
GROUP BY d.doc_id
""",
    doc="REAL image decode end-to-end (r10, VERDICT #6): every doc gets "
    "genuine binary P6 PPM bytes (8x4 RGB, pixel i = (doc_id*7+i*13)%256, "
    "pipeline/multimodal.py:attach_ppm_media), and the pure-Python "
    "Netpbm/BMP decoder (real_image_decoder) parses them through the "
    "same mapInPandas Decoder seam a production PIL kernel would use — "
    "no stub anywhere in this path.  FULLY value-oracled: the pixel "
    "formula is arithmetic, so DuckDB reproduces per-doc byte size "
    "(11-byte header + 96 payload), mean and population-std intensity "
    "exactly (96 small ints — float64-exact on both engines at the "
    "1e-6 grid).",
)
def image_decode_features_documents(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_ppm_media,
        real_image_decoder,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_ppm_media(docs)
    feats = extract_image_features(media, decoder=real_image_decoder)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.round("std_intensity", 6).alias("std_intensity"),
    )


@register(
    "audio_decode_features_documents",
    oracle="""
SELECT d.doc_id,
       CAST(44 + 2 * (150 + d.doc_id % 100) AS BIGINT) AS n_bytes,
       round((150 + d.doc_id % 100) / 8000.0, 6) AS duration_s,
       round(avg((d.doc_id * 31 + t.i * 131) % 4001 - 2000), 6)
           AS mean_amplitude,
       round(sqrt(avg(pow((d.doc_id * 31 + t.i * 131) % 4001 - 2000, 2))), 6)
           AS rms_amplitude
FROM documents d, range(250) t(i)
WHERE t.i < 150 + d.doc_id % 100
GROUP BY d.doc_id
""",
    doc="REAL audio decode end-to-end (r11, VERDICT #4): every doc gets "
    "genuine RIFF/WAVE 16-bit PCM bytes (doc d carries 150+d%100 samples, "
    "sample i = (d*31+i*131)%4001-2000, multiplexed through "
    "pipeline/multimodal.py:attach_wav_media), and the pure-Python WAV "
    "chunk-walker (wav_info + decode_wav) parses them through the same "
    "mapInPandas Decoder seam a production libsndfile kernel would use — "
    "no stub anywhere in this path.  FULLY value-oracled: byte size "
    "(44-byte canonical header + 2 bytes/sample), header-derived "
    "duration, and mean/RMS amplitude of the decoded stream are all "
    "deterministic arithmetic DuckDB reproduces exactly (int sums are "
    "float64-exact; 1e-6 grid).  Sample count varies per doc, so every "
    "column is value-bearing (VERDICT #7).",
)
def audio_decode_features_documents(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_wav_media,
        extract_audio_features,
        real_audio_decoder,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_wav_media(docs)
    feats = extract_audio_features(media, decoder=real_audio_decoder)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_amplitude", 6).alias("mean_amplitude"),
        F.round("rms_amplitude", 6).alias("rms_amplitude"),
    )


@register(
    "salted_hot_key_agg",
    oracle="""
SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value,
       round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
FROM events GROUP BY event_type
""",
    doc="Salted two-phase aggregation over a 5-distinct-key column: "
    "pre-aggregate on (key, salt) so all cores contribute instead of 5 "
    "reducers — identical results to the direct groupBy (the oracle).",
)
def salted_hot_key_agg(spark, sf_dir):
    from crick_spark.functions.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        [
            ("value", "count", "cnt"),
            ("value", "sum", "sum_value_raw"),
            ("value", "min", "min_value_raw"),
            ("value", "max", "max_value_raw"),
        ],
        n_salts=32,
    )
    return out.select(
        "event_type",
        "cnt",
        F.round("sum_value_raw", 4).alias("sum_value"),
        F.round("min_value_raw", 6).alias("min_value"),
        F.round("max_value_raw", 6).alias("max_value"),
    )


@register(
    "knn_ivf_ann",
    doc="IVF ANN: distributed Lloyd k-means coarse quantizer (16 clusters, "
    "5 iterations — per-iteration shuffle is k×d partial sums, never the "
    "vectors), probe the 4 nearest clusters, exact cosine rerank; recall "
    "vs brute force asserted in tests.",
)
def knn_ivf_ann(spark, sf_dir):
    from crick_spark.pipeline.similarity import ivf_ann_topk, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    centroids = train_ivf_centroids(emb, k=16, n_iter=5)
    out = ivf_ann_topk(emb, list(query), centroids, k=10, nprobe=6)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine"))


@register(
    "knn_ivf_recall_vs_exact",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id, TRUE AS recall_ok
""",
    doc="IVF ANN quality gate, hash-matched boolean oracle (same promotion "
    "pattern as knn_lsh_recall_vs_exact): recall@10 of the IVF search "
    "(16 lists, nprobe=6 — the headline knn_ivf_ann config) vs exact "
    "brute-force top-10 for 5 query vectors.  ANN.md panel: mean 0.74, "
    "min 0.40 over 20 queries at this config, so the gate asserts ≥0.2 "
    "per query and ≥0.5 on average — margins sized to survive testdata "
    "regeneration.  The k-means quantizer is deterministic (seeded init), "
    "so the booleans are stable run-to-run.",
)
def knn_ivf_recall_vs_exact(spark, sf_dir):
    from crick_spark.pipeline.similarity import ivf_ann_topk, train_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=16, n_iter=5)
    return _ann_recall_gate(
        emb,
        lambda qv: ivf_ann_topk(emb, qv, centroids, k=10, nprobe=6),
        per_query_min=0.2,
        avg_min=0.5,
    )


@register(
    "knn_ivf_bulk_recall",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id, TRUE AS recall_ok
""",
    doc="Bulk-IVF quality gate, hash-matched boolean oracle (round 6 — "
    "the IVF twin of knn_lsh_bulk_recall, NO per-query driver loop): "
    "each query's nprobe=6 nearest centroids come from one Arrow matmul "
    "kernel, probes equi-join the cluster-indexed corpus, grouped exact "
    "rerank; compared against the bulk exact panel.  Thresholds follow "
    "knn_ivf_recall_vs_exact (>=0.2 per query, >=0.5 average); "
    "per-query-path equivalence asserted in tests/test_pipeline.py.",
)
def knn_ivf_bulk_recall(spark, sf_dir):
    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=16, n_iter=5)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    exact = bulk_cosine_topk(queries, emb, k=10).select("query_id", "vec_id")
    ann = ivf_bulk_topk(queries, emb, centroids, k=10, nprobe=6).select(
        "query_id", "vec_id"
    )
    hits = (
        exact.join(ann, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg((F.count("*") / 10.0).alias("recall"))
    )
    panel = queries.select("query_id")
    full = panel.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("recall", F.lit(0.0)).alias("recall")
    )
    per_query = full.select(
        "query_id", (F.col("recall") >= 0.2).alias("recall_ok")
    )
    overall = full.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        (F.avg("recall") >= 0.5).alias("recall_ok"),
    )
    return per_query.unionByName(overall)


@register(
    "knn_ivf_layout_prune",
    oracle="SELECT TRUE AS results_match_memory, TRUE AS pruning_effective, "
    "TRUE AS partition_filter_present",
    doc="Write-time IVF layout end-to-end (r7): the corpus is persisted "
    "Hive-partitioned by IVF cluster id (write_ivf_layout - the "
    "inverted file IS the directory layout), then the bulk panel runs "
    "against it with the probed-cluster set applied as a literal isin "
    "on the partition column.  Hash-matched booleans: results are "
    "byte-identical to the in-memory ivf_bulk_topk (same corpus, same "
    "centroids), the probe reads strictly fewer clusters than exist, "
    "and the physical scan carries a PartitionFilter on ivf_cluster - "
    "unprobed clusters' files are never opened.  This is the 100 TB "
    "claim of the IVF docstrings made executable, the ANN analog of "
    "zorder_layout_prune.",
)
def knn_ivf_layout_prune(spark, sf_dir):
    import io
    import shutil
    from contextlib import redirect_stdout

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivf_bulk_topk_from_layout,
        train_ivf_centroids,
        write_ivf_layout,
    )
    from crick_spark.tmpdirs import run_tmpdir

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=16, n_iter=5)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    work = run_tmpdir("crick_ivf_layout_")
    write_ivf_layout(emb, centroids, f"{work}/layout")
    mem = ivf_bulk_topk(queries, emb, centroids, k=10, nprobe=4)
    lay, probed = ivf_bulk_topk_from_layout(
        spark,
        queries,
        f"{work}/layout",
        centroids,
        k=10,
        nprobe=4,
        return_probed=True,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        lay.explain("formatted")
    plan = buf.getvalue()
    # the filter's rendering varies with probe-set size (INSET above
    # the inSetConversionThreshold, IN (…) below it, a plain equality
    # for a single cluster) — only require a PartitionFilters line
    # that mentions the partition column
    has_pf = any(
        "PartitionFilters:" in ln and "ivf_cluster" in ln
        for ln in plan.splitlines()
    )
    # count from the ACTUAL probe list, not the plan rendering
    n_probed = len(probed)
    n_total = (
        spark.read.parquet(f"{work}/layout")
        .select("ivf_cluster")
        .distinct()
        .count()
    )
    diff = mem.exceptAll(lay).unionByName(lay.exceptAll(mem))
    out = diff.agg(F.count("*").alias("__d__")).select(
        (F.col("__d__") == 0).alias("results_match_memory"),
        F.lit(n_probed < n_total).alias("pruning_effective"),
        F.lit(has_pf).alias("partition_filter_present"),
    )
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "ivf_layout_incremental",
    oracle="""
SELECT TRUE AS results_match_full_build,
       TRUE AS resident_files_untouched,
       TRUE AS drift_signal_present,
       count(*) AS rows_indexed
FROM embeddings
""",
    doc="Continuous-ingestion ANN index maintenance (r9): a third of "
    "the corpus builds the IVF layout one-shot, the other two thirds "
    "fold in as micro-batch APPENDS (ivf_layout_append - same frozen "
    "centroid assignment, one new file per touched cluster partition, "
    "resident files never opened).  Hash-matched: panel results over "
    "the appended layout equal the in-memory ivf_bulk_topk over the "
    "full corpus EXACTLY (same centroids => same assignment => same "
    "candidate sets); every pre-append file survives byte-identical "
    "(size+mtime snapshot); each fold reports the mean-top-cosine "
    "drift signal; and rows_indexed hash-matches DuckDB's corpus "
    "count - no row lost or duplicated across the three writes.  At "
    "100 TB this is the difference between re-shuffling the resident "
    "corpus per ingest batch and touching only batch-sized files.",
)
def ivf_layout_incremental(spark, sf_dir):
    import glob
    import os
    import shutil

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivf_bulk_topk_from_layout,
        ivf_layout_append,
        train_ivf_centroids,
        write_ivf_layout,
    )
    from crick_spark.tmpdirs import run_tmpdir

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(emb, k=16, n_iter=5)
    work = run_tmpdir("crick_ivf_inc_")
    path = f"{work}/layout"
    write_ivf_layout(emb.where(F.col("vec_id") % 3 == 0), centroids, path)

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{path}/ivf_cluster=*/*.parquet")
        }

    before = snap()
    stats = [
        ivf_layout_append(
            emb.where(F.col("vec_id") % 3 == m), centroids, path
        )
        for m in (1, 2)
    ]
    after = snap()
    untouched = all(after.get(p) == v for p, v in before.items())
    drift_ok = all(
        s["mean_top_cosine"] is not None and s["rows"] > 0 for s in stats
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    mem = ivf_bulk_topk(queries, emb, centroids, k=10, nprobe=4)
    lay = ivf_bulk_topk_from_layout(
        spark, queries, path, centroids, k=10, nprobe=4
    )
    diff = mem.exceptAll(lay).unionByName(lay.exceptAll(mem))
    rows_indexed = spark.read.parquet(path).count()
    out = diff.agg(F.count("*").alias("__d__")).select(
        (F.col("__d__") == 0).alias("results_match_full_build"),
        F.lit(untouched).alias("resident_files_untouched"),
        F.lit(drift_ok).alias("drift_signal_present"),
        F.lit(rows_indexed).cast("long").alias("rows_indexed"),
    )
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "knn_ivfpq_layout_prune",
    oracle="SELECT TRUE AS results_match_memory, "
    "TRUE AS partition_filter_present, "
    "TRUE AS codes_scan_column_pruned, TRUE AS pruning_effective",
    doc="Write-time IVF-PQ index layout end-to-end (r9): the corpus "
    "persists as (id, vec, codes) Hive-partitioned by coarse cluster "
    "(write_ivfpq_layout), and the bulk panel runs with BOTH physical "
    "pruning levers: the probed-cluster isin reaches the scan as a "
    "PartitionFilter (unprobed files never open), and the ADC "
    "candidate scan's ReadSchema carries codes WITHOUT the embedding "
    "column - the full-precision vectors stay on disk until the "
    "rerank pool.  Hash-matched booleans: results byte-identical to "
    "the in-memory ivfpq_bulk_topk (shared assignment/code/LUT/"
    "tie-break kernels), both plan properties present, probe count "
    "strictly under the cluster count.  This is the billion-vector "
    "FAISS shape expressed as partition layout + column pruning - "
    "Catalyst does the index lookup.",
)
def knn_ivfpq_layout_prune(spark, sf_dir):
    import io
    import shutil
    from contextlib import redirect_stdout

    from crick_spark.pipeline.similarity import (
        ivfpq_bulk_topk,
        ivfpq_bulk_topk_from_layout,
        train_ivf_centroids,
        train_pq_codebooks,
        write_ivfpq_layout,
    )
    from crick_spark.tmpdirs import run_tmpdir

    import math

    emb = load_table(spark, sf_dir, "embeddings")
    # nlist follows the FAISS sqrt(n) rule (floor 16) so the pruning
    # assertion holds at EVERY corpus size: a 5-query panel probing 6
    # cells each can touch at most 30 — with a fixed nlist=16 the sf0.1
    # corpus probed all 16 cells and pruning_effective was vacuously
    # false (r13 sf0.1 sweep); sqrt(20k)=141 keeps probed ≪ nlist.
    nlist = max(16, math.isqrt(emb.count()))
    cents = train_ivf_centroids(emb, k=nlist, n_iter=5)
    books = train_pq_codebooks(emb, m=16, ksub=16)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    work = run_tmpdir("crick_ivfpq_layout_")
    write_ivfpq_layout(emb, cents, books, f"{work}/layout")
    mem = ivfpq_bulk_topk(
        queries, emb, cents, books, k=10, nprobe=6, rerank_factor=4
    )
    lay, probed = ivfpq_bulk_topk_from_layout(
        spark,
        queries,
        f"{work}/layout",
        cents,
        books,
        k=10,
        nprobe=6,
        rerank_factor=4,
        return_probed=True,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        lay.explain("formatted")
    plan = buf.getvalue()
    has_pf = any(
        "PartitionFilters:" in ln and "ivf_cluster" in ln
        for ln in plan.splitlines()
    )
    codes_pruned = any(
        "ReadSchema:" in ln and "codes" in ln and "embedding" not in ln
        for ln in plan.splitlines()
    )
    n_total = (
        spark.read.parquet(f"{work}/layout")
        .select("ivf_cluster")
        .distinct()
        .count()
    )
    diff = mem.exceptAll(lay).unionByName(lay.exceptAll(mem))
    out = diff.agg(F.count("*").alias("__d__")).select(
        (F.col("__d__") == 0).alias("results_match_memory"),
        F.lit(has_pf).alias("partition_filter_present"),
        F.lit(codes_pruned).alias("codes_scan_column_pruned"),
        F.lit(len(probed) < n_total).alias("pruning_effective"),
    )
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "knn_graph_embeddings",
    doc="kNN graph over the whole embedding corpus (rows-only headline; "
    "hash path): the corpus queries ITSELF through the bulk LSH join — "
    "one job builds every vector's top-6 neighbor list (self-match "
    "dropped in-plan), the primitive under semantic dedup, "
    "decontamination, and graph-based curation.  At 100 TB the probe "
    "side is the same corpus scan, so the join stays bucket-sparse "
    "(candidates per vector ~ bucket occupancy x tables), never n^2.  "
    "Quality twin: knn_lsh_bulk_recall (same bucket join + rerank "
    "kernel).",
)
def knn_graph_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    g = lsh_bulk_topk(
        queries, emb, k=7, nbits=6, num_tables=8, broadcast_queries=False
    )
    return (
        g.where(F.col("query_id") != F.col("vec_id"))
        .where(F.col("rank") <= 6)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


@register(
    "knn_graph_recall_panel",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS node_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 20
UNION ALL
SELECT CAST(-1 AS BIGINT) AS node_id, TRUE AS recall_ok
""",
    doc="Quality gate for the kNN GRAPH itself (r8, promoting "
    "knn_graph_embeddings off the rows-only list): the exact "
    "production graph build - the corpus LSH-self-joined, "
    "broadcast_queries=False, self-match dropped in-plan - is scored "
    "on a fixed 20-node panel against the brute-force exact "
    "neighbors of those nodes (ranks 2-6 of the top-7 after dropping "
    "the self-match, which always holds rank 1 at cosine 1.0 — so 5 "
    "exact neighbors per node, and recall divides by the ACTUAL "
    "per-node exact count, spanning the full [0,1]; r9 ADVICE fix — "
    "the r8 /6.0 denominator capped recall at 5/6).  Hash-matched "
    "booleans: per-node recall >= 0.5 and panel-average recall >= 0.7 "
    "(same margins as the knn_lsh_bulk_recall twin; measured well "
    "above both).  The graph is built corpus-wide, NOT just for the "
    "panel, so the gate certifies the same plan the rows-only "
    "headline times.",
)
def knn_graph_recall_panel(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    g = (
        lsh_bulk_topk(
            queries, emb, k=7, nbits=6, num_tables=8,
            broadcast_queries=False,
        )
        .where(F.col("query_id") != F.col("vec_id"))
        .where(F.col("rank") <= 6)
        .select(
            F.col("query_id").cast("bigint").alias("node_id"), "vec_id"
        )
    )
    panel_q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").cast("bigint").alias("node_id"), "embedding"
    )
    exact = (
        bulk_cosine_topk(
            panel_q.withColumnRenamed("node_id", "query_id"), emb, k=7
        )
        .where(F.col("query_id") != F.col("vec_id"))
        .where(F.col("rank") <= 6)
        .select(F.col("query_id").alias("node_id"), "vec_id")
    )
    ex_cnt = exact.groupBy("node_id").agg(F.count("*").alias("n_exact"))
    hits = (
        exact.join(g, ["node_id", "vec_id"], "left_semi")
        .groupBy("node_id")
        .agg(F.count("*").alias("n_hit"))
    )
    full = (
        panel_q.select("node_id")
        .join(ex_cnt, "node_id", "left")
        .join(hits, "node_id", "left")
        .select(
            "node_id",
            (
                F.coalesce("n_hit", F.lit(0))
                / F.greatest(F.coalesce("n_exact", F.lit(0)), F.lit(1))
            ).alias("recall"),
        )
    )
    per_node = full.select(
        "node_id", (F.col("recall") >= 0.5).alias("recall_ok")
    )
    overall = full.agg(
        F.lit(-1).cast("bigint").alias("node_id"),
        (F.avg("recall") >= 0.7).alias("recall_ok"),
    )
    return per_node.unionByName(overall)


@register(
    "chunk_documents",
    oracle=r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
  FROM documents
),
n AS (
  SELECT doc_id, words, len(words) AS nw,
         CAST(ceil(greatest(len(words) - 8, 1) / 24.0) AS INT) AS n_chunks
  FROM w
)
SELECT doc_id,
       i - 1 AS chunk_idx,
       array_to_string(words[(i - 1) * 24 + 1 : least((i - 1) * 24 + 32, nw)], ' ') AS chunk_text,
       least(nw - (i - 1) * 24, 32) AS n_chunk_tokens
FROM n, unnest(generate_series(1, n_chunks)) AS t(i)
""",
    doc="Training-data chunking: overlapping 32-token windows (stride 24) "
    "per document — the 1→N chunk explosion of an LLM data pipeline, "
    "hash-matched against the SQL oracle.",
)
def chunk_documents(spark, sf_dir):
    from crick_spark.pipeline.text import chunk_exprs

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(chunk_exprs(F.col("text"), 32, 8)).alias("ch"),
    ).select(
        "doc_id",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.col("ch.n_chunk_tokens").alias("n_chunk_tokens"),
    )


_JACCARD_PAIRS_CTE = r"""
s AS MATERIALIZED (
  SELECT doc_id, lang,
    CASE WHEN len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2),
             i -> array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+')[i:i+2], ' ')))
      ELSE [array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+'), ' ')]
    END AS sh
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  ) WHERE j >= 0.5
)
"""


@register(
    "dup_cluster_rollup",
    oracle=f"""
WITH RECURSIVE {_JACCARD_PAIRS_CTE},
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
  )
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(n, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.n
),
comp AS (SELECT n AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY n)
SELECT cluster_id, count(*) AS n_docs
FROM comp GROUP BY cluster_id
""",
    doc="Duplicate clustering: connected components (iterative min-label "
    "propagation, lineage-checkpointed driver loop of distributed jobs) "
    "over the exact Jaccard near-dup pair graph; cluster_id is the "
    "minimum doc_id = the canonical document to keep.  The oracle walks "
    "the same graph with a recursive CTE — iterative graph algorithms "
    "and SQL recursion agree exactly.",
)
def dup_cluster_rollup(spark, sf_dir):
    from crick_spark.pipeline.dedup import dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    )
    labels = dup_clusters(pairs)
    return labels.groupBy("cluster_id").agg(F.count("*").alias("n_docs"))


@register(
    "dup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_JACCARD_PAIRS_CTE},
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
  )
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(n, lbl) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.n
),
comp AS (SELECT n AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY n)
SELECT cluster_id, doc_id AS canonical_doc, n_docs, canon_chars FROM (
  SELECT c.cluster_id, d.doc_id,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_docs,
         max(d.n_chars) OVER (PARTITION BY c.cluster_id) AS canon_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
) WHERE rk = 1
""",
    doc="Quality-aware canonical selection: after clustering, the copy a "
    "pipeline KEEPS is the best document per duplicate cluster — here "
    "longest text, ties to the lowest id (a deterministic total order).  "
    "One max_by over an orderable struct per cluster on the Spark side "
    "(labels are tiny next to the corpus, so the doc-attribute join "
    "broadcasts); the oracle re-walks the same graph recursively and "
    "picks with a rank-1 window.",
)
def dup_cluster_canonical(spark, sf_dir):
    from crick_spark.pipeline.dedup import dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    )
    labels = dup_clusters(pairs).withColumnRenamed("id", "doc_id")
    joined = docs.select("doc_id", "n_chars").join(
        F.broadcast(labels), "doc_id"
    )
    pref = F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))
    return joined.groupBy("cluster_id").agg(
        F.count("*").alias("n_docs"),
        F.max_by("doc_id", pref).alias("canonical_doc"),
        F.max("n_chars").alias("canon_chars"),
    )


@register(
    "audio_window_features",
    oracle="""
SELECT doc_id,
       least(16, greatest(CAST(floor(coalesce(n_chars, 0) / 100.0) AS BIGINT),
                          1)) AS n_windows,
       TRUE AS rms_nonneg, TRUE AS peak_bounded, TRUE AS zc_bounded
FROM documents WHERE doc_id % 3 = 1
""",
    doc="Windowed audio features (RMS energy, zero crossings, peak) per "
    "1s window over the audio rows of the media column — Arrow-batched "
    "mapInPandas, 1→N explode, stub codec with real feature math "
    "(pipeline/multimodal.py).  Hash-matched oracle: the window count "
    "per doc is deterministic arithmetic (min(16, max(⌊duration⌋,1))) "
    "DuckDB reproduces, and the stub-stream features are checked as "
    "physics booleans — RMS ≥ 0, |peak| ≤ 127.5 (the centered sample "
    "range), total zero-crossings < the 256-sample stream length.",
)
def audio_window_features_q(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_fake_media,
        audio_window_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs)
    feats = audio_window_features(media)
    return feats.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.min(F.col("rms_energy") >= 0.0).alias("rms_nonneg"),
        F.min(F.col("peak") <= 127.5).alias("peak_bounded"),
        (F.sum("zero_crossings") <= F.lit(255)).alias("zc_bounded"),
    )


@register(
    "knn_quantized_ann",
    oracle="SELECT TRUE AS recall_ok",
    doc="int8 scalar-quantized ANN: integer-dot scan over 4×-smaller "
    "codes, rerank-pool exact cosine on the survivors (pipeline/"
    "similarity.py quantized_cosine_topk) — the memory-scale path.  "
    "Hash-matched boolean oracle: recall@10 vs the exact brute-force "
    "top-10 must be ≥0.8 (measured 1.0 — the 4k rerank pool recovers "
    "full precision; threshold leaves margin for testdata regeneration).",
)
def knn_quantized_ann(spark, sf_dir):
    from crick_spark.pipeline.similarity import quantized_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    quant = quantized_cosine_topk(emb, list(query), k=10).select("vec_id")
    exact = cosine_topk(emb, list(query), k=10).select("vec_id")
    return (
        exact.join(quant, "vec_id", "left_semi")
        .agg(F.count("*").alias("__hits__"))
        .select((F.col("__hits__") >= 8).alias("recall_ok"))
    )


@register(
    "knn_quantized_bulk_recall",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id, TRUE AS recall_ok
""",
    doc="Bulk int8-quantized ANN gate (round 6 — completes the bulk "
    "family: every ANN path now has a one-job panel form): ONE corpus "
    "scan scores all (query, row) int8 dots, per-query window shortlist, "
    "shared exact rerank; vs the bulk exact panel.  Per-query twin "
    "measured 1.0 recall; asserted >=0.6 per query, >=0.8 average.",
)
def knn_quantized_bulk_recall(spark, sf_dir):
    from crick_spark.pipeline.similarity import quantized_bulk_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    exact = bulk_cosine_topk(queries, emb, k=10).select("query_id", "vec_id")
    ann = quantized_bulk_topk(queries, emb, k=10).select("query_id", "vec_id")
    hits = (
        exact.join(ann, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg((F.count("*") / 10.0).alias("recall"))
    )
    panel = queries.select("query_id")
    full = panel.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("recall", F.lit(0.0)).alias("recall")
    )
    per_query = full.select(
        "query_id", (F.col("recall") >= 0.6).alias("recall_ok")
    )
    overall = full.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        (F.avg("recall") >= 0.8).alias("recall_ok"),
    )
    return per_query.unionByName(overall)


@register(
    "semantic_decontaminate_embeddings",
    oracle="""
WITH ev AS (SELECT embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT e.vec_id,
         max(
           list_sum(list_transform(list_zip(e.embedding, ev.qe),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
              * sqrt(list_sum(list_transform(ev.qe, x -> CAST(x AS DOUBLE) * x))))
         ) AS mx
  FROM embeddings e, ev
  GROUP BY e.vec_id
)
SELECT vec_id, round(mx, 6) AS max_eval_cosine, mx >= 0.8 AS contaminated
FROM scored
""",
    doc="Embedding-space benchmark decontamination (round 6) — the "
    "semantic twin of decontaminate_documents: max cosine of every "
    "corpus vector to a broadcast 5-vector 'benchmark' panel, flagged "
    "at 0.8.  Catches paraphrased eval leakage that shares no n-grams.  "
    "FULLY value-oracled per corpus row (max cosine + flag reproduce "
    "exactly in DuckDB).  100 TB shape: eval panels are tiny by "
    "construction -> broadcast + map-side max rollup, one corpus scan, "
    "no shuffle; huge panels swap in lsh_bulk_topk bucket joins.",
)
def semantic_decontaminate_embeddings(spark, sf_dir):
    from crick_spark.pipeline.similarity import semantic_decontaminate

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") < 5)
    return semantic_decontaminate(emb, ev, threshold=0.8)


@register(
    "pii_redact_documents",
    oracle=r"""
WITH enriched AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or 415-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || CASE WHEN doc_id % 3 = 0
                      THEN ' id 123-45-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END AS t
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
       CAST(len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
FROM enriched
""",
    doc="PII redaction pass: documents deterministically enriched with "
    "synthetic email/phone/SSN tokens (the corpus has none), then scrubbed "
    "with chained regexp_replace and per-kind regexp_count — map-only scan "
    "work, hash-matched on the md5 of the redacted text.  Patterns stay in "
    "the Java-regex ∩ RE2 subset so both engines agree.",
)
def pii_redact_documents(spark, sf_dir):
    from crick_spark.pipeline.text import pii_exprs

    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 415-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" id 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    cols = pii_exprs(F.col("t"))
    return enriched.select(
        "doc_id",
        cols[0].alias("n_email"),
        cols[1].alias("n_ssn"),
        cols[2].alias("n_phone"),
        F.md5(cols[3]).alias("redacted_md5"),
    )


@register(
    "boilerplate_ngram_filter",
    oracle=r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS ws FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(ws) - 2 >= 1
           THEN list_distinct(list_transform(
                  generate_series(1, len(ws) - 2),
                  i -> array_to_string(ws[i:i+2], ' ')))
           ELSE [array_to_string(ws, ' ')] END AS gs
  FROM w),
grams AS (SELECT doc_id, unnest(gs) AS gram FROM g),
cnt AS (SELECT gram, count(DISTINCT doc_id) AS ndocs FROM grams GROUP BY gram),
tot AS (SELECT count(*) AS ntot FROM documents),
boiler AS (SELECT gram FROM cnt, tot WHERE ndocs >= 0.2 * ntot),
cov AS (
  SELECT grams.doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN boiler.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler
  FROM grams LEFT JOIN boiler ON grams.gram = boiler.gram
  GROUP BY grams.doc_id)
SELECT doc_id, n_grams, n_boiler,
       round(n_boiler * 1.0 / n_grams, 6) AS boiler_frac,
       n_boiler * 1.0 / n_grams <= 0.5 AS keep
FROM cov
""",
    doc="Cross-document boilerplate filter: 3-gram shingles occurring in "
    ">=20% of documents are template text; each doc reports its distinct-"
    "shingle boilerplate coverage and a keep flag (<=50%).  One gram-rollup "
    "shuffle; the threshold and the (small by construction) boilerplate set "
    "broadcast.",
)
def boilerplate_ngram_filter(spark, sf_dir):
    from crick_spark.pipeline.text import boilerplate_ngram_stats

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_ngram_stats(
        docs, "doc_id", "text", n=3, doc_frac=0.2, max_boiler_frac=0.5
    )


@register(
    "embedding_dim_stats",
    oracle="""
SELECT i AS dim,
       round(avg(embedding[i]), 6) AS mean_v,
       round(stddev_pop(embedding[i]), 6) AS std_v,
       round(CAST(min(embedding[i]) AS DOUBLE), 6) AS min_v,
       round(CAST(max(embedding[i]) AS DOUBLE), 6) AS max_v
FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY i
""",
    doc="Per-dimension feature statistics over the embedding corpus (the "
    "fit step of feature standardization): posexplode to (dim, value) "
    "grain, one hash aggregate.  Map-side partial aggregation collapses "
    "the 64x row amplification to 64 rows per task before the shuffle, so "
    "the exchange is O(dims x partitions) regardless of corpus size.",
)
def embedding_dim_stats(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .select((F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.round(F.stddev_pop("v"), 6).alias("std_v"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
    )


@register(
    "zorder_layout_prune",
    oracle="""
SELECT count(*) AS n_rows,
       round(sum(l_extendedprice), 1) AS sum_price,
       count(DISTINCT l_orderkey) AS n_orders,
       TRUE AS pruning_effective
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 300 AND l_suppkey BETWEEN 10 AND 60
""",
    doc="Z-order layout rewrite + pruned scan, END-TO-END (beyond-"
    "reference table maintenance, the OPTIMIZE ZORDER BY role): lineitem "
    "is rewritten clustered on the Morton curve over (l_partkey, "
    "l_suppkey) and a two-dimensional range filter is answered from the "
    "rewritten files.  Layout must never change results — the exact "
    "aggregates hash-match the same filter on the original table — AND "
    "the layout must actually prune: pruning_effective consults the "
    "per-file min/max envelopes (scan_stats, the statistics a parquet "
    "reader prunes on) and requires the files whose envelope intersects "
    "the predicate box to be ≤ half of all files (vacuous below 4 files, "
    "where the fixture is too small to split).  Per-dimension range "
    "tightening vs an unsorted copy is asserted in tests/test_pipeline.py.",
)
def zorder_layout_prune(spark, sf_dir):
    import shutil

    from crick_spark.pipeline.layout import scan_stats, zorder_by

    li = load_table(spark, sf_dir, "lineitem")
    work = run_tmpdir("crick_zorder_")
    path = work + "/lineitem_z.parquet"
    zorder_by(li, ["l_partkey", "l_suppkey"], bits_per_col=6).write.option(
        "maxRecordsPerFile", 5_000
    ).mode("overwrite").parquet(path)
    z = spark.read.parquet(path)
    agg = z.where(
        F.col("l_partkey").between(100, 300) & F.col("l_suppkey").between(10, 60)
    ).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 1).alias("sum_price"),
        F.count_distinct("l_orderkey").alias("n_orders"),
    )
    stats = scan_stats(spark, path, ["l_partkey", "l_suppkey"])
    envelopes = stats.agg(
        F.count("*").alias("__total__"),
        F.sum(
            (
                (F.col("min_l_partkey") <= 300)
                & (F.col("max_l_partkey") >= 100)
                & (F.col("min_l_suppkey") <= 60)
                & (F.col("max_l_suppkey") >= 10)
            ).cast("long")
        ).alias("__needed__"),
    )
    out = agg.crossJoin(envelopes).select(
        "n_rows",
        "sum_price",
        "n_orders",
        (
            (F.col("__total__") < 4)
            | (F.col("__needed__") * 2 <= F.col("__total__"))
        ).alias("pruning_effective"),
    )
    # the 1-row result is materialized (lineage truncated off the temp
    # files) so the rewritten lineitem copy can be deleted immediately
    # instead of accumulating a full table copy per run
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


_BM25_TERMS = ["spark", "join", "stream"]
_BM25_SQL_TF = "\n".join(
    f"         len(list_filter(string_split_regex(trim(text), '\\s+'), "
    f"t -> t = '{t}')) AS tf_{i},"
    for i, t in enumerate(_BM25_TERMS)
)
_BM25_SQL_DF = "\n".join(
    f"         sum(CASE WHEN tf_{i} > 0 THEN 1.0 ELSE 0.0 END) AS df_{i},"
    for i in range(len(_BM25_TERMS))
)
_BM25_SQL_SCORE = "\n         + ".join(
    f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
    f" * (tf_{i} * 2.2) / (tf_{i} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    for i in range(len(_BM25_TERMS))
)


@register(
    "bm25_top_docs",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS dl,
{_BM25_SQL_TF}
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         avg(dl) AS avgdl,
{_BM25_SQL_DF}
  FROM base
)
SELECT doc_id, dl,
       round({_BM25_SQL_SCORE}, 6) AS bm25
FROM base, stats
ORDER BY bm25 DESC, doc_id
LIMIT 15
""",
    doc="BM25 ranked retrieval (Lucene-style non-negative idf, k1=1.2, "
    "b=0.75): top-15 docs for a 3-term query, full-value oracle vs the "
    "same formula in DuckDB.  100 TB shape: per-term tf via "
    "size(filter(tokens)) — codegen array ops, NO explode, NO "
    "(doc,term) shuffle; corpus stats are one tiny aggregate broadcast "
    "back; final top-k is TakeOrderedAndProject (per-partition heaps), "
    "not a global sort.  Tie-break on (rounded score, doc_id) keeps the "
    "k-set engine-independent.",
)
def bm25_top_docs(spark, sf_dir):
    from crick_spark.pipeline.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    out = bm25_topk(docs, _BM25_TERMS, k=15)
    return out.select(
        "doc_id", F.col("dl").cast("bigint").alias("dl"), "bm25"
    )


_BM25_PANEL = [
    (1, ["spark", "join", "stream"]),
    (2, ["table", "scan"]),
    (3, ["window", "agg", "filter", "batch"]),
]
_BM25_PANEL_SQL = ", ".join(
    f"({qid}, '{t}')" for qid, terms in _BM25_PANEL for t in terms
)


@register(
    "bm25_bulk_scores",
    oracle=f"""
WITH panel(query_id, term) AS (VALUES {_BM25_PANEL_SQL}),
base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
), docs AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM base
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM docs
), tf AS (
  SELECT p.query_id, p.term, d.doc_id, d.dl,
         CAST(len(list_filter(d.toks, t -> t = p.term)) AS DOUBLE) AS tf
  FROM docs d CROSS JOIN panel p
), df AS (
  SELECT t.term,
         sum(CASE WHEN len(list_filter(d.toks, x -> x = t.term)) > 0
             THEN 1.0 ELSE 0.0 END) AS df
  FROM (SELECT DISTINCT term FROM panel) t CROSS JOIN docs d
  GROUP BY t.term
), scored AS (
  SELECT f.query_id, f.doc_id, max(f.dl) AS dl,
         sum(ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (f.tf * 2.2)
             / (f.tf + 1.2 * (0.25 + 0.75 * f.dl / s.avgdl))) AS bm25
  FROM tf f JOIN df d USING (term) CROSS JOIN stats s
  WHERE f.tf > 0
  GROUP BY f.query_id, f.doc_id
), ranked AS (
  SELECT query_id, doc_id, dl, round(bm25, 6) AS bm25,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(bm25, 6) DESC, doc_id) AS rk
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, dl, bm25,
       CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 5
""",
    doc="BULK BM25 — a 3-query panel scored in ONE pass via the "
    "posting-list join variant (the shape pipeline/retrieval.py's "
    "per-query scorer documents for thousands of queries), top-5 per "
    "query, full-value oracle.  The exploded corpus tokens are pruned "
    "to the broadcast query vocabulary BEFORE the posting shuffle, so "
    "the one big shuffle carries only vocabulary hits; df is a tiny "
    "re-aggregation of the postings; the panel join is a broadcast; "
    "per-query ranking windows see only that query's matching docs.  "
    "Docs matching no term (score exactly 0) are absent by design — "
    "at bulk scale zero rows are |panel|x|corpus| dead weight.  "
    "Equivalence with the per-query scorer is asserted in "
    "tests/test_pipeline.py on the same panel.",
)
def bm25_bulk_scores_q(spark, sf_dir):
    from crick_spark.pipeline.retrieval import bm25_bulk_topk

    docs = load_table(spark, sf_dir, "documents")
    panel = spark.createDataFrame(_BM25_PANEL, ["query_id", "terms"])
    out = bm25_bulk_topk(docs, panel, k=5)
    return out.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        "doc_id",
        F.col("dl").cast("bigint").alias("dl"),
        "bm25",
        F.col("rk").cast("bigint").alias("rk"),
    )


def _pagerank_oracle(iters: int = 3) -> str:
    head = """
WITH pairs AS (
  SELECT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2
), edges AS (
  SELECT c AS src, s AS dst, w FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst, w FROM pairs
), outw AS (
  SELECT src, sum(w) AS ow FROM edges GROUP BY 1
), norm AS (
  SELECT e.src, e.dst, e.w / o.ow AS p FROM edges e JOIN outw o USING (src)
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), r0 AS (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""", r{i} AS (
  SELECT nodes.node,
         (SELECT 0.15 / n FROM nn)
           + 0.85 * coalesce(m.mass, 0.0) AS rank
  FROM nodes LEFT JOIN (
    SELECT norm.dst AS node, sum(r{i-1}.rank * norm.p) AS mass
    FROM r{i-1} JOIN norm ON r{i-1}.node = norm.src GROUP BY 1
  ) m USING (node)
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node, round(rank, 9) AS rank FROM r{iters}"
    )


@register(
    "pagerank_purchase_graph",
    oracle=_pagerank_oracle(3),
    doc="Weighted PageRank (d=0.85, 3 synchronous iterations, uniform "
    "start) over the bidirectionalized customer–supplier purchase "
    "graph, FULL-VALUE oracle — the DuckDB side unrolls the identical "
    "iterations as chained CTEs, so every rank hash-matches at 1e-9.  "
    "The second iterative operator beside connected components "
    "(pipeline/dedup.py): per iteration two shuffles over the edge "
    "list (rank-vector join + groupBy dst), out-weights normalized "
    "once and cached; no dangling mass by construction (every node "
    "has out-edges in a bidirectionalized graph).",
)
def pagerank_purchase_graph(spark, sf_dir):
    from crick_spark.pipeline.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").cast("double").alias("w"))
    )
    cnode = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    snode = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    edges = pairs.select(
        cnode.alias("src"), snode.alias("dst"), "w"
    ).unionByName(pairs.select(snode.alias("src"), cnode.alias("dst"), "w"))
    # dangling="assume_none": the edge list is bidirectionalized two
    # lines up, so every node has an out-edge by construction and the
    # redistribution machinery would only add per-iteration 1-row jobs
    ranks = pagerank(
        edges,
        iterations=3,
        damping=0.85,
        weight_col="w",
        eager=True,
        dangling="assume_none",
    )
    return ranks.select("node", F.round("rank", 9).alias("rank"))


@register(
    "pagerank_deep_dangling",
    oracle="SELECT TRUE AS mass_conserved, TRUE AS ranks_in_range, "
    "TRUE AS sinks_present",
    doc="Deep-chain PageRank (10 iterations) on a DIRECTED purchase "
    "graph with genuine sink nodes (suppliers have no out-edges — the "
    "customer→supplier direction only), exercising both round-5 "
    "hardening paths: dangling-mass redistribution (total rank mass "
    "stays exactly 1.0 despite sinks) and per-superstep localCheckpoint "
    "truncation (bounded plan depth at any chain length, linear "
    "execution work).  Hash-matched invariant oracle: mass conserved "
    "at 1e-9, "
    "every rank within ((1-d)/N, 1), and the sink set is non-empty — "
    "so the redistribution machinery is actually load-bearing, not "
    "vacuous.  Exact 10-iteration values are numpy-cross-checked in "
    "tests/test_pipeline.py (the CTE unroll stops scaling past ~3).",
)
def pagerank_deep_dangling(spark, sf_dir):
    from crick_spark.pipeline.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").cast("double").alias("w"))
    )
    # one direction only: suppliers are sinks (no out-edges).  Node ids
    # stay LONG — customers even, suppliers odd (disjoint by parity):
    # string ids ("c:123"/"s:45") measured ~13 s for the same 10
    # iterations vs ~8 s with longs at sf0.1 — every per-iteration
    # shuffle hashes and compares the key, so the key type is the hot
    # path of an iterative operator
    edges = pairs.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
        "w",
    )
    # checkpoint interval left to the auto default (3 for deep chains —
    # the measured-fastest shape for the r7 derived-dm form, which reads
    # each step's vector once; see the pagerank docstring's sweep)
    ranks = pagerank(
        edges,
        iterations=10,
        damping=0.85,
        weight_col="w",
        eager=True,
    )
    return ranks.agg(
        (F.abs(F.sum("rank") - F.lit(1.0)) < F.lit(1e-9)).alias(
            "mass_conserved"
        ),
        (
            (F.min("rank") > F.lit(0.15) / F.count("*"))
            & (F.max("rank") < F.lit(1.0))
        ).alias("ranks_in_range"),
        (
            F.sum((F.col("node") % 2 == 1).cast("long")) > 0
        ).alias("sinks_present"),
    )


@register(
    "unigram_logprob_documents",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(trim(text), '\s+'), t -> t <> '')) AS tok
  FROM documents
), counts AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1
), totals AS (
  SELECT CAST(sum(c) AS DOUBLE) AS total, CAST(count(*) AS DOUBLE) AS v
  FROM counts
), probs AS (
  SELECT tok, ln((c + 1) / (total + v)) AS lp FROM counts, totals
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(p.lp), 6) AS avg_logprob
FROM toks t JOIN probs p USING (tok)
GROUP BY t.doc_id
""",
    doc="Unigram language-model scoring (Laplace-smoothed corpus model, "
    "mean token log-probability per document) — the classic cheap "
    "quality/outlier signal for training-data curation, full-value "
    "oracle.  Two shuffles: token counts, then per-doc score with the "
    "probability table broadcast (vocab ≪ corpus).  At 100 TB cap the "
    "vocabulary with the engine's own SpaceSaving heavy-hitters and "
    "route the tail to one OOV bucket — the model table stays "
    "broadcast-sized by construction.",
)
def unigram_logprob_documents(spark, sf_dir):
    from crick_spark.pipeline.retrieval import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").cast("double").alias("total"),
        F.count("*").cast("double").alias("v"),
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.log((F.col("c") + 1) / (F.col("total") + F.col("v"))).alias("lp"),
    )
    return (
        toks.join(F.broadcast(probs), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


@register(
    "compact_small_files",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(event_id) AS BIGINT) AS id_sum,
       round(sum(value), 2) AS value_sum,
       count(DISTINCT user_id) AS n_users,
       TRUE AS fragmentation_reduced
FROM events
""",
    doc="Small-file compaction (lakehouse OPTIMIZE bin-packing role): a "
    "deliberately fragmented 64-file copy of events is rewritten to "
    "~4 evenly-sized files by one round-robin repartition; the oracle "
    "hash-matches a content checksum (rows, id-sum, value-sum, "
    "distinct users) computed from the ORIGINAL table against the "
    "compacted copy — layout maintenance must never change results — "
    "plus a fragmentation_reduced boolean (files_after ≤ "
    "files_before/8).  Row count for sizing comes from parquet "
    "footers (count-star pushdown, no data scan).",
)
def compact_small_files_q(spark, sf_dir):
    import shutil

    from crick_spark.pipeline.layout import compact_small_files

    work = run_tmpdir("crick_compact_")
    frag, packed = f"{work}/frag", f"{work}/packed"
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    before, after = compact_small_files(
        spark, frag, packed, target_rows_per_file=max(1, n // 4)
    )
    out = (
        spark.read.parquet(packed)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("event_id").alias("id_sum"),
            F.round(F.sum("value"), 2).alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
            F.lit(after <= before // 8).alias("fragmentation_reduced"),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "negative_sampling_user_types",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), pos AS (
  SELECT DISTINCT user_id, event_type FROM ev
), types AS (
  SELECT DISTINCT event_type FROM ev
), cand AS (
  SELECT u.user_id, t.event_type,
         md5(CAST(u.user_id AS VARCHAR) || ':' || t.event_type) AS coin
  FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN types t
  WHERE NOT EXISTS (
    SELECT 1 FROM pos p
    WHERE p.user_id = u.user_id AND p.event_type = t.event_type
  )
), ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY coin) AS rk
  FROM cand
)
SELECT user_id, event_type, rk
FROM ranked WHERE rk <= 2
""",
    doc="Deterministic negative sampling (contrastive-training staple): "
    "for each user, the 2 event types they never interacted with, "
    "chosen by an md5 coin over (user, type) — reproducible across "
    "engines and runs, no RNG state; full-value oracle.  100 TB shape: "
    "the candidate space is |users| x |type dictionary| (the dictionary "
    "is broadcast-sized by construction), positives removed by an "
    "anti-join co-partitioned on user_id, per-user ranking windows over "
    "at most |dictionary| rows.  Item corpora too big to cross-join "
    "get the same contract via hash-bucketed candidate slices.",
)
def negative_sampling_user_types(spark, sf_dir):
    from pyspark.sql import Window

    # NULL keys excluded up-front on both engines: Spark's concat_ws
    # would skip a NULL component (coin stays non-NULL) while SQL `||`
    # propagates NULL — the per-user row_number order would silently
    # diverge on data with NULL user_id/event_type.
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    pos = ev.select("user_id", "event_type").distinct()
    cand = (
        users.crossJoin(F.broadcast(types))
        .join(pos, ["user_id", "event_type"], "left_anti")
        .withColumn(
            "coin",
            F.md5(
                F.concat_ws(
                    ":", F.col("user_id").cast("string"), F.col("event_type")
                )
            ),
        )
    )
    w = Window.partitionBy("user_id").orderBy("coin")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("user_id", "event_type", "rk")
    )


@register(
    "semantic_dedup_embeddings",
    oracle="""
SELECT count(*) AS n_vectors,
       TRUE AS flags_complete,
       TRUE AS removed_have_kept_witness,
       TRUE AS keep_consistent
FROM embeddings
""",
    doc="Semantic deduplication (SemDeDup, Abbas et al. 2023 — beyond "
    "the n-gram dedup family: catches paraphrases sharing no shingles): "
    "k-means-cluster the embedding corpus with the IVF quantizer, then "
    "greedy keep/remove within each cluster at cosine ≥ 0.4 (the "
    "fixture's planted near-dup threshold), keeping the "
    "least-centroid-similar item first (the paper's diversity choice).  "
    "Hash-matched boolean oracle, each invariant verified by an "
    "INDEPENDENT Spark-expression path (JVM dot products, not the "
    "kernel's numpy): every vector is flagged exactly once; every "
    "removed vector has a kept same-cluster witness with cosine ≥ eps; "
    "the keep flag is exactly (no earlier kept neighbor ≥ eps).  "
    "Booleans are invariant to the (deterministic, seeded) clustering, "
    "so the oracle is stable across partitionings.",
)
def semantic_dedup_embeddings(spark, sf_dir):
    from crick_spark.pipeline.similarity import (
        dot_expr,
        norm_expr,
        semantic_dedup,
    )

    eps = 0.4
    emb = load_table(spark, sf_dir, "embeddings")
    flags = semantic_dedup(emb, eps=eps, k=16)
    vec = emb.select("vec_id", "embedding")
    flagged = flags.join(vec, "vec_id")
    # independent witness check: for each removed vector, the best cosine
    # to a KEPT vector of the same cluster, computed with JVM expressions
    removed = flagged.where(~F.col("keep")).select(
        F.col("vec_id").alias("r_id"),
        F.col("cluster").alias("r_cluster"),
        F.col("embedding").alias("r_vec"),
    )
    kept = flagged.where(F.col("keep")).select(
        F.col("cluster").alias("k_cluster"),
        F.col("embedding").alias("k_vec"),
    )
    cos = dot_expr(F.col("r_vec"), F.col("k_vec")) / (
        norm_expr(F.col("r_vec")) * norm_expr(F.col("k_vec"))
    )
    witness = (
        removed.join(kept, F.col("r_cluster") == F.col("k_cluster"))
        .groupBy("r_id")
        .agg(F.max(cos).alias("best_kept_cos"))
        .agg(
            F.coalesce(
                F.min(F.col("best_kept_cos") >= F.lit(eps - 1e-9)), F.lit(True)
            ).alias("removed_have_kept_witness"),
        )
    )
    checks = flagged.agg(
        F.count("*").alias("n_flagged"),
        F.bool_and(
            F.col("keep")
            == (
                F.col("max_sim_kept").isNull()
                | (F.col("max_sim_kept") < F.lit(eps))
            )
        ).alias("keep_consistent"),
    )
    total = emb.agg(F.count("*").alias("n_vectors"))
    return (
        total.crossJoin(F.broadcast(checks))
        .crossJoin(F.broadcast(witness))
        .select(
            "n_vectors",
            (F.col("n_flagged") == F.col("n_vectors")).alias("flags_complete"),
            "removed_have_kept_witness",
            "keep_consistent",
        )
    )


@register(
    "build_vocab_documents",
    oracle="""
WITH toks AS (
  SELECT t.token
  FROM documents d, unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS t(token)
  WHERE t.token <> ''
), counts AS (
  SELECT token, count(*) AS freq FROM toks GROUP BY token
), top AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
  FROM counts QUALIFY rank <= 500
)
SELECT rank, token, freq,
       round(sum(freq) OVER (ORDER BY rank) /
             (SELECT sum(freq) FROM counts), 6) AS cum_coverage
FROM top
""",
    doc="Tokenizer-training vocabulary selection: top-500 corpus tokens "
    "by frequency with the cumulative-coverage curve that picks V in "
    "practice.  FULLY value-oracled — counts, deterministic tie-break, "
    "and the running coverage ratio all reproduce exactly in DuckDB.  "
    "Scale shape: explode → partial-combine hash agg → "
    "TakeOrderedAndProject; only the 500 winners reach the ranking "
    "window (SpaceSaving cap documented for unbounded tails).",
)
def build_vocab_documents(spark, sf_dir):
    from crick_spark.pipeline.text import build_vocab

    docs = load_table(spark, sf_dir, "documents")
    return build_vocab(docs, vocab_size=500)


@register(
    "bpe_merge_candidates_documents",
    oracle="""
WITH words AS (
  SELECT w.word, count(*) AS wfreq
  FROM documents d, unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS w(word)
  WHERE length(w.word) >= 2
  GROUP BY w.word
), pairs AS (
  SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, wfreq
  FROM words, unnest(range(1, length(word))) AS t(i)
)
SELECT pair, CAST(sum(wfreq) AS BIGINT) AS freq
FROM pairs GROUP BY pair
ORDER BY freq DESC, pair ASC LIMIT 20
""",
    doc="First BPE merge iteration: top-20 adjacent character pairs over "
    "the corpus WORD TABLE (weighted by word frequency) — the standard "
    "trainer trick of aggregating words first (Heaps' law: vocab ≪ "
    "corpus) so each merge iteration explodes the vocabulary, not the "
    "raw text.  FULLY value-oracled against DuckDB's identical "
    "split/substring arithmetic.",
)
def bpe_merge_candidates_documents(spark, sf_dir):
    from crick_spark.pipeline.text import bpe_merge_candidates

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merge_candidates(docs, top_n=20)


@register(
    "bpe_train_batched_documents",
    oracle="""
SELECT TRUE AS freq_non_increasing,
       TRUE AS fewer_rounds_than_merges,
       TRUE AS batched_equals_sequential
""",
    doc="Round-6 batched-BPE gate, hash-matched boolean oracle: the full "
    "trainer learns 12 merges on the documents corpus with top-8 "
    "batching (mutually-disjoint pairs, strict frequency gap — provably "
    "equivalent to sequential greedy, see _accept_merge_batch) and the "
    "oracle asserts (1) chosen frequencies are non-increasing (a BPE "
    "theorem: new pairs never exceed prior counts), (2) the batched run "
    "took FEWER pair-count rounds than merges (the job-count drop), and "
    "(3) the merge list is byte-identical to the one-merge-per-round "
    "sequential trainer on the same corpus.",
)
def bpe_train_batched_documents(spark, sf_dir):
    from crick_spark.pipeline.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    bstats: dict = {}
    batched = bpe_train(docs, n_merges=8, batch_size=8, stats=bstats)
    sequential = bpe_train(docs, n_merges=8, batch_size=1)
    freqs = [f for _, _, f in batched]
    return spark.createDataFrame(
        [
            (
                all(a >= b for a, b in zip(freqs, freqs[1:])),
                bstats["rounds"] < len(batched),
                batched == sequential,
            )
        ],
        "freq_non_increasing boolean, fewer_rounds_than_merges boolean, "
        "batched_equals_sequential boolean",
    )


def _bpe_unrolled_oracle(n_merges: int) -> str:
    """Full-value DuckDB oracle for the BPE trainer (r13, VERDICT r12
    #5): ``n_merges`` sequential greedy rounds UNROLLED as chained
    MATERIALIZED CTEs (the PageRank/kcore unrolled-oracle precedent —
    MATERIALIZED is load-bearing: w{k-1} is referenced by both the
    pair census and the merge application, and inlining would
    re-evaluate the whole chain 2^k times).  Each word is a
    double-space-separated symbol string ('  h  e  '); a merge is one
    left-to-right non-overlapping replace of ' l  r ' with ' lr ' —
    the single-space flanks consume one of the two boundary spaces on
    each side, so the result keeps double-space boundaries AND
    reproduces Python's non-overlapping scan exactly ('l l l' merges
    to ['ll','l'], not ['ll','ll']).  Valid because the batched
    trainer is provably equivalent to sequential greedy
    (_accept_merge_batch; pinned by bpe_train_batched_documents)."""
    parts = [
        """WITH w0 AS MATERIALIZED (
  SELECT w.word AS word,
         '  ' || regexp_replace(w.word, '(.)', '\\1  ', 'g') AS st,
         count(*) AS wfreq
  FROM documents d,
       unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS w(word)
  WHERE length(w.word) >= 2
  GROUP BY w.word
)"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(f""", b{k} AS MATERIALIZED (
  SELECT s.t[i] AS l, s.t[i+1] AS r, sum(s.wfreq) AS freq
  FROM (SELECT list_filter(string_split(st, ' '), x -> x <> '') AS t,
               wfreq FROM w{k-1}) s,
       unnest(range(1, len(s.t))) AS u(i)
  GROUP BY 1, 2
  ORDER BY freq DESC, l ASC, r ASC LIMIT 1
), w{k} AS MATERIALIZED (
  SELECT w.word,
         replace(w.st, ' ' || b.l || '  ' || b.r || ' ',
                 ' ' || b.l || b.r || ' ') AS st, w.wfreq
  FROM w{k-1} w, b{k} b
)""")
    sel = "\nUNION ALL\n".join(
        f'SELECT CAST({k} AS INTEGER) AS step, l AS "left", '
        f'r AS "right", CAST(freq AS BIGINT) AS freq FROM b{k}'
        for k in range(1, n_merges + 1)
    )
    parts.append("\nSELECT * FROM (\n" + sel + "\n) ORDER BY step")
    return "".join(parts)


def _bpe_wordtable_cte(n_merges: int) -> str:
    """The same unrolled chain as :func:`_bpe_unrolled_oracle` but
    WITHOUT the final SELECT — callers append their own query over
    ``w{n_merges}``, whose rows are (word, st, wfreq) with ``st`` the
    word's symbol string AFTER all ``n_merges`` sequential merges (so
    ``len(list_filter(string_split(st, ' '), x -> x <> ''))`` is the
    word's exact token count under the trained tokenizer).  Caveat: a
    corpus that exhausts its pairs before round n collapses w{n} to
    empty via the 1-row cross join — the fixtures train ≥ 12 merges at
    every SF, and the encode query's n_docs row count would loudly
    mismatch if this ever tripped."""
    full = _bpe_unrolled_oracle(n_merges)
    return full[: full.rindex("\nSELECT * FROM (")]


@register(
    "bpe_train_documents",
    oracle=_bpe_unrolled_oracle(12),
    doc="Full batched BPE trainer headline, FULLY value-oracled (r13, "
    "VERDICT r12 #5 — was rows-only): 12 merges with top-8 batching "
    "over the documents word table; every (step, left, right, freq) "
    "row hash-matches a 12-round unrolled sequential-greedy chained-"
    "CTE recomputation in DuckDB (see _bpe_unrolled_oracle — sound "
    "because batched == sequential, the equivalence "
    "bpe_train_batched_documents pins).",
)
def bpe_train_documents(spark, sf_dir):
    from crick_spark.pipeline.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=12, batch_size=8)
    return spark.createDataFrame(
        [(i + 1, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "step int, left string, right string, freq long",
    )


@register(
    "unigram_lm_vocab_documents",
    oracle="""
SELECT CAST(count(DISTINCT ch) AS BIGINT) AS n_char_pieces,
       TRUE AS n_pieces_le_vocab,
       TRUE AS probs_normalized,
       TRUE AS pieces_within_max_len,
       TRUE AS all_chars_covered,
       TRUE AS logprobs_negative
FROM documents d,
     unnest(string_split(regexp_replace(lower(trim(d.text)),
                                        '\\s+', '', 'g'), '')) AS t(ch)
WHERE ch <> ''
""",
    doc="Unigram-LM (SentencePiece-style, Kudo 2018) tokenizer vocab "
    "headline, oracle-converted (r13, VERDICT r12 #5 — was rows-only; "
    "the EM inner loop has no SQL analog, so the hash-matched surface "
    "is the trained vocab's structure): n_char_pieces is a REAL value "
    "— the count of single-character pieces must equal DuckDB's "
    "independent census of distinct corpus characters (seeding draws "
    "only from corpus substrings ⇒ ⊆; the coverage guarantee protects "
    "chars from pruning ⇒ ⊇) — plus size/normalization/max-piece-len/"
    "coverage/negativity invariants on the same single training run.  "
    "Trains ONCE (bench comparability); the (piece, logprob) table "
    "itself stays pinned by unigram_lm_invariants' deterministic_rerun "
    "and the pytest trainer suite.",
)
def unigram_lm_vocab_documents(spark, sf_dir):
    import math

    from crick_spark.pipeline.text import unigram_lm_train

    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram_lm_train(docs, vocab_size=300, seed_size=1500, em_rounds=3)
    pieces = {p for p, _ in vocab}
    corpus_chars = {
        r["c"]
        for r in docs.select(
            F.explode(
                F.split(F.lower(F.regexp_replace("text", r"\s+", "")), "")
            ).alias("c")
        )
        .where(F.col("c") != "")
        .distinct()
        .collect()
    }
    return spark.createDataFrame(
        [
            (
                sum(1 for p in pieces if len(p) == 1),
                len(vocab) <= 300,
                abs(sum(math.exp(lp) for _, lp in vocab) - 1.0) < 1e-9,
                max(len(p) for p in pieces) <= 6,
                corpus_chars <= pieces,
                all(lp < 0 for _, lp in vocab),
            )
        ],
        "n_char_pieces long, n_pieces_le_vocab boolean, "
        "probs_normalized boolean, pieces_within_max_len boolean, "
        "all_chars_covered boolean, logprobs_negative boolean",
    )


@register(
    "unigram_lm_invariants",
    oracle="""
SELECT TRUE AS probs_normalized,
       TRUE AS em_loglik_monotone,
       TRUE AS chars_covered,
       TRUE AS deterministic_rerun
""",
    doc="Round-6 unigram-LM gate, hash-matched boolean oracle: piece "
    "probabilities sum to 1; the hard-EM corpus log-likelihood trace is "
    "non-decreasing (coordinate ascent theorem for Viterbi EM); every "
    "single character of the corpus word table is in the vocabulary "
    "(coverage guarantee — any word segments); and an independent "
    "second training run reproduces the identical (piece, logprob) "
    "table (determinism — the property that makes the headline "
    "rows-only entry meaningful).",
)
def unigram_lm_invariants(spark, sf_dir):
    import math

    from crick_spark.pipeline.text import unigram_lm_train

    docs = load_table(spark, sf_dir, "documents")
    stats: dict = {}
    v1 = unigram_lm_train(
        docs, vocab_size=300, seed_size=1500, em_rounds=3, stats=stats
    )
    v2 = unigram_lm_train(docs, vocab_size=300, seed_size=1500, em_rounds=3)
    trace = stats["loglik_trace"]
    pieces = {p for p, _ in v1}
    corpus_chars = {
        r["c"]
        for r in docs.select(
            F.explode(
                F.split(F.lower(F.regexp_replace("text", r"\s+", "")), "")
            ).alias("c")
        )
        .where(F.col("c") != "")
        .distinct()
        .collect()
    }
    return spark.createDataFrame(
        [
            (
                abs(sum(math.exp(lp) for _, lp in v1) - 1.0) < 1e-9,
                all(b >= a - 1e-9 for a, b in zip(trace, trace[1:])),
                corpus_chars <= pieces,
                v1 == v2,
            )
        ],
        "probs_normalized boolean, em_loglik_monotone boolean, "
        "chars_covered boolean, deterministic_rerun boolean",
    )


@register(
    "mixture_epoch_plan_documents",
    oracle="""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS avail_tokens,
         (20 - CAST(substr(source, 4) AS INT)) / 210.0 AS share
  FROM documents GROUP BY source
)
SELECT source, n_docs, avail_tokens,
       round(share * 2000000, 2) AS target_tokens,
       round(share * 2000000 / nullif(avail_tokens, 0), 6) AS epochs_needed,
       coalesce(share * 2000000 / nullif(avail_tokens, 0) > 4.0, TRUE) AS capped,
       round(coalesce(least(share * 2000000 / nullif(avail_tokens, 0), 4.0)
                      * avail_tokens, 0.0), 2) AS effective_tokens,
       round(share * 2000000
             - coalesce(least(share * 2000000 / nullif(avail_tokens, 0), 4.0)
                        * avail_tokens, 0.0), 2) AS shortfall_tokens
FROM per
""",
    doc="Epoch-aware mixture planning — the UPSAMPLING complement of "
    "domain_mix_resample: a 2M-token training budget with target shares "
    "∝ (20-K) per source; per domain the plan reports epochs needed, "
    "the ≤4-epoch repeat cap (the data-constrained-scaling rule that "
    "repeating past ~4 epochs stops helping), effective contribution, "
    "and the shortfall a curator must source elsewhere.  FULLY "
    "value-oracled; one tiny per-domain aggregate, arithmetic on "
    "|domains| rows — nothing corpus-sized moves after the scan.",
)
def mixture_epoch_plan_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import words_expr
    from crick_spark.pipeline.sampling import mixture_epoch_plan

    docs = load_table(spark, sf_dir, "documents")
    share = (
        F.lit(20) - F.substring(F.col("source"), 4, 10).cast("int")
    ) / F.lit(210.0)
    return mixture_epoch_plan(
        docs,
        "source",
        share,
        F.size(words_expr(F.col("text"))),
        budget_tokens=2_000_000,
        max_epochs=4.0,
    )


_SWEEP_THRESHOLDS = [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8]


@register(
    "quality_threshold_sweep",
    oracle="""
WITH scored AS (
  SELECT 0.5 * least(len(string_split_regex(trim(text), '\\s+')) / 64.0, 1.0)
       + 0.5 * (CAST(len(list_distinct(string_split_regex(trim(text), '\\s+')))
                AS DOUBLE)
                / len(string_split_regex(trim(text), '\\s+'))) AS score
  FROM documents
), n AS (SELECT count(*) AS total FROM scored)
SELECT t.threshold,
       CAST(sum(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_surviving,
       round(sum(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END)
             / CAST(n.total AS DOUBLE), 6) AS survival_rate
FROM scored s, n, unnest([0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8]) AS t(threshold)
GROUP BY t.threshold, n.total
""",
    doc="Quality-filter threshold calibration: survival rate of the "
    "corpus at each candidate quality_score cutoff, computed in ONE "
    "scan (per-doc score once, 7 conditional-sum aggregate columns, "
    "unpivoted to rows) — the curve a curator reads before committing "
    "a filter, without 7 passes over 100 TB.  FULLY value-oracled: "
    "both engines build the identical [0,1] composite score "
    "(0.5·min(n/64,1) + 0.5·TTR) with the same IEEE arithmetic, so "
    "boundary comparisons agree bit-for-bit.",
)
def quality_threshold_sweep(spark, sf_dir):
    from crick_spark.pipeline.text import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(quality_score_expr(F.col("text")).alias("score"))
    agg = scored.agg(
        F.count("*").alias("__total__"),
        *[
            F.sum((F.col("score") >= F.lit(t)).cast("long")).alias(f"__s{i}__")
            for i, t in enumerate(_SWEEP_THRESHOLDS)
        ],
    )
    stack_args = ", ".join(
        f"cast({t} as double), __s{i}__" for i, t in enumerate(_SWEEP_THRESHOLDS)
    )
    return agg.selectExpr(
        f"stack({len(_SWEEP_THRESHOLDS)}, {stack_args}) AS (threshold, n_surviving)",
        "__total__",
    ).select(
        "threshold",
        "n_surviving",
        F.round(F.col("n_surviving") / F.col("__total__"), 6).alias(
            "survival_rate"
        ),
    )


@register(
    "token_entropy_by_source",
    oracle="""
WITH toks AS (
  SELECT d.source, t.token
  FROM documents d,
       unnest(list_filter(string_split_regex(lower(trim(d.text)), '\\s+'),
                          x -> x <> '')) AS t(token)
  WHERE d.source IS NOT NULL
),
counts AS (
  SELECT source, token, count(*) AS c FROM toks GROUP BY source, token
),
tot AS (SELECT source, CAST(sum(c) AS DOUBLE) AS n,
               count(*) AS vocab FROM counts GROUP BY source)
SELECT c.source, CAST(t.n AS BIGINT) AS n_tokens, t.vocab AS vocab_size,
       round(-sum((c.c / t.n) * ln(c.c / t.n)), 6) AS token_entropy,
       CASE WHEN t.vocab = 1 THEN 0.0
            ELSE round(-sum((c.c / t.n) * ln(c.c / t.n)) / ln(t.vocab), 6)
       END AS normalized_entropy
FROM counts c JOIN tot t USING (source)
GROUP BY c.source, t.n, t.vocab
""",
    doc="Corpus diversity per source: Shannon entropy of the token "
    "distribution and its normalized form (entropy / ln(vocab) ∈ [0,1] "
    "— 1 = uniform vocabulary use, →0 = degenerate repetition), the "
    "curation metric that catches template-generated or looping "
    "sources that length/TTR heuristics miss.  FULLY value-oracled "
    "(same lower-token contract as build_vocab).  Scale shape: "
    "explode → (source, token) partial-combine agg; the entropy sums "
    "run over the vocabulary-sized count table, not the corpus.",
)
def token_entropy_by_source(spark, sf_dir):
    from crick_spark.pipeline.text import lower_tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    counts = (
        docs.select(
            "source", F.explode(lower_tokens_expr(F.col("text"))).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    # margins via windows over the vocab-sized count table — the corpus
    # explode+aggregate runs ONCE (a join back to a rollup of counts
    # would execute the expensive stage twice)
    w = W.partitionBy("source")
    enriched = counts.select(
        "source",
        "c",
        F.sum("c").over(w).cast("double").alias("n"),
        F.count("*").over(w).alias("vocab"),
    )
    p = F.col("c") / F.col("n")
    # normalized entropy divides the UNROUNDED sum (the oracle does the
    # same); a single-token vocabulary is DEFINED as 0 (maximally
    # degenerate — the case the metric exists to flag; 0/ln(1) would be
    # NULL and slip past a < threshold filter)
    return (
        enriched.groupBy("source", "n", "vocab")
        .agg((-F.sum(p * F.log(p))).alias("__h__"))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.col("vocab").alias("vocab_size"),
            F.round("__h__", 6).alias("token_entropy"),
            F.when(F.col("vocab") == 1, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("__h__") / F.log(F.col("vocab").cast("double")), 6
                )
            )
            .alias("normalized_entropy"),
        )
    )


@register(
    "split_balance_check",
    oracle="""
WITH s AS (
  SELECT lang,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                IN ('0','1','2','3','4','5','6','7','8','9','a','b')
              THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
              THEN 'val' ELSE 'test' END AS split,
         len(string_split_regex(trim(text), '\\s+')) AS toks
  FROM documents WHERE lang IS NOT NULL
),
per AS (
  SELECT split, lang, count(*) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS n_tokens
  FROM s GROUP BY split, lang
),
tot AS (
  SELECT split, sum(n_docs) AS split_docs FROM per GROUP BY split
),
gshare AS (
  SELECT lang, sum(n_docs) * 1.0 / (SELECT count(*) FROM s) AS g_share
  FROM per GROUP BY lang
)
SELECT p.split, p.lang, p.n_docs, p.n_tokens,
       round(p.n_docs * 1.0 / t.split_docs, 6) AS split_share,
       abs(p.n_docs * 1.0 / t.split_docs - g.g_share) <= 0.05
         AS share_within_5pct
FROM per p JOIN tot t USING (split) JOIN gshare g USING (lang)
""",
    doc="Split-balance QA: per (split, lang) doc/token counts, the "
    "language share inside each split, and a boolean asserting every "
    "in-split language share is within 5 percentage points of the "
    "global share — the unbiasedness check a curator runs on the md5 "
    "split before trusting eval numbers (a content-correlated split "
    "key would skew it).  FULLY value-oracled, booleans hashed: a "
    "regenerated fixture where the hash split went language-biased "
    "breaks the driver hash.  Scale: one rollup shuffle; shares "
    "computed on the |splits|×|langs| table.",
)
def split_balance_check(spark, sf_dir):
    from crick_spark.pipeline.dedup import words_expr

    docs = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    s = docs.select(
        "lang",
        split.alias("split"),
        F.size(words_expr(F.col("text"))).alias("toks"),
    )
    from pyspark.sql import Window as W

    # ONE corpus rollup; every margin (per-split totals, per-lang
    # totals, grand total) comes from windows over the |splits|x|langs|
    # result — re-aggregating `per` in separate branches would rescan
    # and re-tokenize the documents table once per branch
    per = s.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("n_tokens")
    )
    w_split = W.partitionBy("split")
    w_lang = W.partitionBy("lang")
    w_all = W.partitionBy()
    share = F.col("n_docs") / F.sum("n_docs").over(w_split)
    g_share = F.sum("n_docs").over(w_lang) / F.sum("n_docs").over(w_all)
    return per.select(
        "split",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("split_share"),
        (F.abs(share - g_share) <= F.lit(0.05)).alias("share_within_5pct"),
    )


@register(
    "tfidf_similar_docs",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, t.term
  FROM wrd,
       unnest(CASE WHEN len(ws) - 2 >= 1
         THEN list_transform(generate_series(1, len(ws) - 2),
                             i -> array_to_string(ws[i:i+2], ' '))
         ELSE [] END) AS t(term)
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok GROUP BY doc_id, term
),
dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / dft.df) AS w
  FROM tf JOIN dft USING (term), n
  WHERE dft.df < n.n_docs
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
wb AS (
  SELECT w.doc_id, w.term, w.w, d.lang FROM w JOIN documents d USING (doc_id)
),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
  FROM wb a JOIN wb b
    ON a.term = b.term AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(dot / (na.nrm * nb.nrm), 6) AS tfidf_cosine
FROM dots
JOIN nrm na ON dots.id_a = na.doc_id
JOIN nrm nb ON dots.id_b = nb.doc_id
WHERE dot / (na.nrm * nb.nrm) >= 0.5
""",
    doc="TF-IDF cosine document pairs (>=0.5, word-3-gram terms, blocked "
    "by language) via sparse posting-list "
    "self-join — the lexical similarity measure between set Jaccard and "
    "dense embedding cosine; w = tf*ln(N/df), idf=0 stop terms dropped "
    "(zero weight AND the hottest join bucket), cost Sum_t df_t^2 never "
    "|docs|^2.  max_df_ratio is the documented 100 TB skew cap.  Exact "
    "-> FULLY value-oracled.",
)
def tfidf_similar_docs(spark, sf_dir):
    from crick_spark.pipeline.retrieval import tfidf_similar_pairs

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_similar_pairs(docs, threshold=0.5, ngram=3, block_col="lang")


@register(
    "leakage_free_split_documents",
    oracle="""
WITH assign AS (
  SELECT doc_id, source,
    CASE
      WHEN substring(md5(source), 1, 1) IN
           ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
      WHEN substring(md5(source), 1, 1) IN ('c','d') THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
),
per_source AS (
  SELECT source, min(split) AS split, count(*) AS n_docs,
         count(DISTINCT split) AS n_splits
  FROM assign GROUP BY source
),
leak AS (
  SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS leaky_sources
  FROM per_source
)
SELECT split,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       count(*) AS n_sources,
       round(sum(n_docs) / (SELECT CAST(sum(n_docs) AS DOUBLE)
                            FROM per_source), 6) AS share,
       (SELECT leaky_sources FROM leak) AS leaky_sources
FROM per_source GROUP BY split
""",
    doc="Group-aware (leakage-free) train/val/test split: the split is a "
    "deterministic function of the SOURCE (md5 nibble coin, 12/2/4), so "
    "no source ever straddles splits - the eval-contamination failure "
    "mode of doc-level splitting.  The audit recomputes leakage from the "
    "per-doc assignment (count of sources seen in >1 split, pinned 0 in "
    "the oracle).  Scale: one groupBy(source) rollup + a |sources|-row "
    "rollup to splits; the share denominator is a window, not a rescan.",
)
def leakage_free_split_documents(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("source")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    per_source = (
        docs.select("source", split.alias("split"))
        .groupBy("source")
        .agg(
            F.min("split").alias("split"),
            F.count("*").alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
        )
    )
    # per-split rollup FIRST; the global denominators come from windows
    # over the |splits|-row result, so the single-partition window the
    # plan needs touches 3 rows, never the |sources| relation
    per_split = per_source.groupBy("split").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count("*").alias("n_sources"),
        F.sum((F.col("n_splits") > 1).cast("long")).alias("leaky_here"),
    )
    w_all = W.partitionBy()
    return per_split.select(
        "split",
        "n_docs",
        "n_sources",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w_all).cast("double"), 6
        ).alias("share"),
        F.sum("leaky_here").over(w_all).alias("leaky_sources"),
    )


@register(
    "segment_dedup_documents",
    oracle=r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\s+') AS words
  FROM documents
  WHERE len(string_split_regex(trim(coalesce(text, '')), '\s+')) > 0
    AND trim(coalesce(text, '')) <> ''
),
segs AS (
  SELECT doc_id,
         array_to_string(words[(i * 20 + 1):(i * 20 + 20)], ' ') AS seg
  FROM w,
       unnest(generate_series(0,
              CAST(ceil(len(words) / 20.0) AS INT) - 1)) AS t(i)
),
census AS (
  SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY seg
),
per AS (
  SELECT s.doc_id, count(*) AS n_segs,
         sum(CASE WHEN c.nd > 1 THEN 1 ELSE 0 END) AS n_dup_segs
  FROM segs s JOIN census c USING (seg)
  GROUP BY s.doc_id
)
SELECT doc_id, n_segs, CAST(n_dup_segs AS BIGINT) AS n_dup_segs,
       round(n_dup_segs / CAST(n_segs AS DOUBLE), 6) AS dup_frac,
       (n_dup_segs / CAST(n_segs AS DOUBLE)) < 0.5 AS keep
FROM per
""",
    doc="Sub-document dedup at 20-word segment granularity (the C4/"
    "RefinedWeb line-dedup pattern over a corpus with no line structure): "
    "per doc the fraction of segments appearing verbatim in other docs, "
    "plus the keep verdict (<0.5) - catches shared boilerplate whole-doc "
    "hashing misses.  Segments stay JVM-side; the census shuffles 16-B "
    "md5 hashes, never text; 2 linear shuffles, nothing pairwise.  "
    "FULLY value-oracled.",
)
def segment_dedup_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import segment_dedup_stats

    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup_stats(docs, seg_words=20, keep_below=0.5)


@register(
    "repeated_substring_spans_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
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
spans AS (
  SELECT doc_id, min(s) AS span_start, max(s) + 9 AS span_end,
         count(*) AS n_windows
  FROM isl GROUP BY doc_id, g
),
per_doc AS (
  SELECT doc_id, count(*) AS n_dup_spans,
         sum(span_end - span_start + 1) AS dup_words
  FROM spans GROUP BY doc_id
)
SELECT w.doc_id, CAST(len(w.ws) AS INT) AS n_words,
       CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(p.dup_words, 0) AS BIGINT) AS dup_words,
       round(CAST(coalesce(p.dup_words, 0) AS DOUBLE) / len(w.ws), 6)
         AS dup_frac,
       CAST(coalesce(p.dup_words, 0) AS DOUBLE) / len(w.ws) < 0.5 AS keep
FROM wrd w LEFT JOIN per_doc p USING (doc_id)
WHERE len(w.ws) > 0
""",
    doc="Exact repeated-substring detection (Lee et al. ACL 2022, the "
    "suffix-array dedup signal, re-expressed Spark-first as rolling "
    "10-word window hashes): every window occurring more than once in "
    "the corpus (any doc, any position, incl. self-repeats) marks its "
    "start; duplicated starts merge into MAXIMAL spans per doc by a "
    "gaps-and-islands running-max window, and each doc reports its "
    "repeated-passage coverage + keep verdict.  Catches repeats that "
    "whole-doc hashing and fixed segments both miss (a repeated "
    "passage can start anywhere).  Window text never leaves the row - "
    "only 16-B md5s shuffle; census is one partial-agg hash rollup.  "
    "FULLY value-oracled per doc.",
)
def repeated_substring_spans_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import repeated_window_stats

    docs = load_table(spark, sf_dir, "documents")
    return repeated_window_stats(docs, window_words=10, keep_below=0.5)


@register(
    "repeated_span_removal_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
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
spans AS (
  SELECT doc_id, min(s) AS ss, max(s) + 9 AS se FROM isl GROUP BY doc_id, g
),
fam AS (
  SELECT sp.doc_id, sp.ss, sp.se,
         md5(array_to_string(w.ws[sp.ss:sp.ss+9], ' ')) AS lead
  FROM spans sp JOIN wrd w USING (doc_id)
),
cut AS (
  SELECT doc_id, ss, se FROM (
    SELECT fam.*, row_number() OVER (
      PARTITION BY lead ORDER BY doc_id, ss) AS rk
    FROM fam
  ) WHERE rk > 1
),
cutlists AS (
  SELECT doc_id, list({'s': ss, 'e': se}) AS sp FROM cut GROUP BY doc_id
)
SELECT w.doc_id,
       -- coalesce: DuckDB's array_to_string of an EMPTY list is NULL,
       -- Spark's array_join is '' - fully-removed docs must agree
       md5(coalesce(array_to_string(list_transform(
         list_filter(generate_series(1, len(w.ws)),
           p -> len(list_filter(coalesce(c.sp, []),
                    x -> p >= x.s AND p <= x.e)) = 0),
         p -> w.ws[p]), ' '), '')) AS cleaned_md5,
       CAST(coalesce((SELECT sum(se - ss + 1) FROM cut
                      WHERE cut.doc_id = w.doc_id), 0) AS INT)
         AS n_words_removed
FROM wrd w LEFT JOIN cutlists c USING (doc_id)
""",
    doc="APPLY step of exact repeated-substring dedup (r7, de-skewed "
    "r8): duplicated spans are removed from the text with the "
    "corpus-wide FIRST occurrence of each repeated passage retained "
    "(smallest (doc id, start) within the span family, keyed by the "
    "md5 of the span's LEADING 10-word window — carried out of "
    "detection, so the apply step never re-tokenizes the corpus), so "
    "one copy survives - Lee et al.'s remove-the-repeated-bytes "
    "transform, which they report beats dropping whole documents.  "
    "Winner selection is min(struct(doc_id, start)) per family (map- "
    "side combinable; no rank window over a hot passage family).  "
    "FULLY value-oracled: the md5 of every doc's REBUILT text and its "
    "removed-word count hash-match a DuckDB implementation of the same "
    "family/rebuild logic.",
)
def repeated_span_removal_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import (
        remove_repeated_spans,
        repeated_window_spans,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    spans = repeated_window_spans(docs, window_words=10)
    cleaned = remove_repeated_spans(docs, spans)
    return cleaned.select(
        "doc_id",
        F.md5("text").alias("cleaned_md5"),
        F.col("n_words_removed").cast("int").alias("n_words_removed"),
    )


@register(
    "pca_embeddings_variance",
    oracle="""
WITH e AS (
  SELECT unnest(embedding) AS v, generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
tv AS (
  SELECT round(sum(vv), 4) AS total_var
  FROM (SELECT var_samp(v) AS vv FROM e GROUP BY dim)
)
SELECT i AS component, TRUE AS ratio_monotone, TRUE AS ratio_in_range,
       TRUE AS orthonormal, TRUE AS cum_ratio_le_1, tv.total_var
FROM generate_series(0, 4) AS t(i), tv
""",
    doc="PCA over the embedding column: covariance from per-partition "
    "moment partials (count, Sum x, Sum xx^T - d^2 floats per partition, "
    "vectors never shuffled; deterministic sorted driver fold), "
    "eigendecomposition driver-side (d x d, embedding-sized not "
    "data-sized), canonical sign fix.  Hash-matched: per component the "
    "explained-variance ratio is monotone nonincreasing and in (0,1], "
    "components are orthonormal, cumulative ratio <= 1, and the "
    "covariance TRACE equals DuckDB's per-dimension var_samp sum at the "
    "1e-4 grid - the cross-engine value check eigenvalues themselves "
    "can't provide.",
)
def pca_embeddings_variance(spark, sf_dir):
    import numpy as np

    from crick_spark.pipeline.similarity import pca_components

    emb = load_table(spark, sf_dir, "embeddings")
    mean, comps, vals, ratio = pca_components(emb, "embedding", k=5)
    gram = comps @ comps.T
    orthonormal = bool(
        np.abs(gram - np.eye(comps.shape[0])).max() <= 1e-9
    )
    monotone = bool(np.all(np.diff(ratio) <= 1e-12))
    in_range = bool(np.all((ratio > 0) & (ratio <= 1.0)))
    cum_le_1 = bool(ratio.sum() <= 1.0 + 1e-12)
    total_var = float(vals[0] / ratio[0]) if ratio[0] > 0 else 0.0
    rows = [
        (
            int(i),
            monotone,
            in_range,
            orthonormal,
            cum_le_1,
            round(total_var, 4),
        )
        for i in range(comps.shape[0])
    ]
    return spark.createDataFrame(
        rows,
        "component long, ratio_monotone boolean, ratio_in_range boolean, "
        "orthonormal boolean, cum_ratio_le_1 boolean, total_var double",
    )


@register(
    "bigram_lm_scores_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM wrd, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
tok AS (SELECT unnest(ws) AS w FROM wrd),
uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t_tokens FROM tok),
big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2)
SELECT bg.doc_id, count(*) AS n_bigrams,
       round(avg(ln(0.7 * big.c12 / u1.c + 0.3 * u2.c / tot.t_tokens)), 6)
         AS avg_logp
FROM bg
JOIN big USING (w1, w2)
JOIN uni u1 ON bg.w1 = u1.w
JOIN uni u2 ON bg.w2 = u2.w
CROSS JOIN tot
GROUP BY bg.doc_id
""",
    doc="CCNet-style LM quality scoring: per-doc mean log-prob of word "
    "bigrams under the corpus-trained interpolated bigram model "
    "P(w2|w1) = 0.7 c12/c1 + 0.3 c2/T - the perplexity-bucket signal "
    "curation pipelines filter on.  Model tables are Heaps-bounded "
    "(|bigrams|, |vocab| rows, not corpus-sized); scoring is equi-joins "
    "+ one per-doc aggregate, all codegen.  FULLY value-oracled.",
)
def bigram_lm_scores_documents(spark, sf_dir):
    from crick_spark.pipeline.text import bigram_lm_scores

    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, lam=0.7)


@register(
    "bpe_encode_documents",
    oracle=_bpe_wordtable_cte(8)
    + r""", wt AS (
  SELECT word,
         len(list_filter(string_split(st, ' '), x -> x <> '')) AS n_toks
  FROM w8
), wrd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(lower(text), '')),
                     '\s+'), x -> x <> '') AS ws
  FROM documents
), docw AS (
  SELECT w.doc_id, t.word FROM wrd w, unnest(w.ws) AS t(word)
), doctok AS (
  SELECT docw.doc_id,
         CASE WHEN length(docw.word) = 1 THEN 1 ELSE wt.n_toks END AS n_toks
  FROM docw LEFT JOIN wt USING (word)
)
SELECT (SELECT count(*) FROM wrd) AS n_docs,
       (SELECT CAST(sum(len(ws)) AS BIGINT) FROM wrd) AS total_words,
       (SELECT CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM doctok)
         AS total_tokens,
       TRUE AS roundtrip_ok, TRUE AS tokens_lt_chars,
       TRUE AS tokens_ge_words
""",
    doc="BPE ENCODE (r7; oracle upgraded r13) - the apply half of the "
    "tokenizer story: the corpus tokenized with bpe_train's learned "
    "merges by rank-priority encoding (lowest merge rank first, "
    "byte-identical to replaying training order - pytest-pinned).  The "
    "DISTINCT word table is encoded once in an Arrow kernel "
    "(Heaps-bounded; merge list in the closure), docs rebuild token "
    "sequences positionally.  Oracle: n_docs, total_words AND "
    "total_tokens value-matched - DuckDB replays the 8 training rounds "
    "through the unrolled-CTE word table (_bpe_wordtable_cte) and "
    "recomputes every word's exact token count independently (length-1 "
    "words, outside the trainer's >= 2 table, tokenize as themselves) - "
    "plus hash-matched booleans: every doc's token concatenation "
    "rebuilds its lowercased words exactly (lossless), total tokens < "
    "total chars (merges actually fired) and >= total words (no "
    "over-merging across words).",
)
def bpe_encode_documents(spark, sf_dir):
    from crick_spark.pipeline.text import (
        bpe_encode,
        bpe_train,
        lower_tokens_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=8, batch_size=8)
    enc = bpe_encode(docs, merges)
    ref = docs.select(
        "doc_id",
        F.array_join(lower_tokens_expr(F.col("text")), "").alias("__wj__"),
    )
    return (
        enc.join(ref, "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_tokens").alias("total_tokens"),
            F.bool_and(
                F.array_join("tokens", "") == F.col("__wj__")
            ).alias("roundtrip_ok"),
            (F.sum("n_tokens") < F.sum(F.length("__wj__"))).alias(
                "tokens_lt_chars"
            ),
            (F.sum("n_tokens") >= F.sum("n_words")).alias("tokens_ge_words"),
        )
    )


@register(
    "dsir_select_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM wrd),
tgt_tok AS (SELECT unnest(ws) AS tok FROM wrd WHERE lang = 'en'),
src_cnt AS (SELECT tok, count(*) AS c_src FROM tok GROUP BY tok),
tgt_cnt AS (SELECT tok, count(*) AS c_tgt FROM tgt_tok GROUP BY tok),
vocab AS (
  SELECT v.tok, coalesce(s.c_src, 0) AS c_src, coalesce(t.c_tgt, 0) AS c_tgt
  FROM (SELECT tok FROM src_cnt UNION SELECT tok FROM tgt_cnt) v
  LEFT JOIN src_cnt s USING (tok) LEFT JOIN tgt_cnt t USING (tok)
),
tot AS (SELECT CAST(sum(c_src) AS DOUBLE) AS t_src,
               CAST(sum(c_tgt) AS DOUBLE) AS t_tgt,
               CAST(count(*) AS DOUBLE) AS v FROM vocab),
lr AS (
  SELECT tok.doc_id, count(*) AS n_tokens,
         round(sum(ln((c_tgt + 1) / (t_tgt + v))
                 - ln((c_src + 1) / (t_src + v))), 6) AS log_ratio
  FROM tok JOIN vocab USING (tok) CROSS JOIN tot
  GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens, log_ratio FROM (
  SELECT lr.*, row_number() OVER (ORDER BY
    log_ratio - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                        + 0.5) / 16777216.0)) DESC, doc_id) AS rk
  FROM lr
) WHERE rk <= 50
""",
    doc="DSIR data selection (Xie et al., NeurIPS 2023): every raw doc "
    "scored by log p_target/p_source under add-1 unigram LMs (target = "
    "the English subcorpus, source = the whole corpus; union-vocab "
    "smoothing so both are proper distributions), then 50 docs drawn "
    "WITHOUT replacement toward the target distribution via the "
    "Gumbel-top-k trick DSIR itself uses, with the repo's deterministic "
    "md5 coin (log-space throughout - the ES u^(1/w) comparator "
    "overflows at token-sum log-ratios).  Model tables are vocab-sized "
    "(hash to fixed buckets at 100 TB, semantics identical); scoring is "
    "two equi-joins + a per-doc aggregate, all codegen.  FULLY "
    "value-oracled: DuckDB reproduces weights, Gumbel keys, and the "
    "exact selected set.",
)
def dsir_select_documents(spark, sf_dir):
    from crick_spark.pipeline.sampling import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    return dsir_resample(docs, target, k=50)


@register(
    "dsir_select_hashed_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
raw AS (SELECT doc_id, lang, unnest(ws) AS t FROM wrd),
tok AS (
  SELECT doc_id,
         ('0x' || substr(md5(t), 1, 8))::BIGINT % 512 AS tok
  FROM raw
),
tgt_tok AS (
  SELECT ('0x' || substr(md5(t), 1, 8))::BIGINT % 512 AS tok
  FROM raw WHERE lang = 'en'
),
src_cnt AS (SELECT tok, count(*) AS c_src FROM tok GROUP BY tok),
tgt_cnt AS (SELECT tok, count(*) AS c_tgt FROM tgt_tok GROUP BY tok),
vocab AS (
  SELECT v.tok, coalesce(s.c_src, 0) AS c_src, coalesce(t.c_tgt, 0) AS c_tgt
  FROM (SELECT tok FROM src_cnt UNION SELECT tok FROM tgt_cnt) v
  LEFT JOIN src_cnt s USING (tok) LEFT JOIN tgt_cnt t USING (tok)
),
tot AS (SELECT CAST(sum(c_src) AS DOUBLE) AS t_src,
               CAST(sum(c_tgt) AS DOUBLE) AS t_tgt,
               512.0 AS v FROM vocab),
lr AS (
  SELECT tok.doc_id, count(*) AS n_tokens,
         round(sum(ln((c_tgt + 1) / (t_tgt + v))
                 - ln((c_src + 1) / (t_src + v))), 6) AS log_ratio
  FROM tok JOIN vocab USING (tok) CROSS JOIN tot
  GROUP BY tok.doc_id
)
SELECT doc_id, n_tokens, log_ratio FROM (
  SELECT lr.*, row_number() OVER (ORDER BY
    log_ratio - ln(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                        + 0.5) / 16777216.0)) DESC, doc_id) AS rk
  FROM lr
) WHERE rk <= 50
""",
    doc="DSIR selection over HASHED features (r8, the 100 TB path the "
    "raw-token docstring deferred): tokens map to md5-mod-512 buckets "
    "BEFORE the censuses, so both model tables are exactly <= 512 rows "
    "at any corpus size and smoothing runs over the fixed bucket "
    "support (V = n_buckets) - Xie et al.'s own fixed-table trick.  "
    "512 buckets against a corpus vocabulary in the thousands forces "
    "real collisions, so this gate exercises the degraded-model path, "
    "not a vacuous no-collision one.  Same Gumbel-top-k draw and "
    "deterministic md5 coin as dsir_select_documents.  FULLY "
    "value-oracled: DuckDB reproduces bucket ids, model weights, "
    "Gumbel keys, and the exact selected set.",
)
def dsir_select_hashed_documents(spark, sf_dir):
    from crick_spark.pipeline.sampling import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    return dsir_resample(docs, target, k=50, n_buckets=512)


@register(
    "kneser_ney_lm_scores_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM wrd, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n_cont FROM big GROUP BY w1),
cont AS (SELECT w2, count(*) AS n_left FROM big GROUP BY w2),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM big)
SELECT bg.doc_id, count(*) AS n_bigrams,
       round(avg(ln(greatest(big.c12 - 0.75, 0) / c1.c1
                    + 0.75 * c1.n_cont / c1.c1
                      * (cont.n_left / tot.n_types))), 6) AS avg_logp
FROM bg
JOIN big USING (w1, w2)
JOIN c1 USING (w1)
JOIN cont USING (w2)
CROSS JOIN tot
GROUP BY bg.doc_id
""",
    doc="Interpolated-Kneser-Ney bigram LM scoring (r7) - the KenLM "
    "smoothing family CCNet's perplexity buckets actually use: unseen/"
    "rare bigrams back off to CONTINUATION probability N1+(.,w2)/"
    "N1+(.,.) rather than raw unigram frequency, with absolute "
    "discount D=0.75 and context-weighted backoff mass D*N1+(w1,.)/"
    "c(w1).  All model tables are bigram-TYPE-counted (Heaps-bounded, "
    "never corpus-sized); scoring is equi-joins + one per-doc "
    "aggregate, all codegen.  FULLY value-oracled per doc.",
)
def kneser_ney_lm_scores_documents(spark, sf_dir):
    from crick_spark.pipeline.text import kneser_ney_bigram_scores

    docs = load_table(spark, sf_dir, "documents")
    return kneser_ney_bigram_scores(docs, discount=0.75)


@register(
    "perplexity_buckets_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM wrd, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2
),
big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1, count(*) AS n_cont FROM big GROUP BY w1),
cont AS (SELECT w2, count(*) AS n_left FROM big GROUP BY w2),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_types FROM big),
scores AS (
  SELECT bg.doc_id, count(*) AS n_bigrams,
         round(avg(ln(greatest(big.c12 - 0.75, 0) / c1.c1
                      + 0.75 * c1.n_cont / c1.c1
                        * (cont.n_left / tot.n_types))), 6) AS avg_logp
  FROM bg
  JOIN big USING (w1, w2)
  JOIN c1 USING (w1)
  JOIN cont USING (w2)
  CROSS JOIN tot
  GROUP BY bg.doc_id
),
cuts AS (
  SELECT quantile_cont(avg_logp, 2.0 / 3.0) AS h,
         quantile_cont(avg_logp, 1.0 / 3.0) AS m
  FROM scores
)
SELECT doc_id, n_bigrams, avg_logp,
       CASE WHEN avg_logp >= h THEN 'head'
            WHEN avg_logp >= m THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scores CROSS JOIN cuts
""",
    doc="CCNet's head/middle/tail perplexity bucketing - the artifact "
    "its pipeline ships: every doc scored under the corpus-trained "
    "Kneser-Ney bigram model, split at the corpus's own avg-logp "
    "terciles (exact interpolated percentiles, computed once and "
    "broadcast - no per-row rank window).  head = most fluent, the "
    "slice kept preferentially for LM training.  FULLY value-oracled "
    "incl. the bucket labels (Spark percentile and DuckDB "
    "quantile_cont share (n-1)*p interpolation - the "
    "moving_median_revenue parity, over 6-dp-rounded scores).",
)
def perplexity_buckets_documents(spark, sf_dir):
    from crick_spark.pipeline.text import perplexity_buckets

    docs = load_table(spark, sf_dir, "documents")
    return perplexity_buckets(docs, discount=0.75)


# Shared by dedup_clusters_documents (batch closure) and
# incremental_dedup_clusters (batched ClusterStore folds): both must
# reproduce the same DuckDB recursive-CTE reachability closure over the
# identical exact-Jaccard pair set.
_CLUSTERS_ORACLE = r"""
WITH RECURSIVE s AS MATERIALIZED (
  SELECT doc_id, lang,
    CASE WHEN len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2),
             i -> array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+')[i:i+2], ' ')))
      ELSE [array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+'), ' ')]
    END AS sh
  FROM documents
),
pairs AS MATERIALIZED (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
    FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
  ) WHERE j >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT u AS node, u AS r FROM edges
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
SELECT component, count(*) AS n_docs
FROM comp GROUP BY component
"""


@register(
    "dedup_clusters_documents",
    oracle=_CLUSTERS_ORACLE,
    doc="Near-duplicate CLUSTERS: the exact 3-gram Jaccard pairs "
    "(>=0.5, lang-blocked - the already-oracled ground truth) closed "
    "transitively by hash-min label propagation "
    "(pipeline/graph.py:connected_components; converges in O(diameter) "
    "supersteps, lineage truncated per step), emitting one row per "
    "cluster with its size and min-id canonical representative.  The "
    "step every dedup pipeline needs between pair detection and doc "
    "removal.  Oracle: DuckDB recursive-CTE reachability closure + "
    "min-label rollup over the identical pair set.",
)
def dedup_clusters_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import jaccard_ngram_pairs
    from crick_spark.pipeline.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    return cc.groupBy("component").agg(F.count("*").alias("n_docs"))


@register(
    "incremental_dedup_clusters",
    oracle=_CLUSTERS_ORACLE,
    doc="INCREMENTAL cluster maintenance (r6 VERDICT item 6; r8: "
    "bucketed snapshots - folds rewrite only touched buckets): the "
    "same exact-Jaccard pair set as dedup_clusters_documents, but "
    "delivered in 2 deterministic batches folded one at a time into a "
    "persisted (node, component) labeling (streaming/cluster_store.py) "
    "- per "
    "batch the closure runs only on the CONTRACTED graph (endpoints "
    "replaced by their stored labels, O(|batch|) edges), then a "
    "batch-bounded broadcast mapping relabels merged components; "
    "history's pairs are never re-read.  Hash-matched against the "
    "recursive-CTE closure of the FULL pair set: incremental folding "
    "must be exactly equivalent to batch re-closure (min-label algebra "
    "makes it so - min over representatives = min over members).",
)
def incremental_dedup_clusters(spark, sf_dir):
    import shutil

    from crick_spark.streaming.cluster_store import ClusterStore

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    ).localCheckpoint(eager=True)
    work = run_tmpdir("crick_clusterstore_")
    store = ClusterStore(f"{work}/store")
    for bid in range(2):
        store.fold(
            pairs.where(
                F.pmod(F.xxhash64("id_a", "id_b"), F.lit(2)) == bid
            ),
            bid,
        )
    out = (
        store.labels(spark)
        .groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "containment_ngram_pairs_documents",
    oracle=r"""
WITH s AS (
  SELECT doc_id, lang,
    CASE WHEN len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2 >= 1
      THEN list_distinct(list_transform(
             generate_series(1, len(string_split_regex(trim(coalesce(text, '')), '\s+')) - 2),
             i -> array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+')[i:i+2], ' ')))
      ELSE [array_to_string(string_split_regex(trim(coalesce(text, '')), '\s+'), ' ')]
    END AS sh
  FROM documents
)
SELECT id_a, id_b, round(c, 6) AS containment FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS c
  FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
) WHERE c >= 0.8
""",
    doc="Asymmetric containment pairs |A-int-B|/|A| >= 0.8 over distinct "
    "3-gram shingles (lang-blocked) - the quote/partial-copy detector "
    "Jaccard misses: a short doc fully quoted in a long one has tiny "
    "Jaccard but containment 1.0.  Ordered pairs, both directions "
    "scored.  Same sparse posting join as the Jaccard ground truth; "
    "FULLY value-oracled.",
)
def containment_ngram_pairs_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import containment_ngram_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.8, n=3
    )


@register(
    "hybrid_rrf_retrieval",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS dl,
{_BM25_SQL_TF}
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         avg(dl) AS avgdl,
{_BM25_SQL_DF}
  FROM base
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round({_BM25_SQL_SCORE}, 6) DESC,
                            doc_id ASC) AS rnk
  FROM base, stats
  ORDER BY rnk LIMIT 20
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
dscored AS (
  SELECT e.vec_id AS doc_id,
         round(
           list_sum(list_transform(list_zip(e.embedding, q.qe),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)))
              * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * x)))),
           6) AS cosine
  FROM embeddings e, q
),
dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS rnk
  FROM dscored
  ORDER BY rnk LIMIT 20
),
fused AS (
  SELECT doc_id, round(sum(1.0 / (60.0 + rnk)), 6) AS rrf,
         count(*) AS n_lists
  FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense)
  GROUP BY doc_id
)
SELECT doc_id, rrf, n_lists FROM fused
ORDER BY rrf DESC, doc_id ASC LIMIT 10
""",
    doc="Hybrid retrieval via reciprocal-rank fusion (Cormack et al. "
    "2009): BM25 top-20 (lexical) and exact-cosine top-20 (dense, "
    "query vec 0; doc_id==vec_id is the corpus mapping) fused as "
    "sum 1/(60+rank) - the standard scale-free combiner RAG pipelines "
    "use.  Ranks come from ROUNDED scores with the engine-wide "
    "tie-break so both engines rank identically.  Fusion is a union + "
    "one hash aggregate over list-length rows; final top-10 is "
    "TakeOrderedAndProject.  FULLY value-oracled.",
)
def hybrid_rrf_retrieval(spark, sf_dir):
    from pyspark.sql import Window as W

    from crick_spark.pipeline.retrieval import bm25_topk, rrf_fuse
    from crick_spark.pipeline.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, _BM25_TERMS, k=20).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("rank"),
    )
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    dense = (
        cosine_topk(emb, list(qvec), k=20)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round("cosine", 6).alias("cosine"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.desc("cosine"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    return rrf_fuse([lex, dense], id_col="doc_id", k=10)


@register(
    "knn_pq_ann",
    oracle="SELECT TRUE AS recall_ok",
    doc="Product-quantization ANN (Jegou et al. 2011): per-subspace "
    "k-means codebooks (16 subspaces x 16 centroids = 8 bytes/vector, "
    "trained on a "
    "bounded deterministic sample - the FAISS practice), distributed "
    "Arrow encode, ADC scan (m table lookups per row - 4 bytes/vector "
    "vs 256 for f32, the billion-vector memory play), exact rerank of "
    "the 4k pool.  Hash-matched boolean oracle: recall@10 vs exact "
    "brute force >= 0.8.",
)
def knn_pq_ann(spark, sf_dir):
    from crick_spark.pipeline.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    pq = pq_topk(emb, list(query), k=10, rerank_factor=8).select("vec_id")
    exact = cosine_topk(emb, list(query), k=10).select("vec_id")
    return (
        exact.join(pq, "vec_id", "left_semi")
        .agg(F.count("*").alias("__hits__"))
        .select((F.col("__hits__") >= 8).alias("recall_ok"))
    )


@register(
    "seeded_shuffle_shards_documents",
    oracle="""
WITH c AS (
  SELECT doc_id, md5('epoch0' || CAST(doc_id AS VARCHAR)) AS coin
  FROM documents
),
s AS (
  SELECT doc_id, coin,
         CASE substring(coin, 1, 1)
           WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3
           WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7
           WHEN '8' THEN 0 WHEN '9' THEN 1 WHEN 'a' THEN 2 WHEN 'b' THEN 3
           WHEN 'c' THEN 4 WHEN 'd' THEN 5 WHEN 'e' THEN 6 ELSE 7
         END AS shard
  FROM c
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY coin, doc_id)
            AS INT) AS pos
FROM s
""",
    doc="Reproducible training-order shuffle: shard and in-shard "
    "position are pure functions of (seed, doc_id) via the md5 coin, so "
    "any worker reconstructs epoch order with zero coordination and a "
    "new seed reshuffles.  One hash projection + per-shard window sort "
    "(|corpus|/n_shards rows each, no global sort).  FULLY "
    "value-oracled per row.",
)
def seeded_shuffle_shards_documents(spark, sf_dir):
    from crick_spark.pipeline.sampling import seeded_shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    return seeded_shuffle_shards(docs, n_shards=8, seed="epoch0")


@register(
    "nb_classify_lang_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
raw AS (SELECT doc_id, lang, unnest(ws) AS t FROM wrd),
tr AS (SELECT lang AS label, t AS tok FROM raw WHERE doc_id % 2 = 0),
cnt AS (SELECT label, tok, count(*) AS c FROM tr GROUP BY label, tok),
tot AS (SELECT label, CAST(sum(c) AS DOUBLE) AS t_c FROM cnt GROUP BY label),
voc AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM cnt),
dc AS (SELECT lang AS label, count(*) AS n_docs
       FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
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
)
SELECT doc_id, predicted, log_posterior FROM (
  SELECT doc_id, label AS predicted, round(score, 6) AS log_posterior,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label ASC) AS rk
  FROM sc
) WHERE rk = 1
""",
    doc="Multinomial Naive Bayes text classifier (r8) - the "
    "fastText-classifier role of LLM curation (quality/domain "
    "classifiers trained on seed docs, corpus scored and bucketed by "
    "predicted class), in closed form: train = two hash aggregates "
    "(per-(class, token) census + class totals over the even-doc_id "
    "half), score = one posting left-join against the model with "
    "class-default smoothing for unseen (token, class) pairs, per-doc "
    "argmax (tie-break score desc, label asc) over the odd-doc_id "
    "half.  Add-1 smoothing over the union training vocabulary; model "
    "is O(|vocab| x |classes|) rows (n_buckets= hashes features for a "
    "fixed-size model at 100 TB, same trick as DSIR).  FULLY "
    "value-oracled per held-out doc: predicted class AND rounded log "
    "posterior hash-match DuckDB.",
)
def nb_classify_lang_documents(spark, sf_dir):
    from crick_spark.pipeline.classify import nb_score, nb_train

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0)
    held = docs.where(F.col("doc_id") % 2 == 1)
    lik, stats = nb_train(train, label_col="lang")
    return nb_score(held, lik, stats)


@register(
    "unigram_encode_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(lower(text), '')),
                     '\s+'), x -> x <> '') AS ws
  FROM documents
)
SELECT count(*) AS n_docs, CAST(sum(len(ws)) AS BIGINT) AS total_words,
       TRUE AS roundtrip_ok, TRUE AS tokens_le_chars,
       TRUE AS tokens_ge_words, TRUE AS pieces_in_vocab
FROM wrd
""",
    doc="Unigram-LM ENCODE (r8) - the apply half of the SECOND "
    "tokenizer family, closing its train->encode loop exactly as "
    "bpe_encode_documents closes BPE's: the corpus is Viterbi-"
    "segmented under a unigram_lm_train model (same kernel the E-step "
    "optimized, deterministic tie-breaks).  The DISTINCT word table "
    "is encoded once in an Arrow kernel (Heaps-bounded; piece table "
    "in the closure), docs rebuild token sequences positionally.  "
    "Oracle: n_docs and total_words value-matched vs SQL, plus "
    "hash-matched booleans - every doc's token concatenation rebuilds "
    "its lowercased words exactly (lossless), total tokens <= total "
    "chars (multi-char pieces fired) and >= total words (no cross-"
    "word merging), and every emitted piece is in the trained "
    "vocabulary (no unk fallback fired on the training corpus - "
    "single-char coverage is the trainer's guarantee).",
)
def unigram_encode_documents(spark, sf_dir):
    from crick_spark.pipeline.text import (
        lower_tokens_expr,
        unigram_encode,
        unigram_lm_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    model = unigram_lm_train(
        docs, vocab_size=200, seed_size=1000, em_rounds=2
    )
    pieces = {p for p, _ in model}
    enc = unigram_encode(docs, model)
    ref = docs.select(
        "doc_id",
        F.array_join(lower_tokens_expr(F.col("text")), "").alias("__wj__"),
    )
    vocab_arr = F.array(*[F.lit(p) for p in sorted(pieces)])
    return (
        enc.join(ref, "doc_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.bool_and(
                F.array_join("tokens", "") == F.col("__wj__")
            ).alias("roundtrip_ok"),
            (F.sum("n_tokens") <= F.sum(F.length("__wj__"))).alias(
                "tokens_le_chars"
            ),
            (F.sum("n_tokens") >= F.sum("n_words")).alias("tokens_ge_words"),
            F.bool_and(
                F.forall(
                    "tokens", lambda t: F.array_contains(vocab_arr, t)
                )
            ).alias("pieces_in_vocab"),
        )
    )


@register(
    "knn_ivfpq_bulk_recall",
    oracle="""
SELECT CAST(vec_id AS BIGINT) AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id, TRUE AS recall_ok
""",
    doc="IVF-PQ composite ANN quality gate (r8; thresholds raised r9) "
    "- the FAISS billion-vector workhorse assembled from the repo's "
    "two halves: IVF coarse quantizer prunes to nprobe probed clusters "
    "(the write-time partition layout at 100 TB), PQ asymmetric-"
    "distance lookups rank candidates inside them reading "
    "m*log2(ksub) BITS per vector, exact cosine rerank bounds the "
    "approximation.  Hash-matched booleans vs bulk exact top-10: "
    "per-query recall >= 0.5 and panel average >= 0.7 - the same bar "
    "as the single-approximation LSH/IVF gates.  Knobs are DERIVED, "
    "not pinned (r14, VERDICT r13 #3): choose_search_params in "
    "quality-gate mode (target_recall=0.7) measures the corpus's "
    "cluster structure and floors nprobe at (target+0.05)*nlist "
    "coverage on structureless corpora - the r13 episode (sf0.01-"
    "tuned nprobe=8 gave mean 0.64 on the 10x corpus, re-pinned by "
    "hand to 12) cannot recur, because the coverage floor rides nlist "
    "and measured structure, never corpus size.  The derivation is "
    "deterministic (seeded k-means + one structure aggregate), so the "
    "gate booleans stay stable; on this corpus it resolves to "
    "nprobe=12/rerank=16 (measured: sf0.01 0.9 min / 0.98 mean, "
    "sf0.1 0.7 min / 0.82 mean).  Rerank pool is still only 160 full "
    "vectors/query.",
)
def knn_ivfpq_bulk_recall(spark, sf_dir):
    from crick_spark.pipeline.similarity import (
        choose_search_params,
        ivfpq_bulk_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(emb, k=16, n_iter=5)
    books = train_pq_codebooks(emb, m=16, ksub=16)
    params = choose_search_params(emb, cents, target_recall=0.7)
    exact = bulk_cosine_topk(queries, emb, k=10).select("query_id", "vec_id")
    ann = ivfpq_bulk_topk(
        queries,
        emb,
        cents,
        books,
        k=10,
        nprobe=params["nprobe"],
        rerank_factor=params["rerank_factor"],
    ).select("query_id", "vec_id")
    hits = (
        exact.join(ann, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg((F.count("*") / 10.0).alias("recall"))
    )
    panel = queries.select("query_id")
    full = panel.join(hits, "query_id", "left").select(
        "query_id", F.coalesce("recall", F.lit(0.0)).alias("recall")
    )
    per_query = full.select(
        "query_id", (F.col("recall") >= 0.5).alias("recall_ok")
    )
    overall = full.agg(
        F.lit(-1).cast("bigint").alias("query_id"),
        (F.avg("recall") >= 0.7).alias("recall_ok"),
    )
    return per_query.unionByName(overall)


@register(
    "decontaminate_spans_documents",
    oracle=r"""
WITH wrd AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
  FROM documents WHERE text IS NOT NULL
),
win AS (
  SELECT doc_id, i AS s, array_to_string(ws[i:i+9], ' ') AS w
  FROM wrd, unnest(generate_series(1, len(ws) - 9)) AS t(i)
  WHERE len(ws) >= 10
),
ev AS (SELECT DISTINCT w FROM win WHERE doc_id % 10 = 0),
hit AS (
  SELECT win.doc_id, win.s FROM win JOIN ev USING (w)
  WHERE win.doc_id % 10 <> 0
),
flag AS (
  SELECT doc_id, s,
         CASE WHEN s > coalesce(max(s) OVER (PARTITION BY doc_id ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -10) + 10
              THEN 1 ELSE 0 END AS ni
  FROM hit
),
isl AS (
  SELECT doc_id, s, sum(ni) OVER (PARTITION BY doc_id ORDER BY s
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM flag
),
cut AS (
  SELECT doc_id, min(s) AS ss, max(s) + 9 AS se FROM isl GROUP BY doc_id, g
),
cutlists AS (
  SELECT doc_id, list({'s': ss, 'e': se}) AS sp FROM cut GROUP BY doc_id
)
SELECT w.doc_id,
       md5(coalesce(array_to_string(list_transform(
         list_filter(generate_series(1, len(w.ws)),
           p -> len(list_filter(coalesce(c.sp, []),
                    x -> p >= x.s AND p <= x.e)) = 0),
         p -> w.ws[p]), ' '), '')) AS cleaned_md5,
       CAST(coalesce((SELECT sum(se - ss + 1) FROM cut
                      WHERE cut.doc_id = w.doc_id), 0) AS INT)
         AS n_words_removed
FROM wrd w LEFT JOIN cutlists c USING (doc_id)
WHERE w.doc_id % 10 <> 0
""",
    doc="Span-level benchmark DECONTAMINATION (r8) - the minimal-span "
    "refinement of whole-doc n-gram decontamination: every maximal "
    "train-corpus span whose rolling 10-word windows all occur in the "
    "EVAL corpus (here the doc_id%10==0 subset standing in for a "
    "benchmark) is CUT from the training text, keeping the document - "
    "the Lee et al. remove-the-bytes transform pointed across corpora "
    "instead of at self-repeats.  Same machinery as "
    "repeated_substring_spans (rolling md5 windows, gaps-and-islands "
    "maximal spans) with the census swapped for a semi-join against "
    "the eval corpus's distinct window hashes - eval window sets are "
    "benchmark-sized, so the join side is small by construction.  "
    "FULLY value-oracled: the md5 of every train doc's REBUILT text "
    "and its removed-word count hash-match DuckDB.",
)
def decontaminate_spans_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import (
        contaminated_window_spans,
        remove_repeated_spans,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    evald = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    spans = contaminated_window_spans(train, evald, window_words=10)
    out = remove_repeated_spans(train, spans, keep_first=False)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("cleaned_md5"),
        F.col("n_words_removed").cast("int").alias("n_words_removed"),
    )


@register(
    "clustered_embeddings_structure",
    oracle="""
WITH lk(r, c) AS (VALUES (0,0),(1,0),(2,0),(3,1),(4,1),(5,1),(6,2),(7,2),
                         (8,3),(9,3),(10,4),(11,4),(12,5),(13,6),(14,7),(15,7)),
pts AS (SELECT t.i, lk.c AS true_c
        FROM range(1200) t(i) JOIN lk ON (t.i % 16) = lk.r),
vec AS (SELECT p.i, p.true_c, d.j,
               ((p.true_c*37 + d.j*101) % 211 - 105)/105.0
               + 0.6 * (((p.i*131 + d.j*61) % 997) - 498)/498.0 AS v
        FROM pts p, range(16) d(j)),
cent AS (SELECT cc.c2, d.j, ((cc.c2*37 + d.j*101) % 211 - 105)/105.0 AS w
         FROM range(8) cc(c2), range(16) d(j)),
cos AS (SELECT v.i, v.true_c, ct.c2,
               sum(v.v*ct.w) / (sqrt(sum(v.v*v.v)) * sqrt(sum(ct.w*ct.w)))
                 AS cosv
        FROM vec v JOIN cent ct USING (j)
        GROUP BY v.i, v.true_c, ct.c2),
ranked AS (SELECT i, true_c, c2, cosv,
                  row_number() OVER (PARTITION BY i
                                     ORDER BY cosv DESC, c2 ASC) AS rn
           FROM cos),
top AS (SELECT i, true_c, c2 AS top_c, cosv AS top_cos
        FROM ranked WHERE rn = 1),
own AS (SELECT i, cosv AS own_cos FROM cos WHERE c2 = true_c)
SELECT CAST(t.true_c AS INT) AS cluster, count(*) AS cnt,
       round(avg(o.own_cos), 6) AS mean_intra_cos,
       round(avg(t.top_cos), 6) AS mean_top_cos,
       round(avg(CASE WHEN t.top_c = t.true_c THEN 1.0 ELSE 0.0 END), 6)
         AS assign_acc
FROM top t JOIN own o USING (i)
GROUP BY t.true_c
""",
    doc="Cluster-structure measurement, fully value-oracled (r11, VERDICT "
    "#2): a 1200-row integer-lattice clustered corpus (8 skewed clusters, "
    "sources/synthetic.py - every float an exact rational DuckDB rebuilds "
    "from range() arithmetic, the audio-sample-formula pattern) runs "
    "through ivf_structure_stats, the batch form of ivf_layout_append's "
    "mean_top_cosine drift signal and the gate for PQ by_residual.  The "
    "oracle recomputes the full cosine profile (own-center cosine, argmax "
    "center, accuracy) in SQL, so the Arrow nearest-centroid matmul "
    "kernel itself is hash-matched against an independent implementation "
    "- per-cluster counts are skewed and noise_scale=0.6 puts assignment "
    "accuracy strictly inside (0,1), so every column is value-bearing "
    "(VERDICT #7).  One mapInPandas + one JVM groupBy, no vector shuffle.",
)
def clustered_embeddings_structure(spark, sf_dir):
    from crick_spark.pipeline.similarity import ivf_structure_stats
    from crick_spark.sources.synthetic import (
        lattice_centers,
        lattice_clustered_embeddings,
    )

    emb = lattice_clustered_embeddings(spark, n=1200, dim=16, noise_scale=0.6)
    return ivf_structure_stats(
        emb, lattice_centers(8, 16), group_col="cluster"
    )


@register(
    "video_decode_features_documents",
    oracle="""
SELECT d.doc_id,
       CAST(38 + (2 + d.doc_id % 5) * 54 AS BIGINT) AS n_bytes,
       CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
       CAST(2 + d.doc_id % 5 AS INT) AS n_frames,
       round((2 + d.doc_id % 5) / 5.0, 6) AS duration_s,
       round(avg((d.doc_id*17 + fr.f*29 + px.p*13) % 256), 6) AS mean_luma,
       round(avg(CASE WHEN fr.f >= 1 THEN
           abs(((d.doc_id*17 + fr.f*29 + px.p*13) % 256)
               - ((d.doc_id*17 + (fr.f-1)*29 + px.p*13) % 256)) END), 6)
         AS motion
FROM documents d, range(6) fr(f), range(32) px(p)
WHERE fr.f < 2 + d.doc_id % 5
GROUP BY d.doc_id
""",
    doc="REAL video decode end-to-end (r11) - the last media kind off the "
    "stub: every doc gets genuine YUV4MPEG2 bytes (2+d%5 frames of 8x4 "
    "C420; luma[f][p] = (d*17+f*29+p*13)%256, chroma from sibling "
    "formulas), and the pure-Python Y4M demuxer (y4m_info + decode_y4m, "
    "multimodal.py) walks header + FRAME markers through the same "
    "mapInPandas Decoder seam an ffmpeg kernel would use - no stub "
    "anywhere in this path.  FULLY value-oracled: container byte size "
    "(38-byte header + 54/frame), header-derived geometry and duration, "
    "mean luma, and MOTION (mean abs inter-frame luma delta - the "
    "temporal-activity score video curation filters on) are all integer "
    "arithmetic DuckDB reproduces exactly.  Frame count varies per doc "
    "so every column is value-bearing (VERDICT #7).",
)
def video_decode_features_documents(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_y4m_media,
        extract_video_features,
        real_video_decoder,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_y4m_media(docs)
    feats = extract_video_features(media, decoder=real_video_decoder)
    return feats.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("mean_luma", 6).alias("mean_luma"),
        F.round("motion", 6).alias("motion"),
    )


@register(
    "video_frame_sample_luma",
    oracle="""
SELECT d.doc_id, CAST(fr.f AS INT) AS frame_idx,
       round(fr.f / 5.0, 6) AS t_offset_s,
       round(avg((d.doc_id*17 + fr.f*29 + px.p*13) % 256), 6)
         AS mean_frame_luma
FROM documents d, range(6) fr(f), range(32) px(p)
WHERE fr.f < 2 + d.doc_id % 5
GROUP BY d.doc_id, fr.f
""",
    doc="Frame sampling over REAL video bytes (r11): sample_frames' 1->N "
    "explode (one row per sampled frame, the core shape of a video "
    "training-data pipeline) driven by real_video_frame_decoder - the "
    "FrameDecoder-contract seek into the Y4M stream (fixed-size frames "
    "make the seek an offset computation, like an ffmpeg keyframe seek). "
    "fps=5 over 0.4-1.2s clips samples EVERY frame, so each emitted "
    "frame's mean luma is value-oracled against the generator formula "
    "per (doc, frame) - the per-frame payload itself is what's checked, "
    "not just counts.",
)
def video_frame_sample_luma(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from crick_spark.pipeline.multimodal import (
        attach_y4m_media,
        real_video_frame_decoder,
        sample_frames,
    )
    docs = load_table(spark, sf_dir, "documents")
    media = attach_y4m_media(docs)
    frames = sample_frames(
        media, fps=5.0, max_frames=8, frame_decoder=real_video_frame_decoder
    )

    @pandas_udf(DoubleType())
    def frame_mean(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [float(np.frombuffer(b, dtype=np.uint8).mean()) for b in blobs]
        )

    return frames.select(
        "doc_id",
        "frame_idx",
        F.round("t_offset_s", 6).alias("t_offset_s"),
        F.round(frame_mean(F.col("frame")), 6).alias("mean_frame_luma"),
    )


@register(
    "video_frame_dedup_census",
    oracle="""
WITH lum AS (
  SELECT d.doc_id AS d, fr.f, px.p,
         (d.doc_id*17 + fr.f*29 + px.p*13) % 256 AS l
  FROM documents d, range(6) fr(f), range(32) px(p)
  WHERE fr.f < 2 + d.doc_id % 5
),
m AS (SELECT d, f, avg(l) AS ml FROM lum GROUP BY d, f),
h AS (
  SELECT lum.d, lum.f,
         CAST(sum(CASE WHEN lum.l > m.ml THEN (CAST(1 AS BIGINT) << lum.p)
                       ELSE 0 END) AS BIGINT) AS ahash
  FROM lum JOIN m ON lum.d = m.d AND lum.f = m.f
  GROUP BY lum.d, lum.f
)
SELECT ahash, count(*) AS n_frames,
       count(DISTINCT d) AS n_docs, min(d) AS min_doc
FROM h GROUP BY ahash HAVING count(*) > 1
""",
    doc="Frame-level perceptual dedup census (r11) - the video twin of "
    "document near-dup: every sampled frame of every clip gets a REAL "
    "average-hash (bit p = pixel p above the frame mean; frame means "
    "over 2^k pixels are float64-exact so the strict > is deterministic "
    "both sides), then a census of hash buckets seen more than once "
    "(frame count, distinct clips, smallest clip id).  Dedup at 100 TB "
    "is the hash-groupBy, never pairwise frame comparison - the census "
    "IS the shuffle-bounded shape, and Hamming-banding the signature "
    "(SimHash machinery, dedup.py) is the near-dup extension.  FULLY "
    "value-oracled: DuckDB recomputes every frame's hash bit-for-bit "
    "from the generator arithmetic and reproduces the census.",
)
def video_frame_dedup_census(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        ahash_frames,
        attach_y4m_media,
        real_video_frame_decoder,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_y4m_media(docs)
    frames = sample_frames(
        media, fps=5.0, max_frames=8, frame_decoder=real_video_frame_decoder
    )
    hashes = ahash_frames(frames)
    return (
        hashes.groupBy("ahash")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
        .where(F.col("n_frames") > 1)
    )


@register(
    "triangle_counts_copurchase",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT x.p AS a, y.p AS b
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
tri AS (SELECT e1.a, e1.b, e2.b AS c
        FROM e e1 JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
nodes AS (SELECT a AS node FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri),
cnt AS (SELECT node, count(*) AS n_triangles FROM nodes GROUP BY node)
SELECT * FROM (
  SELECT CAST(node AS BIGINT) AS part,
         CAST(n_triangles AS BIGINT) AS n_triangles
  FROM cnt ORDER BY n_triangles DESC, node ASC LIMIT 15)
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST((SELECT count(*) FROM tri) AS BIGINT)
""",
    doc="Distributed triangle counting on the co-purchase graph (r11) - "
    "the third graph-family operator beside PageRank and connected "
    "components, via degree-ordered orientation (Suri & Vassilvitskii "
    "2011, pipeline/graph.py:triangle_counts): every edge points from "
    "its lower-(degree,id) endpoint, so out-neighborhoods are O(sqrt m) "
    "and the wedge join is O(m^1.5) TOTAL even on power-law hubs - the "
    "'last reducer' fix, three edge-sized shuffles, nothing quadratic "
    "in degree.  Output: top-15 parts by triangle participation plus "
    "the global triangle count as the part=-1 row.  FULLY value-oracled "
    "against DuckDB's direct id-ordered 3-way self-join - a completely "
    "different (unscalable) plan computing the same set, so the "
    "orientation/wedge machinery itself is what the hash-match checks.  "
    "Measured shape (SCALE.md): ~40M oriented wedges / ~8.5s at sf0.1, "
    "5.1x over 100x data (degree ~constant across sf - the part "
    "dictionary scales with the corpus, so wedge work is ~linear with a "
    "fixed-cost floor).  The closing-edge probe is a shuffle join "
    "deliberately: broadcasting the edge set is only valid under the "
    "driver limit, and the 100 TB contract is the shuffle plan.",
)
def triangle_counts_copurchase(spark, sf_dir):
    from crick_spark.pipeline.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        # no .distinct() here (r14): every graph operator normalizes its
        # edge input (least/greatest + distinct) internally — the
        # query-level dedup re-shuffled the same pair relation twice
    )
    # eager localCheckpoint, not cache(): the per-node counts feed BOTH
    # output branches (top-15 and the global sum), and materializing here
    # truncates the wedge-join subtree so the union's plan reads it once
    # instead of duplicating the whole join tree per branch
    counts = triangle_counts(pairs).localCheckpoint(eager=True)
    top = (
        counts.orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(15)
        .select(
            F.col("node").cast("long").alias("part"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
        )
    )
    total = counts.agg(
        F.lit(-1).cast("long").alias("part"),
        (F.sum("n_triangles") / 3).cast("long").alias("n_triangles"),
    )
    return top.unionAll(total)


@register(
    "kcore_peel_copurchase",
    oracle="""
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
allv AS MATERIALIZED (SELECT a AS node FROM e0 UNION ALL SELECT b AS node FROM e0),
kk AS (SELECT (2 * (SELECT count(*) FROM e0))
              // (SELECT count(DISTINCT node) FROM allv) AS k),
d1 AS MATERIALIZED (SELECT node, count(*) AS deg FROM allv GROUP BY node),
n1 AS MATERIALIZED (SELECT node FROM d1, kk WHERE deg >= kk.k),
e1 AS MATERIALIZED (SELECT a, b FROM e0 WHERE a IN (SELECT node FROM n1)
                             AND b IN (SELECT node FROM n1)),
d2 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
       (SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) GROUP BY node),
n2 AS MATERIALIZED (SELECT node FROM d2, kk WHERE deg >= kk.k),
e2 AS MATERIALIZED (SELECT a, b FROM e1 WHERE a IN (SELECT node FROM n2)
                             AND b IN (SELECT node FROM n2)),
d3 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
       (SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) GROUP BY node),
n3 AS MATERIALIZED (SELECT node FROM d3, kk WHERE deg >= kk.k),
e3 AS MATERIALIZED (SELECT a, b FROM e2 WHERE a IN (SELECT node FROM n3)
                             AND b IN (SELECT node FROM n3)),
d4 AS MATERIALIZED (SELECT node, count(*) AS deg FROM
       (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3) GROUP BY node),
n4 AS MATERIALIZED (SELECT node FROM d4, kk WHERE deg >= kk.k),
e4 AS MATERIALIZED (SELECT a, b FROM e3 WHERE a IN (SELECT node FROM n4)
                             AND b IN (SELECT node FROM n4))
SELECT CAST(1 AS INT) AS round, (SELECT k FROM kk) AS k,
       (SELECT count(*) FROM n1) AS n_nodes,
       (SELECT count(*) FROM e1) AS n_edges
UNION ALL SELECT CAST(2 AS INT), (SELECT k FROM kk),
       (SELECT count(*) FROM n2), (SELECT count(*) FROM e2)
UNION ALL SELECT CAST(3 AS INT), (SELECT k FROM kk),
       (SELECT count(*) FROM n3), (SELECT count(*) FROM e3)
UNION ALL SELECT CAST(4 AS INT), (SELECT k FROM kk),
       (SELECT count(*) FROM n4), (SELECT count(*) FROM e4)
""",
    doc="Bounded-round k-core peeling on the co-purchase graph (r11) - "
    "the fourth graph-family operator (PageRank, connected components, "
    "triangles, now density cores), same fixed-round determinism "
    "contract as the registered PageRank: 4 peeling rounds at k = "
    "floor(mean degree) (integer arithmetic, exact in both engines, so "
    "one query text is meaningful at every sf), each round one degree "
    "aggregate + two edge-list semi-joins - O(|E|) shuffle per round, "
    "localCheckpoint-truncated lineage (pipeline/graph.py:kcore_peel). "
    "FULLY value-oracled: per-round surviving node and edge counts "
    "hash-match a 4-round unrolled chained-CTE recomputation in DuckDB "
    "- the peel CASCADES here (mean-degree threshold empties a "
    "near-random graph in 2-3 rounds), so every round's row is "
    "value-bearing and convergence is visible in the output itself.",
)
def kcore_peel_copurchase(spark, sf_dir):
    from crick_spark.pipeline.graph import kcore_peel

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        # no .distinct() here (r14): every graph operator normalizes its
        # edge input (least/greatest + distinct) internally — the
        # query-level dedup re-shuffled the same pair relation twice
    )
    return kcore_peel(pairs, k=None, rounds=4)


@register(
    "coreness_copurchase",
    oracle="""
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
und AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0
       UNION ALL SELECT b AS node, a AS nbr FROM e0),
c0 AS MATERIALIZED (SELECT node, count(*) AS c FROM und GROUP BY node),
r1 AS MATERIALIZED (
  SELECT node, max(least(nc, rn)) AS c FROM (
    SELECT u.node, l.c AS nc,
           row_number() OVER (PARTITION BY u.node ORDER BY l.c DESC) AS rn
    FROM und u JOIN c0 l ON l.node = u.nbr) t
  GROUP BY node),
r2 AS MATERIALIZED (
  SELECT node, max(least(nc, rn)) AS c FROM (
    SELECT u.node, l.c AS nc,
           row_number() OVER (PARTITION BY u.node ORDER BY l.c DESC) AS rn
    FROM und u JOIN r1 l ON l.node = u.nbr) t
  GROUP BY node),
r3 AS MATERIALIZED (
  SELECT node, max(least(nc, rn)) AS c FROM (
    SELECT u.node, l.c AS nc,
           row_number() OVER (PARTITION BY u.node ORDER BY l.c DESC) AS rn
    FROM und u JOIN r2 l ON l.node = u.nbr) t
  GROUP BY node)
SELECT CAST(c AS BIGINT) AS coreness,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node
FROM r3 GROUP BY c
""",
    doc="Per-node core-number decomposition on the co-purchase graph "
    "(r12, VERDICT r11 #2) - kcore_peel returns only per-round survivor "
    "counts; THIS is the per-node column a curation user joins against "
    "for graph-quality filtering (the k-core analog of triangle_counts' "
    "per-node output).  Bounded-round h-index iteration (Montresor et "
    "al. 2013, pipeline/graph.py:coreness): c0 = degree, each round "
    "c(v) <- H-index of neighbors' values via one equi-join + one "
    "ranked window per node - H = max over position rn of min(value, "
    "rn) is tie-order-invariant, so the integer result is exact in any "
    "engine.  O(|E|) shuffle rows per round, lineage truncated per "
    "round.  Output: the coreness histogram (value, node count, "
    "smallest node) after 3 rounds, FULLY value-oracled against a "
    "3-round unrolled chained-CTE + window recomputation in DuckDB.",
)
def coreness_copurchase(spark, sf_dir):
    from crick_spark.pipeline.graph import coreness

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        # no .distinct() here (r14): every graph operator normalizes its
        # edge input (least/greatest + distinct) internally — the
        # query-level dedup re-shuffled the same pair relation twice
    )
    c = coreness(pairs, rounds=3)
    return c.groupBy(F.col("coreness").cast("long").alias("coreness")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.min("node").cast("long").alias("min_node"),
    )


@register(
    "approx_triangle_count_copurchase",
    oracle="""
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
es AS MATERIALIZED (
  SELECT a, b FROM e
  WHERE (('0x' || substr(md5(CAST(a AS VARCHAR) || '#' || CAST(b AS VARCHAR)),
          1, 6))::BIGINT) / 16777216.0 < 0.25),
tris AS (SELECT count(*) AS t FROM es e1
         JOIN es e2 ON e1.b = e2.a
         JOIN es e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM es) AS BIGINT) AS n_sampled,
       CAST((SELECT t FROM tris) AS BIGINT) AS t_sampled,
       CAST((SELECT t FROM tris) * 64 AS BIGINT) AS t_est,
       round(sqrt(63.0 / greatest(CAST((SELECT t FROM tris) * 64 AS DOUBLE),
                                  1.0)), 6) AS rel_err_bound
""",
    doc="DOULION approximate triangle counting - the PRODUCTION shape "
    "(r12, VERDICT r11 #3): keep each co-purchase edge with p=0.25 via "
    "the content-stable md5 coin (sampling.md5_uniform on the "
    "normalized a#b key - same edge, same coin, any engine), count "
    "triangles exactly on the sparsified graph (the same degree-ordered "
    "wedge join), scale by 1/p^3 = 64 (Tsourakakis et al., KDD 2009, "
    "pipeline/graph.py:approx_triangle_total).  Wedge work shrinks "
    "~p^1.5 (~1/8 here) - the knob that keeps the O(m^1.5) exact form "
    "affordable at 100x the edges; the estimator is unbiased and "
    "mergeable (count on each sampled shard, sum, scale once), and "
    "rel_err_bound reports "
    "the independence-approximation relative standard error "
    "sqrt((1/p^3-1)/T_est).  The tolerance gate vs the exact count "
    "runs as the twin approx_triangle_tolerance_copurchase in the "
    "correctness harness (the r6 bulk-twin pattern - bench times the "
    "production shape, not the double-priced audit).  FULLY value-"
    "oracled: DuckDB reproduces the sampled edge set coin-for-coin, "
    "its triangle count via a direct 3-way self-join, the scaled "
    "estimate, and the bound.",
)
def approx_triangle_count_copurchase(spark, sf_dir):
    from crick_spark.pipeline.graph import approx_triangle_total

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        # no .distinct() here (r14): every graph operator normalizes its
        # edge input (least/greatest + distinct) internally — the
        # query-level dedup re-shuffled the same pair relation twice
    )
    return approx_triangle_total(pairs, p=0.25)


@register(
    "approx_triangle_tolerance_copurchase",
    oracle="""
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p),
es AS MATERIALIZED (
  SELECT a, b FROM e
  WHERE (('0x' || substr(md5(CAST(a AS VARCHAR) || '#' || CAST(b AS VARCHAR)),
          1, 6))::BIGINT) / 16777216.0 < 0.25),
tri AS (SELECT count(*) AS t FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tris AS (SELECT count(*) AS t FROM es e1
         JOIN es e2 ON e1.b = e2.a
         JOIN es e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST((SELECT t FROM tri) AS BIGINT) AS t_exact,
       CAST((SELECT t FROM tris) * 64 AS BIGINT) AS t_est,
       CAST(abs((SELECT t FROM tris) * 64 - (SELECT t FROM tri)) AS DOUBLE)
         <= 0.15 * (SELECT t FROM tri) AS within_tol
""",
    doc="The DOULION accuracy gate (r12, VERDICT r11 #3; r14 trim per "
    "VERDICT r13 #7): the sampled estimate and the exact count now "
    "come from ONE degree-ordered wedge traversal - each edge carries "
    "its md5-coin flag and a triangle counts as sampled iff all three "
    "edges are (pipeline/graph.py:triangle_total_audit), so the audit "
    "no longer re-traverses the sparsified graph beside the exact one "
    "(the widest plan in the r13 tree, 86 exchanges).  within_tol "
    "asserts |8*T_s - T| <= 0.15*T (the boolean-tolerance accuracy-gate "
    "pattern).  Deliberately NOT in the bench extras set; the "
    "production shape is approx_triangle_count_copurchase.  FULLY "
    "value-oracled: both counts, the estimate, and the boolean "
    "reproduced in DuckDB (oracle unchanged - the sampled 3-way join "
    "over the flagged subgraph is the same count).",
)
def approx_triangle_tolerance_copurchase(spark, sf_dir):
    from crick_spark.pipeline.graph import triangle_total_audit

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        # no .distinct() here (r14): every graph operator normalizes its
        # edge input (least/greatest + distinct) internally — the
        # query-level dedup re-shuffled the same pair relation twice
    )
    audit = triangle_total_audit(pairs, p=0.25)
    return audit.select(
        "t_exact",
        "t_est",
        (
            F.abs(F.col("t_est") - F.col("t_exact")).cast("double")
            <= F.lit(0.15) * F.col("t_exact")
        ).alias("within_tol"),
    )


@register(
    "triangle_capped_copurchase",
    oracle="""
WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS MATERIALIZED (
  SELECT a, b,
         (('0x' || substr(md5(CAST(a AS VARCHAR) || '#' || CAST(b AS VARCHAR)),
           1, 6))::BIGINT) / 16777216.0 AS coin
  FROM (SELECT DISTINCT x.p AS a, y.p AS b
        FROM op x JOIN op y ON x.o = y.o AND x.p < y.p)),
inc AS (SELECT a AS n, a, b, coin FROM e
        UNION ALL SELECT b AS n, a, b, coin FROM e),
cp AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a, b,
           row_number() OVER (PARTITION BY n ORDER BY coin, a, b) AS r
    FROM inc)
  GROUP BY a, b HAVING max(r) <= 32),
dg AS (SELECT max(deg) AS md FROM (
  SELECT n, count(*) AS deg FROM (
    SELECT a AS n FROM cp UNION ALL SELECT b FROM cp) GROUP BY n)),
tris AS (SELECT count(*) AS t FROM cp e1
         JOIN cp e2 ON e1.b = e2.a
         JOIN cp e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT CAST(32 AS INTEGER) AS d_max,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM cp) AS BIGINT) AS n_capped_edges,
       CAST(coalesce((SELECT md FROM dg), 0) AS BIGINT) AS max_capped_degree,
       CAST((SELECT t FROM tris) AS BIGINT) AS t_capped
""",
    doc="Degree-capped EXACT triangle counting (r13, VERDICT r12 #6) - "
    "the estimator-free scale lever beside DOULION: every node keeps "
    "at most d_max=32 incident co-purchase edges, chosen by the "
    "content-stable md5 coin on the normalized a#b key (ties by "
    "neighbor id; an edge survives only if it ranks <= d_max at BOTH "
    "endpoints), and the triangle count on the capped graph is exact - "
    "wedge work bounded by m*d_max instead of the uncapped hub "
    "quadratic (the SCALE 8.7x row's fix; pipeline/graph.py:"
    "triangle_counts_capped).  FULLY value-oracled: DuckDB reproduces "
    "the coin, both row_number ranks, the surviving edge set, its max "
    "degree, and the exact capped count via a direct 3-way self-join.",
)
def triangle_capped_copurchase(spark, sf_dir):
    from crick_spark.pipeline.graph import triangle_counts_capped

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        op.alias("x")
        .join(op.alias("y"), "o")
        .where(F.col("x.p") < F.col("y.p"))
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        # no .distinct() here (r14): every graph operator normalizes its
        # edge input (least/greatest + distinct) internally — the
        # query-level dedup re-shuffled the same pair relation twice
    )
    return triangle_counts_capped(pairs, d_max=32)


@register(
    "png_decode_features_documents",
    oracle="""
SELECT d.doc_id,
       round(avg((d.doc_id * 7 + t.i * 13) % 256), 6) AS mean_intensity,
       round(stddev_pop((d.doc_id * 7 + t.i * 13) % 256), 6) AS std_intensity
FROM documents d, range(96) t(i)
GROUP BY d.doc_id
""",
    doc="REAL compressed-image decode end-to-end (r12, VERDICT r11 #4): "
    "every doc gets a genuine PNG - stdlib-zlib-compressed IDAT, 8x4 "
    "RGB, pixel i = (doc_id*7+i*13)%256 (the PPM formula), with row r "
    "encoded under scanline filter (doc_id+r)%5 so the corpus exercises "
    "ALL FIVE filter reconstructions (None/Sub/Up/Average/Paeth, PNG "
    "spec 9) - and the pure-Python chunk-walker + inflate + unfilter "
    "(pipeline/multimodal.py:decode_png) parses them through the same "
    "mapInPandas Decoder seam as Netpbm/BMP/WAV/Y4M.  n_bytes is "
    "zlib-stream-dependent and deliberately NOT selected; mean and "
    "population-std intensity are the decode proof - any filter "
    "reconstruction bug shifts them and the hash-match fails.  FULLY "
    "value-oracled: DuckDB reproduces both from the generator "
    "arithmetic (96 small ints - float64-exact at the 1e-6 grid).",
)
def png_decode_features_documents(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_png_media,
        real_image_decoder,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_png_media(docs)
    feats = extract_image_features(media, decoder=real_image_decoder)
    return feats.select(
        "doc_id",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.round("std_intensity", 6).alias("std_intensity"),
    )


@register(
    "audio_fingerprint_dedup_census",
    oracle="""
WITH s AS (
  SELECT d.doc_id AS d, t.i,
         ((d.doc_id % 16) * 37 + t.i * (97 + 13 * (d.doc_id % 16)))
           % 4001 - 2000 AS base,
         1 + (d.doc_id // 16) % 3 AS gain
  FROM documents d, range(160) t(i)),
e AS (
  SELECT d, t.i // 10 AS w,
         sum(CAST(base * gain AS BIGINT) * CAST(base * gain AS BIGINT)) AS en
  FROM s t GROUP BY d, t.i // 10),
b AS (
  SELECT d, w, en, lag(en) OVER (PARTITION BY d ORDER BY w) AS pen FROM e),
fps AS (
  SELECT d, CAST(sum(CASE WHEN w >= 1 AND en > pen
                          THEN (CAST(1 AS BIGINT) << (w - 1))
                          ELSE 0 END) AS BIGINT) AS fp
  FROM b GROUP BY d)
SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT (d % 16) * 10 + 1 + (d // 16) % 3) AS BIGINT)
         AS n_byte_variants,
       CAST(min(d) AS BIGINT) AS min_doc
FROM fps GROUP BY fp HAVING count(*) > 1
""",
    doc="Audio perceptual dedup census (r12, VERDICT r11 #5) - completes "
    "dedup across all three modalities (text spans/minhash, video frame "
    "aHash, now audio): every clip's decoded stream is cut into 16 "
    "windows and fingerprinted by its integer energy CONTOUR (bit j-1 = "
    "E_j > E_j-1, chromaprint-shaped; pipeline/multimodal.py:"
    "audio_fingerprint).  The fixture attaches byte-DIFFERENT gain "
    "variants (1x/2x/3x) of 16 base streams - energies scale by gain^2 "
    "so the strict integer comparison is gain-invariant: the census "
    "must collapse each group across its gain variants (n_byte_variants "
    "counts the distinct md5(media) byte forms merged, computed from "
    "the REAL bytes Spark-side) while byte-exact dedup cannot.  Dedup "
    "at 100 TB is this hash-groupBy, never pairwise clip comparison.  "
    "FULLY value-oracled: DuckDB recomputes every window energy, "
    "fingerprint bit, and census row from the generator arithmetic "
    "(int64-exact both sides).",
)
def audio_fingerprint_dedup_census(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_wav_dup_media,
        audio_fingerprint,
        real_audio_decoder,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = attach_wav_dup_media(docs)
    fps = audio_fingerprint(media, n_windows=16, decoder=real_audio_decoder)
    byte_hash = media.select(
        "doc_id", F.md5(F.col("media").cast("binary")).alias("bh")
    )
    return (
        fps.join(byte_hash, "doc_id")
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("bh").alias("n_byte_variants"),
            F.min("doc_id").alias("min_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


def _ppr_oracle(iters: int = 3) -> str:
    head = """
WITH pairs AS (
  SELECT 'c:' || o_custkey AS c, 's:' || l_suppkey AS s,
         CAST(count(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2
), edges AS (
  SELECT c AS src, s AS dst, w FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst, w FROM pairs
), outw AS (
  SELECT src, sum(w) AS ow FROM edges GROUP BY 1
), norm AS (
  SELECT e.src, e.dst, e.w / o.ow AS p FROM edges e JOIN outw o USING (src)
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
), seeds AS (
  SELECT DISTINCT 'c:' || c_custkey AS node
  FROM customer WHERE c_mktsegment = 'BUILDING'
), sw AS (
  SELECT n.node,
         CASE WHEN sd.node IS NOT NULL THEN 1.0 ELSE 0.0 END AS rw
  FROM nodes n LEFT JOIN seeds sd USING (node)
), sv AS (
  SELECT node, rw / (SELECT sum(rw) FROM sw) AS s FROM sw
), r0 AS (
  SELECT node, s AS rank FROM sv
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""", r{i} AS (
  SELECT sv.node,
         0.15 * sv.s + 0.85 * coalesce(m.mass, 0.0) AS rank
  FROM sv LEFT JOIN (
    SELECT norm.dst AS node, sum(r{i-1}.rank * norm.p) AS mass
    FROM r{i-1} JOIN norm ON r{i-1}.node = norm.src GROUP BY 1
  ) m USING (node)
)""")
    return (
        head
        + "".join(steps)
        + f"\nSELECT node, round(rank, 9) AS rank FROM r{iters}"
    )


@register(
    "personalized_pagerank_building",
    oracle=_ppr_oracle(3),
    doc="Personalized PageRank (r12) - random walk with restart to the "
    "BUILDING-segment customers on the bidirectionalized purchase "
    "graph (Haveliwala, Topic-sensitive PageRank, WWW 2002; "
    "pipeline/graph.py:personalized_pagerank): rank mass teleports to "
    "the seed distribution (uniform over seeds present in the graph, "
    "normalized in-plan) instead of uniformly, so the stationary mass "
    "measures seed-proximity - the quality-propagation primitive a "
    "curation pipeline runs from trusted seed documents/domains.  Same "
    "per-iteration shape as the registered PageRank (one rank-vector "
    "join + one groupBy over edge rows; the s column rides the node "
    "relation); dangling='assume_none' is exact here because the edge "
    "list is bidirectionalized by construction.  FULL-VALUE oracle: "
    "DuckDB unrolls the identical 3 iterations from the identical seed "
    "normalization as chained CTEs - every node's rank hash-matches at "
    "1e-9, including the zero-teleport non-seed nodes.",
)
def personalized_pagerank_building(spark, sf_dir):
    from crick_spark.pipeline.graph import personalized_pagerank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count("*").cast("double").alias("w"))
    )
    cnode = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    snode = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    edges = pairs.select(
        cnode.alias("src"), snode.alias("dst"), "w"
    ).unionByName(pairs.select(snode.alias("src"), cnode.alias("dst"), "w"))
    seeds = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
        .distinct()
    )
    ranks = personalized_pagerank(
        edges,
        seeds,
        iterations=3,
        damping=0.85,
        weight_col="w",
        dangling="assume_none",
        eager=True,
    )
    return ranks.select("node", F.round("rank", 9).alias("rank"))


@register(
    "prototype_pruning_embeddings",
    oracle="""
WITH lk(r, c) AS (VALUES (0,0),(1,0),(2,0),(3,1),(4,1),(5,1),(6,2),(7,2),
                         (8,3),(9,3),(10,4),(11,4),(12,5),(13,6),(14,7),(15,7)),
pts AS (SELECT t.i, lk.c AS true_c
        FROM range(1200) t(i) JOIN lk ON (t.i % 16) = lk.r),
vec AS (SELECT p.i, d.j,
               ((p.true_c*37 + d.j*101) % 211 - 105)/105.0
               + 0.6 * (((p.i*131 + d.j*61) % 997) - 498)/498.0 AS v
        FROM pts p, range(16) d(j)),
cent AS (SELECT cc.c2, d.j, ((cc.c2*37 + d.j*101) % 211 - 105)/105.0 AS w
         FROM range(8) cc(c2), range(16) d(j)),
cos AS (SELECT v.i, ct.c2,
               sum(v.v*ct.w) / (sqrt(sum(v.v*v.v)) * sqrt(sum(ct.w*ct.w)))
                 AS cosv
        FROM vec v JOIN cent ct USING (j)
        GROUP BY v.i, ct.c2),
top AS (SELECT i, c2 AS pc, cosv AS pcos FROM (
          SELECT i, c2, cosv,
                 row_number() OVER (PARTITION BY i
                                    ORDER BY cosv DESC, c2 ASC) AS rn
          FROM cos) t WHERE rn = 1),
ranked AS (SELECT i, pc, pcos,
                  row_number() OVER (PARTITION BY pc
                                     ORDER BY pcos ASC, i ASC) AS krn,
                  count(*) OVER (PARTITION BY pc) AS n_c
           FROM top),
kept AS (SELECT * FROM ranked WHERE krn <= ceil(round(0.5 * n_c, 9)))
SELECT CAST(pc AS INT) AS proto_cluster,
       CAST(count(*) AS BIGINT) AS n_kept,
       round(avg(pcos), 6) AS mean_kept_cos,
       round(max(pcos), 6) AS max_kept_cos,
       CAST(min(i) AS BIGINT) AS min_kept_id
FROM kept GROUP BY pc
""",
    doc="Prototypicality data pruning (r12; Sorscher et al., Beyond "
    "neural scaling laws, NeurIPS 2022 - the embedding-space pruning "
    "rule that beats random subsetting): score every row by cosine to "
    "its nearest centroid (pipeline/similarity.py:prototype_scores, "
    "the structure-stats kernel kept per-row), keep the HARDEST 50% of "
    "each cluster (the paper's large-dataset regime - redundant "
    "prototype-adjacent rows go first), per-cluster so tight clusters "
    "are not emptied globally.  Selection is (score, id)-ranked with "
    "ceil(frac*n) kept, so the exact selected set is deterministic.  "
    "FULLY value-oracled on the integer-lattice clustered fixture: "
    "DuckDB rebuilds every vector and centroid from range() "
    "arithmetic, recomputes the full cosine profile, the stable "
    "argmax assignment, the per-cluster (score, id) ranking, and the "
    "kept-set census (counts, mean/max kept score, smallest kept id).  "
    "Plan: one Arrow matmul + one cluster-partitioned window - two "
    "shuffles at any corpus size, centroids a broadcast literal.",
)
def prototype_pruning_embeddings(spark, sf_dir):
    from crick_spark.pipeline.similarity import prune_by_prototypicality
    from crick_spark.sources.synthetic import (
        lattice_centers,
        lattice_clustered_embeddings,
    )

    emb = lattice_clustered_embeddings(spark, n=1200, dim=16, noise_scale=0.6)
    kept = prune_by_prototypicality(
        emb, lattice_centers(8, 16), keep_fraction=0.5, keep="hard"
    )
    return kept.groupBy("proto_cluster").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.round(F.avg("proto_cos"), 6).alias("mean_kept_cos"),
        F.round(F.max("proto_cos"), 6).alias("max_kept_cos"),
        F.min("vec_id").cast("long").alias("min_kept_id"),
    )


@register(
    "dedup_clusters_contract_documents",
    oracle=_CLUSTERS_ORACLE,
    doc="Near-duplicate clusters via STAR CONTRACTION (r12; Kiveris et "
    "al., SoCC 2014, pipeline/graph.py:connected_components_contract) - "
    "the long-diameter-safe twin of dedup_clusters_documents' hash-min "
    "propagation: alternating large-star/small-star rounds halve "
    "component height, so convergence is O(log n) rounds on ANY "
    "topology where hash-min needs O(diameter) supersteps (chained "
    "near-dup pairs - transcript/frame corpora - form exactly such "
    "paths).  Same two-shuffle round shape, exact fixpoint test "
    "(count + exceptAll, no probabilistic signature).  Identical "
    "semantics proven twice: the SAME recursive-CTE reachability "
    "oracle as the hash-min form hash-matches the cluster census, and "
    "pytest pins node-level equality against hash-min AND a Python "
    "union-find, including the 300-link path hash-min cannot finish.",
)
def dedup_clusters_contract_documents(spark, sf_dir):
    from crick_spark.pipeline.dedup import jaccard_ngram_pairs
    from crick_spark.pipeline.graph import connected_components_contract

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_ngram_pairs(
        docs, "doc_id", "text", block_col="lang", threshold=0.5, n=3
    )
    cc = connected_components_contract(pairs, src="id_a", dst="id_b")
    return cc.groupBy("component").agg(F.count("*").alias("n_docs"))


@register(
    "multimodal_curation_v1",
    oracle="""
WITH motion AS (
  SELECT d.doc_id,
         avg(CASE WHEN fr.f >= 1 THEN
             abs(((d.doc_id*17 + fr.f*29 + px.p*13) % 256)
                 - ((d.doc_id*17 + (fr.f-1)*29 + px.p*13) % 256)) END) AS m
  FROM documents d, range(6) fr(f), range(32) px(p)
  WHERE fr.f < 2 + d.doc_id % 5 GROUP BY d.doc_id),
rms AS (
  SELECT d.doc_id,
         sqrt(avg(pow((d.doc_id*31 + t.i*131) % 4001 - 2000, 2))) AS r
  FROM documents d, range(250) t(i) WHERE t.i < 150 + d.doc_id % 100
  GROUP BY d.doc_id),
joined AS (
  SELECT d.doc_id, d.lang,
         (d.n_chars >= 200 AND m.m >= 50.0 AND r.r >= 1150.0) AS kept,
         m.m, r.r
  FROM documents d JOIN motion m USING (doc_id) JOIN rms r USING (doc_id))
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(avg(CASE WHEN kept THEN m END), 6) AS mean_kept_motion,
       round(avg(CASE WHEN kept THEN r END), 6) AS mean_kept_rms,
       CAST(min(CASE WHEN kept THEN doc_id END) AS BIGINT) AS min_kept_doc
FROM joined GROUP BY lang
""",
    doc="Composed MULTIMODAL curation funnel (r12): every document "
    "carries text + real video bytes + real audio bytes, and the keep "
    "decision is the conjunction of all three modality signals - text "
    "length >= 200 chars, video MOTION >= 50 (mean abs inter-frame "
    "luma delta from the Y4M demux, the temporal-activity filter), "
    "audio RMS >= 1150 (from the WAV decode) - the join-of-decoders "
    "shape a video-text training pipeline runs (filter static slides "
    "and silent clips before pairing).  Three Arrow decode passes, one "
    "three-way equi-join on doc_id, one per-lang rollup; thresholds "
    "split the corpus (nothing all-pass/all-fail), filters compare "
    "UNROUNDED float64 values whose inputs are exact integer sums, so "
    "both engines agree bit-for-bit.  FULLY value-oracled: DuckDB "
    "recomputes motion and RMS per doc from the generator arithmetic "
    "and reproduces per-lang kept counts, kept-mean signals, and the "
    "smallest kept doc.",
)
def multimodal_curation_v1(spark, sf_dir):
    from crick_spark.pipeline.multimodal import (
        attach_wav_media,
        attach_y4m_media,
        extract_audio_features,
        extract_video_features,
        real_audio_decoder,
        real_video_decoder,
    )

    docs = load_table(spark, sf_dir, "documents")
    vid = extract_video_features(
        attach_y4m_media(docs), decoder=real_video_decoder
    ).select("doc_id", "motion")
    aud = extract_audio_features(
        attach_wav_media(docs), decoder=real_audio_decoder
    ).select("doc_id", "rms_amplitude")
    joined = (
        docs.select("doc_id", "lang", "n_chars")
        .join(vid, "doc_id")
        .join(aud, "doc_id")
        .withColumn(
            "kept",
            (F.col("n_chars") >= 200)
            & (F.col("motion") >= 50.0)
            & (F.col("rms_amplitude") >= 1150.0),
        )
    )
    return joined.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.round(F.avg(F.when(F.col("kept"), F.col("motion"))), 6).alias(
            "mean_kept_motion"
        ),
        F.round(
            F.avg(F.when(F.col("kept"), F.col("rms_amplitude"))), 6
        ).alias("mean_kept_rms"),
        F.min(F.when(F.col("kept"), F.col("doc_id")))
        .cast("long")
        .alias("min_kept_doc"),
    )


@register(
    "ivf_layout_delete_rtbf",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_before,
       CAST(sum(CASE WHEN vec_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deleted,
       CAST(count(*) - sum(CASE WHEN vec_id % 7 = 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_after,
       TRUE AS deleted_absent,
       TRUE AS survivors_exact,
       TRUE AS replay_noop
FROM embeddings
""",
    doc="Right-to-be-forgotten over the IVF index layout (r13, "
    "pipeline/similarity.py:ivf_layout_delete): erasure compliance as "
    "per-partition surgery — the delete set's touched clusters are "
    "found by one column-pruned (id, cluster) probe, ONLY those "
    "partitions are rewritten via anti-join + dynamic overwrite "
    "(fully-emptied cluster dirs removed through the Hadoop FS API), "
    "untouched files never opened (pytest pins them byte-identical, "
    "plus reader equivalence vs an in-memory search of the surviving "
    "corpus).  Hash-matched: before/deleted/after counts reproduce in "
    "DuckDB from the vec_id%7 predicate, deleted ids are absent, the "
    "surviving id set equals before-minus-deleted exactly (anti-join "
    "emptiness both directions), and a replayed delete is a no-op.  "
    "At 100 TB the cost scales with the touched partitions, never the "
    "resident corpus.",
)
def ivf_layout_delete_rtbf(spark, sf_dir):
    import shutil

    from crick_spark.pipeline.similarity import (
        ivf_layout_delete,
        train_ivf_centroids,
        write_ivf_layout,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    work = run_tmpdir("crick_rtbf_layout_")
    path = f"{work}/layout"
    cents = train_ivf_centroids(emb, k=8)
    write_ivf_layout(emb, cents, path)
    dele = emb.where(F.col("vec_id") % 7 == 3).select("vec_id")
    stats = ivf_layout_delete(spark, dele, path)
    replay = ivf_layout_delete(spark, dele, path)

    after = spark.read.option("basePath", path).parquet(path).select("vec_id")
    n_after = after.count()
    n_leaked = after.join(dele, "vec_id").count()
    # survivors_exact: after == before \ delete, both directions
    expected = emb.select("vec_id").join(dele, "vec_id", "left_anti")
    extra = after.join(expected, "vec_id", "left_anti").count()
    missing = expected.join(after, "vec_id", "left_anti").count()
    out = spark.createDataFrame(
        [
            (
                emb.count(),
                stats["n_deleted"],
                n_after,
                n_leaked == 0,
                extra == 0 and missing == 0,
                replay
                == {
                    "n_deleted": 0,
                    "clusters_touched": [],
                    "n_rewritten_rows": 0,
                },
            )
        ],
        "n_before long, n_deleted long, n_after long, "
        "deleted_absent boolean, survivors_exact boolean, "
        "replay_noop boolean",
    ).localCheckpoint(eager=True)
    shutil.rmtree(work, ignore_errors=True)
    return out


@register(
    "bootstrap_ci_events_value",
    oracle="""
WITH rows_ AS (
  SELECT event_id AS id, value AS x FROM events WHERE value IS NOT NULL
),
rep AS (
  SELECT r.r, id, x,
         (('0x' || substr(md5(CAST(id AS VARCHAR) || '#' ||
                              CAST(r.r AS VARCHAR)), 1, 6))::BIGINT)
           / 16777216.0 AS u
  FROM rows_, range(40) r(r)
),
wtd AS (
  SELECT r, x,
         CASE WHEN u < 0.36787944117144233 THEN 0
              WHEN u < 0.7357588823428847 THEN 1
              WHEN u < 0.9196986029286058 THEN 2
              WHEN u < 0.9810118431238463 THEN 3
              WHEN u < 0.9963401531726563 THEN 4
              WHEN u < 0.9994058151824183 THEN 5
              ELSE 6 END AS w
  FROM rep
),
reps AS (
  SELECT r, round(sum(w * x) / sum(w) + 1e-9, 6) AS m FROM wtd
  GROUP BY r HAVING sum(w) > 0
),
ranked AS (
  SELECT m, row_number() OVER (ORDER BY m, r) AS rk FROM reps
),
picks AS (
  SELECT min(m) AS boot_lo, max(m) AS boot_hi FROM ranked
  WHERE rk IN (1, 39)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM rows_) AS n_rows,
       (SELECT round(avg(x) + 1e-9, 6) FROM rows_) AS mean,
       boot_lo, boot_hi, CAST(40 AS INTEGER) AS n_reps
FROM picks
""",
    doc="Deterministic Poisson-bootstrap CI for the mean event value "
    "(r13; Chamandy et al. 2012, the single-pass bootstrap for data "
    "too large to resample): every row joins each of 40 replicates "
    "with a Poisson(1) weight drawn from the content-stable md5 coin "
    "on (event_id, rep) via the truncated inverse-CDF literal "
    "thresholds (pipeline/sampling.py:POISSON1_CDF), replicate means "
    "round to 1e-6 (epsilon-bumped +1e-9 on BOTH sides so a mean on a "
    "rounding half-boundary cannot straddle engines — ADVICE r13; "
    "all-zero-weight replicates dropped identically on both sides "
    "before ranking), and the 95% interval is integer ORDER-STATISTIC "
    "selection (ranks 1 and 39 of 40, ties by replicate id) - no "
    "interpolation, so the exact same replicates are chosen in any "
    "engine.  FULLY value-oracled: DuckDB reproduces every coin, "
    "weight, replicate mean, and the selected pair.  One explode + "
    "one grouped aggregate - the plan shape that prices uncertainty "
    "at 100 TB in a single pass.",
)
def bootstrap_ci_events_value(spark, sf_dir):
    from crick_spark.pipeline.sampling import poisson_bootstrap_ci

    ev = load_table(spark, sf_dir, "events")
    return poisson_bootstrap_ci(
        ev, value_col="value", id_col="event_id", n_reps=40, level=0.95
    )
