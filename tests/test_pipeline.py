"""Pipeline operator tests: MinHash/SimHash recall vs exact pairwise
Jaccard, ANN recall vs brute force, language-ID on constructed fixtures,
token/quality counts vs Python oracles, multimodal plumbing."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from crick_spark.pipeline import (
    attach_fake_media,
    cosine_topk,
    exact_dedup,
    extract_image_features,
    lang_id_expr,
    lsh_ann_topk,
    near_dup_pairs,
    simhash_near_dup_pairs,
)
from crick_spark.pipeline.text import doc_fingerprint_expr
from crick_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


def _shingle_set(text: str, n: int = 3) -> set[str]:
    w = text.strip().split()
    if len(w) < n:
        return {" ".join(w)}
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _exact_jaccard_pairs(pdf, threshold: float) -> set[tuple[int, int]]:
    sets = {r.doc_id: _shingle_set(r.text) for r in pdf.itertuples()}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / len(sets[a] | sets[b]) >= threshold:
            out.add((a, b))
    return out


def test_minhash_near_dup_recall_precision(spark, docs):
    pdf = docs.select("doc_id", "text").toPandas()
    truth = _exact_jaccard_pairs(pdf, 0.7)
    found = {
        (r.id_a, r.id_b) for r in near_dup_pairs(docs, "doc_id", "text", 0.7).collect()
    }
    assert truth, "fixture should contain near-duplicates"
    # exact-Jaccard verification step makes precision 1.0 by construction
    assert found <= truth or all(
        (a, b) in truth for a, b in found
    ), f"false positives: {found - truth}"
    recall = len(found & truth) / len(truth)
    assert recall >= 0.8, f"recall {recall}: missed {truth - found}"


def test_simhash_near_dups_find_exact_dups(spark, docs):
    """Identical word multisets → identical simhash (hamming 0)."""
    pdf = docs.select("doc_id", "text").toPandas()
    exact_dup_pairs = set()
    by_text = {}
    for r in pdf.itertuples():
        by_text.setdefault(r.text, []).append(r.doc_id)
    for ids in by_text.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            exact_dup_pairs.add((a, b))
    found = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(docs, "doc_id", "text", 3).collect()
    }
    for pair in exact_dup_pairs:
        assert pair in found and found[pair] == 0, pair


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs, "doc_id", ["text"]).toPandas()
    assert out["dup_cnt"].sum() == docs.count()
    assert (out["keep_id"] >= 0).all()
    n_unique_texts = docs.select("text").distinct().count()
    assert len(out) == n_unique_texts


def test_lang_id_on_clear_fixtures(spark):
    fixtures = [
        ("the cat and the dog sat in a house that it was for", "en"),
        ("der hund und die katze ist nicht mit einem ball zu den", "de"),
        ("le chat et la maison est dans les arbres que une", "fr"),
        ("el perro y la casa es que los gatos en un jardín", "es"),
        ("我 是 一个 人 的 和 不 在 这 有", "zh"),
    ]
    df = spark.createDataFrame(fixtures, ["text", "expected"])
    out = df.select("expected", lang_id_expr(F.col("text")).alias("pred")).collect()
    for r in out:
        assert r.pred == r.expected, r
    # no markers → undetermined
    und = spark.createDataFrame([("qwtz brfx",)], ["text"])
    assert und.select(lang_id_expr(F.col("text"))).collect()[0][0] == "und"


def test_token_counts_match_python(spark, docs):
    from crick_spark.pipeline.text import token_count_exprs

    out = docs.select("doc_id", "text", *token_count_exprs(F.col("text"))).collect()
    for r in out[:50]:
        assert r.ws_tokens == len(r.text.strip().split()), r.doc_id
        assert r.non_ws_chars == len(r.text.replace(" ", "")), r.doc_id


def test_cosine_topk_matches_numpy(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = mat[ids == 0][0]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(cos, 12)))
    expected = list(ids[order][:10])
    got = [r.vec_id for r in cosine_topk(emb, list(q), 10).collect()]
    assert got == expected


def test_lsh_ann_recall(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
    brute = {r.vec_id for r in cosine_topk(emb, q, 10).collect()}
    ann = {r.vec_id for r in lsh_ann_topk(emb, q, 10, nbits=6, num_tables=8).collect()}
    recall = len(brute & ann) / len(brute)
    # synthetic fixture's neighbors are near-orthogonal (cos ≈ 0.37) — the
    # hardest regime for hyperplane LSH; real clustered embeddings do better
    assert recall >= 0.6, f"ANN recall {recall}"
    assert 0 in ann  # query vector is its own nearest neighbor


def test_doc_fingerprint_stability(spark, docs):
    fp = docs.select("doc_id", "text", doc_fingerprint_expr(F.col("text")).alias("fp"))
    pdf = fp.toPandas()
    by_text = pdf.groupby("text")["fp"].nunique()
    assert (by_text == 1).all()  # identical text → identical fingerprint


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_media(docs)
    assert dict(media.dtypes)["media"] == "binary"
    feats = extract_image_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == docs.count()
    assert set(pdf["kind"]) <= {"image", "audio", "video"}
    assert (pdf["n_bytes"] > 0).all()
    # deterministic stub: re-run produces identical features
    pdf2 = extract_image_features(media).toPandas()
    a = pdf.sort_values("doc_id", ignore_index=True)
    b = pdf2.sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_jaccard_sparse_join_matches_naive(spark, docs):
    """Sparse posting-join Jaccard ≡ naive array_intersect formulation."""
    from crick_spark.pipeline.dedup import jaccard_ngram_pairs, shingles_expr

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_ngram_pairs(
            docs, "doc_id", "text", "lang", threshold=0.3
        ).collect()
    }
    sh = docs.select(
        "doc_id", "lang", shingles_expr(F.col("text"), 3).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    naive = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                inter.cast("double")
                / F.size(F.array_union(F.col("a.sh"), F.col("b.sh"))).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.3)
    )
    expected = {(r.id_a, r.id_b): round(r.jaccard, 6) for r in naive.collect()}
    assert got == expected


def test_embedding_near_dup_matches_numpy(spark):
    from crick_spark.pipeline.similarity import embedding_near_dup_pairs

    emb = load_table(spark, SF_SMALL, "embeddings")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(emb, threshold=0.35, n_blocks=4).collect()
    }
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    sims = mat @ mat.T
    ii, jj = np.nonzero(np.triu(sims >= 0.35, k=1))
    expected = {
        (min(ids[i], ids[j]), max(ids[i], ids[j])): round(float(sims[i, j]), 6)
        for i, j in zip(ii, jj)
    }
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-9, k


def test_resize_media_dims_and_determinism(spark, docs):
    from crick_spark.pipeline.multimodal import resize_media

    media = attach_fake_media(docs.limit(50))
    resized = resize_media(media, 16, 8).toPandas()
    assert len(resized) == 50
    for _, r in resized.iterrows():
        assert len(bytes(r["media"])) == 16 * 8
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 8
    again = resize_media(media, 16, 8).toPandas()
    a = resized.sort_values("doc_id", ignore_index=True)["media"].map(bytes)
    b = again.sort_values("doc_id", ignore_index=True)["media"].map(bytes)
    assert (a == b).all()


def test_sample_frames_timing(spark, docs):
    from crick_spark.pipeline.multimodal import sample_frames

    media = attach_fake_media(docs)
    frames = sample_frames(media, fps=1.0, max_frames=8).toPandas()
    meta = media.select("doc_id", "meta").toPandas()
    videos = {
        r["doc_id"]: r["meta"]["duration_s"]
        for _, r in meta.iterrows()
        if r["meta"]["kind"] == "video"
    }
    assert set(frames["doc_id"]) == set(videos)  # only videos sampled
    for doc_id, g in frames.groupby("doc_id"):
        expect = min(8, max(int(videos[doc_id] * 1.0), 1))
        assert len(g) == expect, doc_id
        assert sorted(g["frame_idx"]) == list(range(expect))
        assert (g["t_offset_s"] == g["frame_idx"] * 1.0).all()


def test_salted_agg_and_join_equal_plain(spark):
    from crick_spark.functions.skew import salted_agg, salted_join

    ev = load_table(spark, SF_SMALL, "events")
    plain = {
        r["event_type"]: (r["cnt"], round(r["s"], 6))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["cnt"], round(r["s"], 6))
        for r in salted_agg(
            ev, ["event_type"], [("value", "count", "cnt"), ("value", "sum", "s")]
        ).collect()
    }
    assert plain == salted

    n = load_table(spark, SF_SMALL, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    c = load_table(spark, SF_SMALL, "customer")
    plain_j = c.join(n, "c_nationkey").groupBy("n_name").count()
    salted_j = salted_join(c, n, "c_nationkey", n_salts=4).groupBy("n_name").count()
    assert {(r["n_name"], r["count"]) for r in plain_j.collect()} == {
        (r["n_name"], r["count"]) for r in salted_j.collect()
    }


def test_ivf_ann_recall_and_kmeans_convergence(spark):
    from crick_spark.pipeline.similarity import (
        cosine_topk,
        ivf_ann_topk,
        ivf_index,
        train_ivf_centroids,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    centroids = train_ivf_centroids(emb, k=8, n_iter=4)
    assert centroids.shape == (8, mat.shape[1])
    # every cluster non-degenerate on this data
    idx = ivf_index(emb, centroids).toPandas()
    assert idx["ivf_cluster"].nunique() >= 2
    # nprobe = k degenerates to brute force (recall 1.0 by construction)
    q = list(pdf.loc[pdf["vec_id"] == 0, "embedding"].iloc[0])
    brute = [r.vec_id for r in cosine_topk(emb, q, 10).collect()]
    full = [
        r.vec_id for r in ivf_ann_topk(emb, q, centroids, k=10, nprobe=8).collect()
    ]
    assert full == brute
    # partial probes: decent recall at 3/8 of the corpus scanned
    part = {
        r.vec_id for r in ivf_ann_topk(emb, q, centroids, k=10, nprobe=3).collect()
    }
    assert len(part & set(brute)) / 10 >= 0.5


def test_quantized_ann_recall(spark):
    from crick_spark.pipeline.similarity import quantized_cosine_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).collect()[0]["embedding"])
    brute = {r.vec_id for r in cosine_topk(emb, q, 10).collect()}
    quant = {
        r.vec_id for r in quantized_cosine_topk(emb, q, 10, rerank_factor=4).collect()
    }
    recall = len(brute & quant) / len(brute)
    # int8 symmetric quantization keeps ~7 bits of mantissa: ordering of the
    # top pool survives; the 4x rerank pool absorbs boundary swaps
    assert recall >= 0.8, f"quantized ANN recall {recall}"
    assert 0 in quant  # query vector is its own nearest neighbor


def test_opm_signatures_match_classic_pairs(spark, docs):
    """Densified one-permutation MinHash feeds the same LSH+verify pipeline
    and must recover the same verified pair set as the classic 64-hash
    signatures (precision is guaranteed by the exact verify; this pins
    recall parity on the fixture corpus)."""
    classic = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs(
            docs, "doc_id", "text", 0.7, one_perm=False
        ).collect()
    }
    opm = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs(docs, "doc_id", "text", 0.7, one_perm=True).collect()
    }
    assert opm == classic


def test_opm_signature_fully_densified(spark, docs):
    """No nulls survive densification, even for one-shingle documents."""
    from crick_spark.pipeline.dedup import minhash_signatures_opm

    tiny = spark.createDataFrame(
        [(1, "ab"), (2, "one two three four five")], ["doc_id", "text"]
    )
    for frame in (minhash_signatures_opm(docs, "doc_id", "text"),
                  minhash_signatures_opm(tiny, "doc_id", "text")):
        bad = frame.where(F.exists("minhash", lambda x: x.isNull())).count()
        assert bad == 0


def test_decontaminate_matches_python(spark, docs):
    from crick_spark.pipeline.dedup import decontaminate

    pdf = docs.select("doc_id", "text").toPandas()
    eval_grams = set()
    corpus = {}
    for r in pdf.itertuples():
        sh = _shingle_set(r.text, n=4)
        if r.doc_id % 97 == 0:
            eval_grams |= sh
        else:
            corpus[r.doc_id] = sh
    truth = {
        d: (len(sh & eval_grams), len(sh))
        for d, sh in corpus.items()
        if sh & eval_grams
    }
    ev = docs.where(F.col("doc_id") % 97 == 0)
    cor = docs.where(F.col("doc_id") % 97 != 0)
    out = {
        r.doc_id: (r.hit_grams, r.total_grams)
        for r in decontaminate(cor, ev, "doc_id", "text", n=4).collect()
    }
    assert out == truth
    assert truth, "fixture should contain contaminated docs"


def test_repetition_exprs_match_python(spark, docs):
    from crick_spark.pipeline.text import repetition_exprs

    pdf = docs.select("doc_id", "text").toPandas()
    out = {
        r.doc_id: r
        for r in docs.select("doc_id", *repetition_exprs(F.col("text"))).collect()
    }
    for r in pdf.itertuples():
        w = r.text.strip().split()
        grams = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        dup2 = 1.0 - len(set(grams)) / len(grams) if grams else 0.0
        topf = max(w.count(t) for t in set(w)) / len(w)
        got = out[r.doc_id]
        assert got.n_tokens == len(w)
        assert abs(got.dup_2gram_frac - dup2) < 1e-6, r.doc_id
        assert abs(got.top_token_frac - topf) < 1e-6, r.doc_id


def test_repetition_filter_flags_degenerate_docs(spark):
    from crick_spark.pipeline.text import repetition_exprs

    df = spark.createDataFrame(
        [(0, "spam spam spam spam spam spam"), (1, "one two three four five six")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *repetition_exprs(F.col("text"))).collect()
    }
    assert out[0].dup_2gram_frac > 0.5 and out[0].top_token_frac == 1.0
    assert out[1].dup_2gram_frac == 0.0
    assert abs(out[1].top_token_frac - 1 / 6) < 1e-6


def test_domain_mix_resample(spark, docs):
    from crick_spark.pipeline.sampling import domain_mix_resample, domain_mix_summary

    share = (
        F.lit(20) - F.substring(F.col("source"), 4, 10).cast("int")
    ) / F.lit(210.0)
    summ = {r.source: r for r in domain_mix_summary(docs, "source", share, "doc_id").collect()}
    assert set(summ) == {f"src{k}" for k in range(20)}
    # binding stratum (largest target share on a uniform corpus) keeps everything
    assert summ["src0"].keep_rate == 1.0 and summ["src0"].n_kept == summ["src0"].n_total
    # keep rates decline with the target share: rate_k = (20-k)/20 on uniform counts
    for k in range(20):
        assert abs(summ[f"src{k}"].keep_rate - (20 - k) / 20) < 1e-6, k
    # realized share tracks the target within binomial noise (25-doc strata)
    for k in range(20):
        target = (20 - k) / 210.0
        assert abs(summ[f"src{k}"].realized_share - target) < 0.05, k
    # deterministic: identical kept set under a different partitioning
    a = {r.doc_id for r in domain_mix_resample(docs, "source", share, "doc_id").collect()}
    b = {
        r.doc_id
        for r in domain_mix_resample(
            docs.repartition(7, "lang"), "source", share, "doc_id"
        ).collect()
    }
    assert a == b and a


def test_null_and_empty_text_postings_identical(spark):
    """NULL text is coalesced to '' before shingling: null-text and
    empty-text docs emit the SAME single fallback posting (the
    every-doc-has-≥1-posting invariant densification relies on), and
    they pair with each other — but not with real-content docs — in the
    sparse Jaccard join (documented shingle_hash_postings semantics)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from crick_spark.pipeline.dedup import shingle_hash_postings

    schema = StructType(
        [StructField("doc_id", StringType()), StructField("text", StringType())]
    )
    docs = spark.createDataFrame(
        [("d_null", None), ("d_empty", ""), ("d_real", "the quick brown fox")],
        schema,
    )
    posts = shingle_hash_postings(docs, "doc_id", "text").collect()
    by_doc = {}
    for r in posts:
        by_doc.setdefault(r.doc_id, set()).add(r.th)
    # every doc emits at least one posting; null ≡ empty, real differs
    assert set(by_doc) == {"d_null", "d_empty", "d_real"}
    assert len(by_doc["d_null"]) == 1 and len(by_doc["d_empty"]) == 1
    assert by_doc["d_null"] == by_doc["d_empty"]
    assert by_doc["d_real"].isdisjoint(by_doc["d_null"])


def test_zorder_tightens_per_file_ranges(spark, tmp_path):
    """Z-order clustering must (a) preserve row content exactly and
    (b) tighten per-file min/max envelopes on BOTH clustered columns at
    once — the statistic parquet row-group pruning consults.  Metric:
    mean per-file fraction of each column's global range; a random
    (unsorted) layout leaves every file spanning ~the full range
    (fraction ≈ 1), the Morton layout must cut the mean fraction on both
    dimensions substantially."""
    from crick_spark.pipeline.layout import scan_stats, zorder_by
    from crick_spark.sources.tables import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    plain_path = str(tmp_path / "plain.parquet")
    z_path = str(tmp_path / "zorder.parquet")
    files_opt = ("maxRecordsPerFile", 500)
    li.repartition(4).write.option(*files_opt).parquet(plain_path)
    zorder_by(li, ["l_partkey", "l_suppkey"], bits_per_col=6, num_partitions=4).write.option(
        *files_opt
    ).parquet(z_path)

    # (a) content identical
    z = spark.read.parquet(z_path)
    assert z.count() == li.count()
    assert (
        z.exceptAll(li).count() == 0 and li.exceptAll(z).count() == 0
    ), "zorder_by changed row content"

    # (b) per-file envelopes tight in both dims
    def mean_frac(path, col):
        stats = scan_stats(spark, path, ["l_partkey", "l_suppkey"]).toPandas()
        lo, hi = stats[f"min_{col}"], stats[f"max_{col}"]
        full = max(stats[f"max_{col}"].max() - stats[f"min_{col}"].min(), 1)
        return float(((hi - lo) / full).mean())

    for col in ("l_partkey", "l_suppkey"):
        plain_f = mean_frac(plain_path, col)
        z_f = mean_frac(z_path, col)
        assert z_f < plain_f * 0.6, (
            f"{col}: z-order mean per-file range fraction {z_f:.3f} "
            f"not < 60% of unsorted {plain_f:.3f}"
        )


def test_simhash_swar_packing_bit_identical(spark, docs):
    """The 32-bit-lane SWAR vote packing must reproduce the unpacked
    64-aggregate fingerprints exactly (vote_b = 2*bitcount_b - n > 0 is
    the same predicate as sum(+/-1) > 0)."""
    from functools import reduce

    from crick_spark.pipeline.dedup import simhash_signatures, words_expr

    got = {
        r.doc_id: r.sh for r in simhash_signatures(docs, "doc_id", "text").collect()
    }
    h = docs.select(
        F.col("doc_id"), F.explode(words_expr(F.col("text"))).alias("w")
    ).select(F.col("doc_id"), F.xxhash64(F.col("w")).alias("h"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    fingerprint = reduce(
        lambda a, c: a.bitwiseOR(c),
        [
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
            for b in range(64)
        ],
    )
    want = {r.doc_id: r.sh for r in votes.select("doc_id", fingerprint.alias("sh")).collect()}
    assert got == want


def test_zvalue_bit_interleave_roundtrip(spark):
    """zvalue_expr must place bit i of column c at output bit i*ncols+c —
    checked against a pure-Python Morton encode over exhaustive 2x6-bit
    codes (sampled grid) and 3-column interleave."""
    from crick_spark.pipeline.layout import zvalue_expr

    def py_morton(codes, bits, ncols):
        z = 0
        for c, code in enumerate(codes):
            for i in range(bits):
                z |= ((code >> i) & 1) << (i * ncols + c)
        return z

    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r.a, r.b): r.z
        for r in df.select(
            "a", "b", zvalue_expr([F.col("a"), F.col("b")], 6).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == py_morton([a, b], 6, 2), (a, b)

    rows3 = [(a, a * 3 % 16, a * 7 % 16) for a in range(16)]
    df3 = spark.createDataFrame(rows3, ["a", "b", "c"])
    got3 = {
        (r.a, r.b, r.c): r.z
        for r in df3.select(
            "a", "b", "c",
            zvalue_expr([F.col("a"), F.col("b"), F.col("c")], 4).alias("z"),
        ).collect()
    }
    for t in rows3:
        assert got3[t] == py_morton(list(t), 4, 3), t


def test_bucket_code_matches_searchsorted(spark):
    """bucket_code_expr's branchless binary search must equal numpy
    searchsorted(cuts, x, side='right') for values on, between, below,
    and above every cut."""
    import numpy as np

    from crick_spark.pipeline.layout import bucket_code_expr

    bits = 4
    cuts = sorted(float(v) for v in np.linspace(3, 93, (1 << bits) - 1))
    xs = (
        [c for c in cuts]
        + [c + 0.5 for c in cuts]
        + [-10.0, 0.0, 94.0, 1e9]
    )
    df = spark.createDataFrame([(float(x),) for x in xs], ["x"])
    got = {
        r.x: r.code
        for r in df.select(
            "x", bucket_code_expr(F.col("x"), cuts, bits).alias("code")
        ).collect()
    }
    want = np.searchsorted(np.array(cuts), np.array(xs), side="right")
    for x, w in zip(xs, want):
        assert got[float(x)] == int(w), (x, got[float(x)], int(w))


def test_simhash_handles_book_length_docs(spark):
    """The 32-bit SWAR lanes must not overflow on a book-length document
    (the 16-bit-lane variant would throw ARITHMETIC_OVERFLOW under ANSI
    mode past ~65k words): fingerprint a 70k-word doc and check it equals
    the fingerprint of the same word multiset computed per-bit in Python."""
    from crick_spark.pipeline.dedup import simhash_signatures

    words = [f"w{i % 97}" for i in range(70_000)]
    docs = spark.createDataFrame([("big", " ".join(words))], ["doc_id", "text"])
    (row,) = simhash_signatures(docs, "doc_id", "text").collect()

    hashes = {
        r.w: r.h
        for r in spark.createDataFrame([(w,) for w in set(words)], ["w"])
        .select("w", F.xxhash64("w").alias("h"))
        .collect()
    }
    from collections import Counter

    counts = Counter(words)
    n = sum(counts.values())
    expect = 0
    for b in range(64):
        ones = sum(c for w, c in counts.items() if (hashes[w] >> b) & 1)
        if 2 * ones > n:
            expect |= 1 << b
    # Python ints are unbounded; fold to signed 64-bit like Spark's long
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert row.sh == expect


def test_pack_sequences_fill_bounds_and_conservation(spark, docs):
    """Concat-and-bin packing invariants: total tokens are conserved,
    every sequence holds at most budget + (max_chunk − 1) tokens, and
    every non-final sequence in a shard holds at least
    budget − (max_chunk − 1) — the deterministic overflow bound of the
    never-split-a-chunk rule."""
    from crick_spark.pipeline.text import chunk_exprs, pack_sequences

    budget, max_chunk = 256, 32  # small budget → many sequences per shard
    chunks = docs.select(
        "doc_id", F.explode(chunk_exprs(F.col("text"), 32, 8)).alias("ch")
    ).select(
        "doc_id",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.n_chunk_tokens").alias("n_chunk_tokens"),
    )
    packed = pack_sequences(chunks, max_tokens=budget, n_shards=8)
    seqs = (
        packed.groupBy("shard", "seq_id")
        .agg(F.sum("n_chunk_tokens").alias("seq_tokens"))
        .toPandas()
    )
    total = chunks.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    assert seqs["seq_tokens"].sum() == total  # nothing dropped or split
    assert (seqs["seq_tokens"] < budget + max_chunk).all()
    last_per_shard = seqs.groupby("shard")["seq_id"].transform("max")
    non_final = seqs[seqs["seq_id"] != last_per_shard]
    assert len(non_final) > 0
    assert (non_final["seq_tokens"] > budget - max_chunk).all()


def test_multimodal_survives_null_text(spark):
    """A NULL-text document must flow through the media pipeline as an
    empty blob (the decode kernels call bytes(data) per row — a NULL
    media value would throw and kill the whole query; past driver
    fixtures have contained NULL texts)."""
    df = spark.createDataFrame(
        [(1, None, 0), (2, "some words here", 15)],
        "doc_id long, text string, n_chars long",
    )
    media = attach_fake_media(df)
    pdf = extract_image_features(media).toPandas().sort_values("doc_id")
    assert len(pdf) == 2
    assert pdf.iloc[0]["n_bytes"] == 0
    assert pdf.iloc[1]["n_bytes"] == 15


def test_bm25_matches_python_oracle(spark, docs):
    """bm25_scores must reproduce a from-scratch pure-Python BM25
    (Lucene idf, k1=1.2, b=0.75) for every document, and the plan must
    be explode-free (tf via codegen array ops — the no-shuffle scoring
    path is the operator's 100 TB contract)."""
    import math

    from crick_spark.pipeline.retrieval import bm25_scores, bm25_topk

    terms = ["spark", "join", "stream"]
    pdf = docs.select("doc_id", "text").toPandas()
    toks = {r.doc_id: r.text.strip().split() for r in pdf.itertuples()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    k1, b = 1.2, 0.75

    def score(doc_toks):
        dl = len(doc_toks)
        s = 0.0
        for t in terms:
            tf = doc_toks.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
        return s

    want = {d: score(t) for d, t in toks.items()}
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, terms).collect()}
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) <= 1e-9, (d, got[d], want[d])

    top = bm25_topk(docs, terms, k=15)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "BM25 scoring must not explode tokens"
    assert "TakeOrderedAndProject" in plan, "top-k must be heap-based"

    ranked = sorted(want, key=lambda d: (-round(want[d], 6), d))[:15]
    assert [r.doc_id for r in top.collect()] == ranked


def test_bm25_bulk_matches_per_query_scorer(spark, docs):
    """bm25_bulk_scores (posting-join variant) must equal the per-query
    scorer on every query of a panel — same scores to 1e-9, with the
    bulk form omitting exactly the zero-score (no shared term) docs."""
    from crick_spark.pipeline.retrieval import bm25_bulk_scores, bm25_scores

    panel = [
        (1, ["spark", "join", "stream"]),
        (2, ["table", "scan"]),
        (3, ["window", "agg", "filter", "batch"]),
        (4, ["zz_not_in_corpus"]),  # no hits: query absent from output
        (5, ["spark", "spark", "join"]),  # dup terms dedupe to a set
    ]
    queries = spark.createDataFrame(panel, ["query_id", "terms"])
    got = {
        (r.query_id, r.doc_id): r.bm25
        for r in bm25_bulk_scores(docs, queries).collect()
    }
    want = {}
    for qid, terms in panel:
        per = bm25_scores(docs, sorted(set(terms))).collect()
        for r in per:
            if r.bm25 > 0:
                want[(qid, r.doc_id)] = r.bm25
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) <= 1e-9, (key, got[key], want[key])
    assert not any(q == 4 for q, _ in got), "no-hit query must be absent"


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank must equal a from-scratch numpy power iteration on a
    random weighted digraph (every node given an out-edge, matching the
    operator's no-dangling contract), and total rank mass must be
    conserved at 1.0."""
    import numpy as np

    from crick_spark.pipeline.graph import pagerank

    rng = np.random.RandomState(7)
    n = 30
    edges = []
    for s in range(n):
        outs = rng.choice(n, size=rng.randint(1, 5), replace=False)
        for d in outs:
            edges.append((f"v{s}", f"v{int(d)}", float(rng.randint(1, 10))))
    df = spark.createDataFrame(edges, ["src", "dst", "w"])

    # numpy reference: column-stochastic transition on the same node set
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    P = np.zeros((m, m))
    for s, d, w in edges:
        P[idx[d], idx[s]] += w
    P /= P.sum(axis=0, keepdims=True)
    r = np.full(m, 1.0 / m)
    for _ in range(3):
        r = 0.15 / m + 0.85 * P @ r

    got = {
        row.node: row.rank
        for row in pagerank(df, iterations=3, damping=0.85, weight_col="w").collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_deep_chain_dangling_nodes(spark):
    """10-iteration PageRank on a graph WITH sink nodes: dangling-mass
    redistribution must match the numpy power iteration (zero-column
    transition + dm/N correction) at 1e-9, total mass must stay exactly
    1.0, and the automatic localCheckpoint truncation must keep the
    final plan's join count bounded by checkpoint_interval, not by the
    iteration count."""
    import numpy as np

    from crick_spark.pipeline.graph import pagerank

    rng = np.random.RandomState(11)
    n = 25
    edges = []
    for s in range(n - 5):  # last 5 nodes have NO out-edges (sinks)
        outs = rng.choice(n, size=rng.randint(1, 4), replace=False)
        for d in outs:
            edges.append((f"v{s}", f"v{int(d)}", float(rng.randint(1, 9))))
    df = spark.createDataFrame(edges, ["src", "dst", "w"])

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    P = np.zeros((m, m))
    for s, d, w in edges:
        P[idx[d], idx[s]] += w
    has_out = P.sum(axis=0) > 0
    P[:, has_out] /= P[:, has_out].sum(axis=0, keepdims=True)
    d = 0.85
    r = np.full(m, 1.0 / m)
    for _ in range(10):
        dm = r[~has_out].sum()
        r = (1 - d) / m + d * (P @ r + dm / m)

    out = pagerank(
        df, iterations=10, damping=d, weight_col="w",
        checkpoint_interval=4, eager=True,
    )
    got = {row.node: row.rank for row in out.collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9, "dangling mass lost"

    # bounded lineage: rebuild lazily and inspect the final plan.  Each
    # iteration references the previous rank vector TWICE (contrib +
    # dangling mass), so un-truncated lineage doubles per step — 10
    # iterations would be ~2^10 subtree copies (thousands of joins).
    # With interval=4 the tail is 2 iterations => at most 4 copies of
    # the checkpoint scan at ~6 joins each; assert well under the
    # untruncated blowup but enough headroom for plan-shape noise.
    lazy = pagerank(
        df, iterations=10, damping=d, weight_col="w",
        checkpoint_interval=4,
    )
    plan = lazy._jdf.queryExecution().optimizedPlan().toString()
    n_joins = plan.count("Join")
    assert n_joins <= 64, f"plan not truncated: {n_joins} joins"


def test_pagerank_depth1_dag_fast_path_matches_numpy(spark):
    """r14 optimization: a graph whose every source is pure (no in-edges
    — the customer→supplier purchase DAG shape) takes the scalar-mass
    fast path (_pagerank_depth1_dag); its ranks must equal the numpy
    power iteration with dangling redistribution at 1e-9, conserve total
    mass, and cover the same node set as the general path."""
    import numpy as np

    from crick_spark.pipeline.graph import pagerank

    rng = np.random.RandomState(23)
    n_src, n_snk = 12, 6
    edges = []
    for s in range(n_src):
        outs = rng.choice(n_snk, size=rng.randint(1, 4), replace=False)
        for t in outs:
            edges.append((s * 2, int(t) * 2 + 1, float(rng.randint(1, 9))))
    df = spark.createDataFrame(edges, ["src", "dst", "w"])

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    P = np.zeros((m, m))
    for s, t, w in edges:
        P[idx[t], idx[s]] += w
    has_out = P.sum(axis=0) > 0
    P[:, has_out] /= P[:, has_out].sum(axis=0, keepdims=True)
    d = 0.85
    r = np.full(m, 1.0 / m)
    for _ in range(10):
        dm = r[~has_out].sum()
        r = (1 - d) / m + d * (P @ r + dm / m)

    out = pagerank(
        df, iterations=10, damping=d, weight_col="w",
        checkpoint_interval=3, eager=True,
    )
    got = {row.node: row.rank for row in out.collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # assume_none on the same DAG: sources keep the static (1-d)/N scalar
    got2 = {
        row.node: row.rank
        for row in pagerank(
            df, iterations=3, damping=d, weight_col="w",
            dangling="assume_none", eager=True,
        ).collect()
    }
    r2 = np.full(m, 1.0 / m)
    for _ in range(3):
        r2 = (1 - d) / m + d * (P @ r2)
    for v in nodes:
        assert abs(got2[v] - r2[idx[v]]) < 1e-9


def test_dup_recall_gates_survive_tokenless_docs(spark):
    """Regression for the review finding: fixtures containing several
    token-less docs (NULL / empty / whitespace text) must not break the
    exact-dup recall statements — simhash emits no fingerprint for such
    docs, so they are excluded from the ground truth on both sides, and
    doc fingerprints must treat NULL and '' as the same text."""
    from crick_spark.pipeline.dedup import simhash_signatures
    from crick_spark.pipeline.text import doc_fingerprint_expr

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "a b c"), (5, "a b c")],
        ["doc_id", "text"],
    )
    # NULL text emits NO signature (words_expr(NULL) is NULL) — this is
    # why the gate's ground truth must exclude token-less docs: the old
    # md5(coalesce(text,'')) oracle paired doc 1 with doc 2, a pair
    # simhash can never produce.  Empty/whitespace docs DO hash (one
    # empty token) and pair with each other.
    sigs = {r.doc_id: r.sh for r in simhash_signatures(docs, "doc_id", "text").collect()}
    assert 1 not in sigs, "NULL-text docs must emit no signature"
    assert sigs[2] == sigs[3]
    assert sigs[4] == sigs[5]
    # the gate's trimmed-text ground truth keeps only (4,5) — found
    kept = docs.where(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
    assert {r.doc_id for r in kept.collect()} == {4, 5}

    # fingerprints of the coalesced text: NULL and '' must agree
    fps = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id",
            doc_fingerprint_expr(
                F.coalesce(F.col("text"), F.lit(""))
            ).alias("fp"),
        ).collect()
    }
    assert fps[1] == fps[2], "NULL-text and empty-text must share a fingerprint"


# ---------------------------------------------------------------------------
# Decoder seam contract (r5 VERDICT item 8): the multimodal pipeline's
# schemas, batch plumbing, and feature math must be DECODER-AGNOSTIC —
# swapping the stub for a "real" codec changes only pixel values, never
# shapes.  The fake real decoder below interprets the blob's actual bytes
# as the pixel/sample stream (what an uncompressed-bitmap codec does), so
# expected features are hand-computable from the input bytes.
# ---------------------------------------------------------------------------
def _make_literal_decoder():
    # built fresh per test: a NESTED function is cloudpickle-serialized by
    # value, exactly how a production caller's codec closure ships — a
    # module-level function here would pickle by reference and fail on
    # workers (the tests package is not on the executor path)
    def literal_decoder(data: bytes, kind: str):
        import numpy as np

        if kind not in ("image", "audio", "video"):
            raise NotImplementedError(kind)
        px = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int64)
        if len(px) == 0:
            px = np.zeros(1, dtype=np.int64)
        return px

    return literal_decoder


def test_decoder_seam_features(spark, docs):
    """extract_image_features(decoder=...) : same schema, features are the
    real byte statistics of each blob."""
    import numpy as np

    from crick_spark.pipeline.multimodal import FEATURE_SCHEMA

    media = attach_fake_media(docs.limit(30))
    via_stub = extract_image_features(media)
    via_real = extract_image_features(media, decoder=_make_literal_decoder())
    assert via_real.schema == via_stub.schema == FEATURE_SCHEMA

    blobs = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    got = {r["doc_id"]: r for r in via_real.collect()}
    assert set(got) == set(blobs)
    for doc_id, data in blobs.items():
        px = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        if len(px) == 0:
            px = np.zeros(1)
        assert got[doc_id]["n_bytes"] == len(data)
        assert abs(got[doc_id]["mean_intensity"] - px.mean()) < 1e-9
        assert abs(got[doc_id]["std_intensity"] - px.std()) < 1e-9


def test_decoder_seam_resize_and_audio(spark, docs):
    """resize_media / audio_window_features accept the same decoder and
    keep their output contracts (dims rewritten, media = w*h bytes; rms
    matches the hand-computed value over the literal byte stream)."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        audio_window_features,
        resize_media,
    )

    media = attach_fake_media(docs.limit(30))
    resized = resize_media(media, 12, 5, decoder=_make_literal_decoder()).toPandas()
    assert (resized["meta"].map(lambda m: (m["width"], m["height"])) == (12, 5)).all()
    assert (resized["media"].map(len) == 60).all()

    audio = media.where("meta.kind = 'audio'")
    feats = audio_window_features(
        audio, window_s=1.0, max_windows=4, decoder=_make_literal_decoder()
    ).toPandas()
    blobs = {r["doc_id"]: bytes(r["media"]) for r in audio.collect()}
    one = feats[feats["window_idx"] == 0].iloc[0]
    samples = np.frombuffer(blobs[one["doc_id"]], dtype=np.uint8).astype(np.float64)
    if len(samples) == 0:
        samples = np.zeros(1)
    centered = samples - 127.5
    dur = feats[feats["doc_id"] == one["doc_id"]].shape[0]
    per = max(len(centered) // dur, 1)
    win = centered[:per]
    assert abs(one["rms_energy"] - float(np.sqrt(np.mean(win**2)))) < 1e-9


def test_decoder_seam_frames(spark, docs):
    """sample_frames takes a frame-level decoder: a fake frame-seeking
    codec returning [frame_idx] * 16 shows per-frame routing is real."""
    import numpy as np

    from crick_spark.pipeline.multimodal import sample_frames

    def fake_frame_decoder(data, kind, frame_idx, n_frames):
        assert kind == "video" and 0 <= frame_idx < n_frames
        return np.full(16, frame_idx, dtype=np.int64)

    media = attach_fake_media(docs.limit(40))
    frames = sample_frames(media, fps=1.0, max_frames=4,
                           frame_decoder=fake_frame_decoder).toPandas()
    assert len(frames) > 0
    for _, r in frames.iterrows():
        assert bytes(r["frame"]) == bytes([r["frame_idx"]] * 16)


def test_semantic_dedup_matches_numpy(spark):
    """Spark semantic_dedup ≡ a from-scratch numpy SemDeDup on the same
    (deterministic) clustering: identical keep set and witness sims."""
    from crick_spark.pipeline.similarity import semantic_dedup, train_ivf_centroids

    emb = load_table(spark, SF_SMALL, "embeddings")
    eps, k = 0.4, 8
    cents = train_ivf_centroids(emb, k=k)
    got = {
        r["vec_id"]: (r["cluster"], r["keep"], r["max_sim_kept"])
        for r in semantic_dedup(emb, eps=eps, k=k, centroids=cents).collect()
    }
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    ids = pdf["vec_id"].to_numpy()
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    assign = (mat @ cn.T).argmax(axis=1)
    n_removed = 0
    for c in np.unique(assign):
        sel = np.where(assign == c)[0]
        cent_sim = mat[sel] @ cn[c]
        order = sel[np.lexsort((ids[sel], np.round(cent_sim, 12)))]
        kept: list[int] = []
        for i in order:
            ms = float((mat[kept] @ mat[i]).max()) if kept else None
            keep = ms is None or ms < eps
            g_cluster, g_keep, g_ms = got[ids[i]]
            assert g_cluster == c and g_keep == keep, ids[i]
            if ms is not None:
                assert abs(g_ms - ms) < 1e-9, ids[i]
            if keep:
                kept.append(i)
            else:
                n_removed += 1
    assert n_removed > 0, "fixture's planted near-dups should be removed"


def test_semantic_dedup_removes_planted_paraphrase_clones(spark):
    """A corpus of near-identical vectors collapses to ~1 kept per clone
    family; orthogonal vectors all survive."""
    from crick_spark.pipeline.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 32))
    rows = []
    vid = 0
    for fam in range(4):
        for _ in range(5):  # 5 clones per family, tiny jitter
            v = base[fam] + rng.normal(scale=1e-3, size=32)
            rows.append((vid, [float(x) for x in v])); vid += 1
    for _ in range(6):  # plus isolated random vectors
        rows.append((vid, [float(x) for x in rng.normal(size=32)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, eps=0.95, k=4).toPandas()
    kept_clones = out[(out["vec_id"] < 20) & out["keep"]]
    # each clone family keeps exactly one representative
    assert len(kept_clones) == 4
    assert out[out["vec_id"] >= 20]["keep"].all()


def test_bpe_train_matches_python_reference(spark):
    """Distributed BPE trainer == pure-Python reference on the same word
    counts: identical merge sequence (pair + frequency, tie-determinism)."""
    from collections import Counter

    from crick_spark.pipeline.text import bpe_train

    texts = [
        "low lower lowest", "low low newer", "newer newest new",
        "wider wide wide", "low newer",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, n_merges=6)

    # pure-Python reference (classic Sennrich et al. trainer loop)
    wc = Counter(w for t in texts for w in t.lower().split() if len(w) >= 2)
    vocab = {w: list(w) for w in wc}
    expect = []
    for _ in range(6):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc[w]
        if not pairs:
            break
        (l, r), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((l, r, freq))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r); i += 2
                else:
                    merged.append(syms[i]); i += 1
            vocab[w] = merged
    assert got == expect, f"{got} != {expect}"


def test_token_entropy_degenerate_single_token_source(spark, tmp_path):
    """vocab=1 sources report normalized_entropy = 0 (maximally
    degenerate), not NULL slipping past a < threshold filter — asserted
    against the PRODUCTION registered query via a synthetic sf_dir."""
    from crick_spark.plans.registry import QUERIES

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam", "s1"), (2, "a varied set of words", "s2")],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in QUERIES["token_entropy_by_source"].fn(spark, str(tmp_path)).collect()
    }
    assert out["s1"]["vocab_size"] == 1
    assert out["s1"]["normalized_entropy"] == 0.0
    assert out["s2"]["normalized_entropy"] is not None
    assert out["s2"]["normalized_entropy"] > 0.9


def test_lsh_bulk_matches_per_query_on_panel(spark):
    """Bulk LSH (one job) must return EXACTLY the per-query path's top-k
    for every query on a 20-query panel — same candidate predicate
    ("any table's bucket in probes"), same rerank tie-break (cosine
    desc, id asc).  Round-6 bulk-ANN equivalence gate."""
    from crick_spark.pipeline.similarity import lsh_bulk_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    n_queries, k = 20, 10
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bulk = lsh_bulk_topk(queries, emb, k=k, nbits=6, num_tables=8).collect()
    by_q = {}
    for r in sorted(bulk, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id") < n_queries).collect()
    }
    assert set(by_q) == set(qvecs)
    for qid, qv in qvecs.items():
        per = [
            r["vec_id"]
            for r in lsh_ann_topk(emb, qv, k=k, nbits=6, num_tables=8).collect()
        ]
        assert by_q[qid] == per, f"query {qid}: bulk {by_q[qid]} != per {per}"


def test_bulk_cosine_topk_matches_numpy(spark):
    """Exact bulk baseline vs a numpy oracle for 5 queries (same oracle
    style as test_cosine_topk_matches_numpy, panel form)."""
    from crick_spark.pipeline.similarity import bulk_cosine_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {}
    for r in bulk_cosine_topk(queries, emb, k=10).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid in range(5):
        q = mat[ids == qid][0]
        cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
        order = np.lexsort((ids, -np.round(cos, 12)))
        expected = list(ids[order][:10])
        assert [v for _, v in sorted(got[qid])] == expected, qid


def test_bpe_batched_equals_sequential(spark):
    """Round-6 batching gate: the batched trainer (top-m disjoint pairs
    per round, strict frequency gap to the first excluded pair) must
    produce the BYTE-IDENTICAL merge list of the one-merge-per-round
    sequential trainer, in fewer rounds."""
    from crick_spark.pipeline.text import bpe_train

    texts = [
        "low lower lowest", "low low newer", "newer newest new",
        "wider wide wide", "low newer", "the quick brown fox jumps",
        "she sells sea shells by the sea shore", "peter piper picked",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq_stats, bat_stats = {}, {}
    seq = bpe_train(docs, n_merges=12, batch_size=1, stats=seq_stats)
    bat = bpe_train(docs, n_merges=12, batch_size=8, stats=bat_stats)
    assert bat == seq
    assert seq_stats["rounds"] == 12
    assert bat_stats["rounds"] < seq_stats["rounds"], bat_stats


def test_semantic_dedup_mega_cluster_guard(spark):
    """Round-6 guard gate: a corpus collapsing into few k-means clusters
    must be re-sharded so no single applyInPandas group exceeds the cap,
    while near-identical duplicates still land in one shard (LSH bands
    are locality sensitive) and get deduped."""
    from crick_spark.pipeline.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=64)
    rows = []
    # 30 near-duplicates of one vector + 170 random vectors, all forced
    # through k=2 clustering with a 50-row cap -> sharding must kick in
    for i in range(30):
        v = base + rng.normal(scale=1e-3, size=64)
        rows.append((i, [float(x) for x in v]))
    for i in range(30, 200):
        rows.append((i, [float(x) for x in rng.normal(size=64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semantic_dedup(df, eps=0.95, k=2, max_cluster_rows=50).toPandas()
    # completeness: every vector flagged exactly once despite sharding
    assert len(out) == 200 and out["vec_id"].nunique() == 200
    # the planted near-dup family still collapses to ~one keeper: LSH
    # bands keep near-identical vectors together
    kept_clones = out[(out["vec_id"] < 30) & out["keep"]]
    assert len(kept_clones) <= 2
    # guard off -> identical keep decisions on this small corpus ARE NOT
    # required (sharding may split random-vector comparisons), but the
    # unguarded path must still work
    out_off = semantic_dedup(df, eps=0.95, k=2, max_cluster_rows=None).toPandas()
    assert len(out_off) == 200


def test_unigram_lm_em_monotone_and_segmentation(spark):
    """Round-6 unigram-LM trainer: hard-EM log-likelihood is
    non-decreasing (coordinate ascent), training is deterministic, and
    Viterbi segments with learned multi-char pieces where they help."""
    import math

    from crick_spark.pipeline.text import _viterbi, unigram_lm_train

    texts = [
        "the cat sat on the mat", "the cats sat", "a cat and a mat",
        "the mat on the cat", "cats and mats", "the the the cat",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    stats = {}
    vocab = unigram_lm_train(
        docs, vocab_size=40, seed_size=200, em_rounds=4, stats=stats
    )
    trace = stats["loglik_trace"]
    assert all(b >= a - 1e-9 for a, b in zip(trace, trace[1:])), trace
    assert abs(sum(math.exp(lp) for _, lp in vocab) - 1.0) < 1e-9
    assert vocab == unigram_lm_train(
        docs, vocab_size=40, seed_size=200, em_rounds=4
    )
    logp = dict(vocab)
    # 'the' and 'cat' are frequent -> must be single pieces, and Viterbi
    # must prefer them over char-by-char segmentation
    assert "the" in logp and "cat" in logp
    pieces, score = _viterbi("thecat", logp, 6)
    assert pieces == ["the", "cat"]
    char_score = sum(logp[c] for c in "thecat")
    assert score > char_score


def test_viterbi_batch_equals_scalar():
    """r9 (VERDICT item 6): the vectorized E-step trellis must be
    byte-identical to the scalar kernel — same pieces AND bit-equal
    scores — across random vocabularies and words, including ties
    (shortest-piece rule), length-1 words, words at max piece length,
    and the padding boundary (mixed word lengths in one batch)."""
    import math
    import random

    from crick_spark.pipeline.text import _viterbi, _viterbi_batch

    rng = random.Random(13)
    chars = list("abcdef")
    logp = {c: math.log(rng.uniform(0.01, 0.1)) for c in chars}
    # deliberate exact-tie pieces: p('xy') == p('x')+p('y') cases arise
    # naturally from the log-uniform draws; add composites anyway
    for _ in range(60):
        p = "".join(rng.choice(chars) for _ in range(rng.randint(2, 6)))
        logp.setdefault(p, math.log(rng.uniform(0.001, 0.05)))
    ab = logp["a"] + logp["b"]
    logp["ab"] = ab  # exact tie: scalar keeps the shortest-piece path
    words = [
        "".join(rng.choice(chars) for _ in range(rng.randint(1, 15)))
        for _ in range(400)
    ] + ["a", "ab", "abcdef" * 3, "f" * 20]
    got = _viterbi_batch(words, logp, 6)
    for w, g in zip(words, got):
        exp = _viterbi(w, logp, 6)
        assert g[0] == exp[0], (w, g[0], exp[0])
        assert g[1] == exp[1], (w, g[1], exp[1])
    assert _viterbi_batch([], logp, 6) == []

    # scalar-parity on unsegmentable words: the scalar kernel raises
    # (back[i] is None) on a char no piece covers; batch must match,
    # never emit a bogus -inf segmentation or livelock
    import pytest

    from crick_spark.pipeline.text import _estep_batch

    with pytest.raises(TypeError, match="not segmentable"):
        _viterbi_batch(["ab", "aß"], {"a": -1.0, "b": -1.0}, 6)
    with pytest.raises(TypeError, match="not segmentable"):
        _estep_batch(["ab", "aß"], [1, 1], {"a": -1.0, "b": -1.0}, 6)

    # astral-plane codepoints exercise the UCS4 uint32-view path
    emoji = "\U0001F600\U0001F680"
    lp2 = {c: math.log(0.2) for c in set("ab" + emoji)}
    lp2[emoji] = math.log(0.3)
    uwords = ["a" + emoji, emoji + "b", emoji * 3, "ab"]
    for w, g in zip(uwords, _viterbi_batch(uwords, lp2, 6)):
        e = _viterbi(w, lp2, 6)
        assert g[0] == e[0] and g[1] == e[1], (w, g, e)


def test_estep_batch_equals_scalar_loop():
    """r9: the vectorized E-step (lockstep backtrack + bincount) must
    produce EXACTLY the scalar loop's piece counts — integer-equal, the
    property that keeps EM piece tables byte-identical — and the same
    log-likelihood up to summation order (counts drive the M-step; ll
    only feeds the monotonicity trace)."""
    import math
    import random

    from crick_spark.pipeline.text import _estep_batch, _viterbi

    rng = random.Random(99)
    chars = list("abcdefgh")
    logp = {c: math.log(rng.uniform(0.01, 0.1)) for c in chars}
    for _ in range(80):
        p = "".join(rng.choice(chars) for _ in range(rng.randint(2, 6)))
        logp.setdefault(p, math.log(rng.uniform(0.001, 0.05)))
    words = [
        "".join(rng.choice(chars) for _ in range(rng.randint(1, 18)))
        for _ in range(800)
    ] + ["abab" * 3]  # repeated piece inside one word: counts multiply
    wfreqs = [rng.randint(1, 50) for _ in words]

    exp_counts: dict = {}
    exp_ll = 0.0
    for w, wf in zip(words, wfreqs):
        pieces, score = _viterbi(w, logp, 6)
        exp_ll += float(wf) * score
        for p in pieces:
            exp_counts[p] = exp_counts.get(p, 0) + int(wf)
    got_counts, got_ll = _estep_batch(words, wfreqs, logp, 6)
    assert got_counts == exp_counts
    assert abs(got_ll - exp_ll) <= 1e-9 * abs(exp_ll)
    assert _estep_batch([], [], logp, 6) == ({}, 0.0)


def test_ivf_bulk_matches_per_query_on_panel(spark):
    """Bulk IVF (one job) must return EXACTLY the per-query IVF path's
    top-k for every query on a 10-query panel — same centroids, same
    probe count, same rerank tie-break."""
    from crick_spark.pipeline.similarity import (
        ivf_ann_topk,
        ivf_bulk_topk,
        train_ivf_centroids,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    centroids = train_ivf_centroids(emb, k=16, n_iter=5)
    n_queries, k = 10, 10
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bulk = ivf_bulk_topk(queries, emb, centroids, k=k, nprobe=6).collect()
    by_q = {}
    for r in sorted(bulk, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id") < n_queries).collect()
    }
    for qid, qv in qvecs.items():
        per = [
            r["vec_id"]
            for r in ivf_ann_topk(emb, qv, centroids, k=k, nprobe=6).collect()
        ]
        assert by_q[qid] == per, f"query {qid}: bulk {by_q[qid]} != per {per}"


def test_quantized_bulk_matches_per_query_on_panel(spark):
    """Bulk quantized ANN (one corpus scan for the whole panel) must
    return EXACTLY the per-query quantized path's top-k — same
    quantization contract (HALF_UP both sides), same shortlist rule,
    same rerank tie-break."""
    from crick_spark.pipeline.similarity import (
        quantized_bulk_topk,
        quantized_cosine_topk,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    n_queries, k = 10, 10
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bulk = quantized_bulk_topk(queries, emb, k=k).collect()
    by_q = {}
    for r in sorted(bulk, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.where(F.col("vec_id") < n_queries).collect()
    }
    for qid, qv in qvecs.items():
        per = [
            r["vec_id"] for r in quantized_cosine_topk(emb, qv, k=k).collect()
        ]
        assert by_q[qid] == per, f"query {qid}: bulk {by_q[qid]} != per {per}"


def test_semantic_decontaminate_flags_eval_members(spark):
    """Every eval-panel member must flag itself (cosine 1.0 to itself);
    max_eval_cosine must match a numpy oracle on the full corpus."""
    from crick_spark.pipeline.similarity import semantic_decontaminate

    emb = load_table(spark, SF_SMALL, "embeddings")
    ev = emb.where(F.col("vec_id") < 5)
    out = semantic_decontaminate(emb, ev, threshold=0.8).toPandas()
    assert len(out) == emb.count()
    flagged = set(out[out["contaminated"]]["vec_id"])
    assert set(range(5)) <= flagged
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    evm = mn[ids < 5]
    expect = (mn @ evm.T).max(axis=1)
    got = out.set_index("vec_id").loc[ids]["max_eval_cosine"].to_numpy()
    assert np.allclose(got, np.round(expect, 6), atol=2e-6)


def test_pca_projection_properties(spark):
    """PCA invariants: var of each PC score column equals its eigenvalue,
    components orthonormal, projection centered, and the whole pipeline
    is partition-count invariant (deterministic sorted driver fold)."""
    import numpy as np
    import pandas as pd

    from crick_spark.pipeline.similarity import (
        covariance_stats,
        pca_components,
        pca_project,
    )

    rng = np.random.default_rng(17)
    # anisotropic gaussian so eigenvalues are distinct and ordered
    scales = np.array([5.0, 3.0, 1.0, 0.5, 0.25, 0.1])
    X = rng.normal(size=(800, 6)) * scales
    pdf = pd.DataFrame(
        {"vec_id": range(800), "embedding": [list(map(float, r)) for r in X]}
    )
    df = spark.createDataFrame(pdf).repartition(5)

    n, mean, cov = covariance_stats(df, "embedding")
    assert n == 800
    np.testing.assert_allclose(mean, X.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(X.T, ddof=1), atol=1e-9)

    m2, comps, vals, ratio = pca_components(df, "embedding", k=3)
    assert np.all(np.diff(vals) <= 1e-12)
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-9)

    proj = pca_project(df, m2, comps, "vec_id", "embedding").toPandas()
    P = np.stack(proj["pc"].to_numpy())
    # projected scores: centered, per-component variance = eigenvalue
    np.testing.assert_allclose(P.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(P.var(axis=0, ddof=1), vals, rtol=1e-9)

    # partition-count invariance of the distributed covariance
    _, _, cov7 = covariance_stats(df.repartition(7), "embedding")
    np.testing.assert_allclose(cov7, cov, atol=1e-9)


def test_connected_components_known_graph(spark):
    """CC on a known multi-component graph (chain, triangle+pendant,
    isolated pair): labels converge to each component's min id, and the
    superstep count tracks the diameter (a 5-node chain needs more than
    one step but converges well under the bound)."""
    import pandas as pd

    from crick_spark.pipeline.graph import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                # chain 1-2-3-4-5, triangle 10-11-12 with pendant 13, pair 20-21
                "src": [1, 2, 3, 4, 10, 11, 12, 12, 20],
                "dst": [2, 3, 4, 5, 11, 12, 10, 13, 21],
            }
        )
    ).repartition(3)
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, "src", "dst").collect()
    }
    expect = (
        {(n, 1) for n in (1, 2, 3, 4, 5)}
        | {(n, 10) for n in (10, 11, 12, 13)}
        | {(n, 20) for n in (20, 21)}
    )
    assert got == expect


def test_connected_components_nonconvergence_raises(spark):
    import pandas as pd
    import pytest as _pytest

    from crick_spark.pipeline.graph import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3, 4], "dst": [2, 3, 4, 5]})
    )
    # the runaway bound is a property of the DISTRIBUTED loop — force
    # it (r14: small edge sets close driver-side and always converge)
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            edges, "src", "dst", max_iter=1, driver_close_max_edges=0
        )
    # the driver fast path converges on the same input and matches
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {(i, 1) for i in range(1, 6)}


def test_pq_pipeline_properties(spark):
    """PQ invariants: codebooks deterministic across calls, encode
    assigns the true nearest subspace centroid (checked vs numpy), and
    the ADC+rerank path recovers the exact top-10 on a clustered corpus
    (rerank pool covers; recall gate asserts >=0.8 in the registry)."""
    import numpy as np
    import pandas as pd

    from crick_spark.pipeline.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
        cosine_topk,
    )

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(6, 32)) * 3
    X = np.vstack([c + rng.normal(size=(80, 32)) * 0.4 for c in centers])
    pdf = pd.DataFrame(
        {"vec_id": range(len(X)), "embedding": [list(map(float, r)) for r in X]}
    )
    df = spark.createDataFrame(pdf).repartition(4)

    b1 = train_pq_codebooks(df, m=4, ksub=8, sample_rows=400)
    b2 = train_pq_codebooks(df, m=4, ksub=8, sample_rows=400)
    np.testing.assert_array_equal(b1, b2)

    coded = pq_encode(df, b1).toPandas().sort_values("vec_id")
    C = np.stack(coded["codes"].to_numpy())
    dsub = 32 // 4
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)  # impl is cosine-PQ
    for j in range(4):
        S = Xn[:, j * dsub : (j + 1) * dsub]
        d2 = ((S[:, None, :] - b1[j][None, :, :]) ** 2).sum(-1)
        np.testing.assert_array_equal(C[:, j], d2.argmin(1))

    q = list(map(float, X[0]))
    got = {
        r["vec_id"]
        for r in pq_topk(
            df, q, k=10, m=4, ksub=8, rerank_factor=8, codebooks=b1
        ).collect()
    }
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}
    assert len(got & exact) >= 8


def test_salted_pair_join_identical_to_unsalted(spark):
    """Hot-term salting in tfidf_similar_pairs is results-preserving:
    with a threshold low enough that MANY terms salt (and replicate the
    right side), the pair set and every cosine are byte-identical to the
    unsalted join on a corpus with a deliberately hot shared sentence."""
    import pandas as pd

    from crick_spark.pipeline.retrieval import tfidf_similar_pairs

    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(60):
        body = f"unique text body number {i} with filler tokens t{i} u{i}"
        # 2/3 of docs share the hot sentence -> its 3-grams have df ~ 40
        text = body + " " + hot if i % 3 else body
        rows.append((i, text, "en" if i % 2 else "fr"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    kw = dict(threshold=0.005, ngram=3, block_col="lang")
    unsalted = tfidf_similar_pairs(docs, salt_df_threshold=0, **kw)
    salted = tfidf_similar_pairs(docs, salt_df_threshold=5, **kw)
    u = sorted(map(tuple, unsalted.collect()))
    s = sorted(map(tuple, salted.collect()))
    assert len(u) > 0  # the hot sentence must actually produce pairs
    assert u == s


def test_repeated_window_spans_semantics(spark):
    """Rolling-window repeat detection: a 10-word passage shared across
    docs is found at its exact positions; within-doc self-repetition
    yields TWO maximal spans when separated by a non-duplicated word;
    docs shorter than the window or with unique text report zero."""
    import pandas as pd

    from crick_spark.pipeline.dedup import (
        repeated_window_spans,
        repeated_window_stats,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"{shared} unique tail one two three"),
        (2, f"prefix words here {shared} and a different suffix"),
        (3, "totally unrelated text with enough words to have windows yes"),
        (4, "short doc"),
        (5, f"xx {shared} yy {shared} zz"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in repeated_window_spans(docs, window_words=10).collect()
    }
    assert spans == {(1, 1, 10), (2, 4, 13), (5, 2, 11), (5, 13, 22)}
    stats = {
        r.doc_id: (r.n_dup_spans, r.dup_words, r.keep)
        for r in repeated_window_stats(docs, window_words=10).collect()
    }
    assert stats[5] == (2, 20, False)
    assert stats[3] == (0, 0, True) and stats[4] == (0, 0, True)


def test_ivf_layout_prunes_partitions_and_matches_memory(spark, tmp_path):
    """The write-time IVF layout: cluster-partitioned corpus + probe-set
    isin predicate must (a) return byte-identical results to the
    in-memory ivf_bulk_topk and (b) reach the parquet scan as a
    PartitionFilter on ivf_cluster — unprobed clusters' files are never
    opened, the inverted file IS the directory layout."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivf_bulk_topk_from_layout,
        train_ivf_centroids,
        write_ivf_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, k=8)
    panel = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    write_ivf_layout(emb, cents, str(tmp_path / "layout"))
    mem = ivf_bulk_topk(panel, emb, cents, k=5, nprobe=2)
    lay = ivf_bulk_topk_from_layout(
        spark, panel, str(tmp_path / "layout"), cents, k=5, nprobe=2
    )
    assert sorted(map(tuple, mem.collect())) == sorted(
        map(tuple, lay.collect())
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        lay.explain("formatted")
    assert "PartitionFilters: [ivf_cluster" in buf.getvalue()


def test_ivf_layout_append_incremental(spark, tmp_path):
    """ivf_layout_append (r9): folding micro-batches into a resident
    IVF layout must (a) never touch resident files (size+mtime
    byte-identity), (b) add exactly ONE file per touched cluster per
    fold (the scale write shape), (c) leave layout queries equal to a
    from-scratch build over the union corpus, and (d) report the
    drift-signal stats."""
    import glob
    import os

    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivf_bulk_topk_from_layout,
        ivf_layout_append,
        train_ivf_centroids,
        write_ivf_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, k=8)
    path = str(tmp_path / "layout")
    write_ivf_layout(emb.where(F.col("vec_id") % 2 == 0), cents, path)

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{path}/ivf_cluster=*/*.parquet")
        }

    before = snap()
    stats = ivf_layout_append(
        emb.where(F.col("vec_id") % 2 == 1), cents, path
    )
    after = snap()
    # (a) resident files byte-identical
    assert all(after.get(p) == v for p, v in before.items())
    # (b) one new file per touched cluster
    new_files = [p for p in after if p not in before]
    per_cluster: dict = {}
    for p in new_files:
        c = int(p.split("ivf_cluster=")[1].split(os.sep)[0])
        per_cluster[c] = per_cluster.get(c, 0) + 1
    assert set(per_cluster) == set(stats["clusters_touched"])
    assert all(v == 1 for v in per_cluster.values()), per_cluster
    # (d) stats shape
    assert stats["rows"] == emb.where(F.col("vec_id") % 2 == 1).count()
    assert 0.0 < stats["mean_top_cosine"] <= 1.0
    # (c) query equivalence vs from-scratch build on the union
    panel = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mem = ivf_bulk_topk(panel, emb, cents, k=5, nprobe=2)
    lay = ivf_bulk_topk_from_layout(spark, panel, path, cents, k=5, nprobe=2)
    assert sorted(map(tuple, mem.collect())) == sorted(
        map(tuple, lay.collect())
    )
    # total rows conserved across the two writes
    assert spark.read.parquet(path).count() == emb.count()


def test_ivfpq_layout_append_with_codes(spark, tmp_path):
    """ivf_layout_append(codebooks=...) maintains the FULL IVF-PQ
    layout: appended files are schema-identical to the resident ones
    (codes included), and the layout read path over build+append
    equals the in-memory IVF-PQ over the union corpus exactly."""
    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_layout_append,
        ivfpq_bulk_topk,
        ivfpq_bulk_topk_from_layout,
        train_ivf_centroids,
        train_pq_codebooks,
        write_ivfpq_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, k=8)
    books = train_pq_codebooks(emb, m=16, ksub=16)
    path = str(tmp_path / "pqlayout")
    write_ivfpq_layout(emb.where(F.col("vec_id") % 2 == 0), cents, books, path)
    stats = ivf_layout_append(
        emb.where(F.col("vec_id") % 2 == 1), cents, path, codebooks=books
    )
    assert stats["rows"] > 0
    assert "codes" in spark.read.parquet(path).columns
    panel = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mem = ivfpq_bulk_topk(panel, emb, cents, books, k=5, nprobe=2)
    lay = ivfpq_bulk_topk_from_layout(
        spark, panel, path, cents, books, k=5, nprobe=2
    )
    assert sorted(map(tuple, mem.collect())) == sorted(
        map(tuple, lay.collect())
    )
    assert spark.read.parquet(path).count() == emb.count()


def test_ivfpq_layout_matches_memory_and_prunes_columns(spark, tmp_path):
    """write_ivfpq_layout + ivfpq_bulk_topk_from_layout (r9): the
    layout path must return byte-identical results to the in-memory
    IVF-PQ (shared assignment/code/LUT kernels), carry a
    PartitionFilter on the probe set, and — the layout's point — scan
    codes WITHOUT the embedding column for ADC (ReadSchema-pinned:
    full vectors stay on disk until the rerank pool)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivfpq_bulk_topk,
        ivfpq_bulk_topk_from_layout,
        train_ivf_centroids,
        train_pq_codebooks,
        write_ivfpq_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, k=8)
    books = train_pq_codebooks(emb, m=16, ksub=16)
    panel = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "pqlayout")
    write_ivfpq_layout(emb, cents, books, path)
    mem = ivfpq_bulk_topk(panel, emb, cents, books, k=5, nprobe=2)
    lay = ivfpq_bulk_topk_from_layout(
        spark, panel, path, cents, books, k=5, nprobe=2
    )
    assert sorted(map(tuple, mem.collect())) == sorted(
        map(tuple, lay.collect())
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        lay.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [ivf_cluster" in plan
    assert any(
        "ReadSchema:" in ln and "codes" in ln and "embedding" not in ln
        for ln in plan.splitlines()
    ), "ADC scan reads the embedding column - column pruning regressed"
    # third lever: pool ids push onto the VECTOR scan (write-time
    # sortWithinPartitions(id) makes the In(...) a row-group skip)
    assert any(
        "PushedFilters:" in ln and "In(vec_id" in ln
        for ln in plan.splitlines()
    ), "pool ids no longer push down to the rerank vector scan"


def test_ivf_layout_small_probe_set_in_rendering(spark, tmp_path):
    """r8 ADVICE fix: a probe set at/under
    spark.sql.optimizer.inSetConversionThreshold (10) renders as
    'IN (…)' not 'INSET' — pruning verification must count the ACTUAL
    probe list (return_probed=True), never parse the plan text.  One
    query × nprobe=1 guarantees the small-set rendering; the filter
    must still reach the scan as a PartitionFilter and the probed count
    must be strictly under the cluster total."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk_from_layout,
        train_ivf_centroids,
        write_ivf_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, k=8)
    panel = emb.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    write_ivf_layout(emb, cents, str(tmp_path / "layout"))
    lay, probed = ivf_bulk_topk_from_layout(
        spark,
        panel,
        str(tmp_path / "layout"),
        cents,
        k=5,
        nprobe=1,
        return_probed=True,
    )
    assert len(probed) == 1  # the small-set case the regex used to miss
    n_total = (
        spark.read.parquet(str(tmp_path / "layout"))
        .select("ivf_cluster")
        .distinct()
        .count()
    )
    assert len(probed) < n_total
    buf = io.StringIO()
    with redirect_stdout(buf):
        lay.explain("formatted")
    plan = buf.getvalue()
    # single-cluster probes render as a plain equality, not INSET/IN —
    # the pruning check must not depend on any particular rendering
    assert any(
        "PartitionFilters:" in ln and "ivf_cluster" in ln
        for ln in plan.splitlines()
    )
    assert "INSET" not in plan  # this size class never renders INSET
    assert lay.count() > 0


def test_remove_repeated_spans_keeps_one_copy(spark):
    """Apply step of repeated-substring dedup: with keep_first=True the
    corpus-wide FIRST occurrence of each repeated passage survives and
    every other occurrence is cut; with keep_first=False all occurrences
    go.  Unaffected docs pass through with text intact."""
    import pandas as pd

    from crick_spark.pipeline.dedup import (
        remove_repeated_spans,
        repeated_window_spans,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"{shared} unique tail one two three"),
        (2, f"prefix words here {shared} and a different suffix"),
        (3, "totally unrelated text with enough words to stay intact"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    spans = repeated_window_spans(docs, window_words=10)
    cleaned = {
        r.doc_id: (r.text, r.n_words_removed)
        for r in remove_repeated_spans(docs, spans).collect()
    }
    # doc 1 holds the first occurrence (smallest (doc_id, start)) — kept
    assert cleaned[1] == (rows[0][1], 0)
    # doc 2's occurrence is cut, surrounding words survive
    assert cleaned[2] == ("prefix words here and a different suffix", 10)
    assert cleaned[3] == (rows[2][1], 0)

    all_cut = {
        r.doc_id: r.n_words_removed
        for r in remove_repeated_spans(docs, spans, keep_first=False).collect()
    }
    assert all_cut[1] == 10 and all_cut[2] == 10 and all_cut[3] == 0


def test_kneser_ney_scores_match_reference(spark):
    """The KN scorer must equal a from-scratch python implementation of
    interpolated Kneser-Ney on a small corpus (both formula branches:
    c12 > 1 bigrams and the continuation-dominated c12 = 1 tail)."""
    import math
    from collections import Counter

    import pandas as pd

    from crick_spark.pipeline.text import kneser_ney_bigram_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog walked"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in kneser_ney_bigram_scores(docs, discount=0.75).collect()
    }

    bgs = []
    for _, text in rows:
        ws = text.split()
        bgs += list(zip(ws, ws[1:]))
    c12 = Counter(bgs)
    c1 = Counter(w1 for w1, _ in bgs)
    n_cont = Counter(w1 for w1, _ in set(c12))
    n_left = Counter(w2 for _, w2 in set(c12))
    n_types = len(c12)
    D = 0.75

    def logp(w1, w2):
        return math.log(
            max(c12[(w1, w2)] - D, 0.0) / c1[w1]
            + D * n_cont[w1] / c1[w1] * (n_left[w2] / n_types)
        )

    for doc_id, text in rows:
        ws = text.split()
        ref = [logp(a, b) for a, b in zip(ws, ws[1:])]
        n, avg = got[doc_id]
        assert n == len(ref)
        assert abs(avg - round(sum(ref) / len(ref), 6)) < 1e-9


def test_dsir_weights_match_reference(spark):
    """dsir_log_ratios must equal a from-scratch add-1 unigram
    importance weight on a corpus with a clear in-domain/out-domain
    split, and dsir_resample must select exactly the Gumbel-top-k set
    under the md5 coin."""
    import hashlib
    import math
    from collections import Counter

    import pandas as pd

    from crick_spark.pipeline.sampling import dsir_log_ratios, dsir_resample

    rows = [
        (1, "physics energy quantum field theory", "sci"),
        (2, "quantum field equations and energy states", "sci"),
        (3, "cheap pills buy now click here", "spam"),
        (4, "click here for cheap deals now", "spam"),
        (5, "energy states of the quantum field", "sci"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "kind"])
    )
    target = docs.where("kind = 'sci'")
    got = {
        r.doc_id: (r.n_tokens, r.log_ratio)
        for r in dsir_log_ratios(docs, target).collect()
    }

    src = Counter(t for _, text, _ in rows for t in text.split())
    tgt = Counter(
        t for _, text, k in rows if k == "sci" for t in text.split()
    )
    vocab = set(src) | set(tgt)
    ts, tt, v = sum(src.values()), sum(tgt.values()), len(vocab)

    def lr(tok):
        return math.log((tgt[tok] + 1) / (tt + v)) - math.log(
            (src[tok] + 1) / (ts + v)
        )

    for doc_id, text, _ in rows:
        toks = text.split()
        assert got[doc_id][0] == len(toks)
        assert abs(got[doc_id][1] - round(sum(map(lr, toks)), 6)) < 1e-9
    # in-domain docs must outscore spam
    assert min(got[d][1] for d in (1, 2, 5)) > max(got[d][1] for d in (3, 4))

    def gumbel(doc_id):
        bits = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16)
        u = (bits + 0.5) / (1 << 24)
        return -math.log(-math.log(u))

    want = sorted(
        rows, key=lambda r: (-(got[r[0]][1] + gumbel(r[0])), r[0])
    )[:3]
    sel = {r.doc_id for r in dsir_resample(docs, target, k=3).collect()}
    assert sel == {r[0] for r in want}


def test_dsir_hashed_features_match_reference_and_overlap(spark):
    """r8 hashed-feature DSIR: (a) with n_buckets the log-ratios equal a
    from-scratch hashed-unigram reference (tokens -> md5[0:8] mod B,
    smoothing over the FULL fixed bucket support V=B), so the model
    tables are O(B) at any corpus size; (b) with generous buckets the
    selected set overlaps the raw-token selection heavily on the
    fixture corpus (collisions only blur the models — quality degrades
    gracefully, it doesn't cliff); (c) tiny bucket counts still return
    exactly k rows deterministically."""
    import hashlib
    import math
    from collections import Counter

    import pandas as pd

    from crick_spark.pipeline.sampling import dsir_log_ratios, dsir_resample

    rows = [
        (1, "physics energy quantum field theory", "sci"),
        (2, "quantum field equations and energy states", "sci"),
        (3, "cheap pills buy now click here", "spam"),
        (4, "click here for cheap deals now", "spam"),
        (5, "energy states of the quantum field", "sci"),
        (6, "buy cheap energy pills here now", "spam"),
        (7, "field theory of quantum energy", "sci"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "kind"])
    )
    target = docs.where("kind = 'sci'")
    B = 64

    def feat(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    got = {
        r.doc_id: (r.n_tokens, r.log_ratio)
        for r in dsir_log_ratios(docs, target, n_buckets=B).collect()
    }
    src = Counter(feat(t) for _, text, _ in rows for t in text.split())
    tgt = Counter(
        feat(t) for _, text, k in rows if k == "sci" for t in text.split()
    )
    ts, tt = sum(src.values()), sum(tgt.values())

    def lr(b):
        return math.log((tgt[b] + 1) / (tt + B)) - math.log(
            (src[b] + 1) / (ts + B)
        )

    for doc_id, text, _ in rows:
        toks = text.split()
        assert got[doc_id][0] == len(toks)
        want = round(sum(lr(feat(t)) for t in toks), 6)
        assert abs(got[doc_id][1] - want) < 1e-9, (doc_id, got[doc_id], want)

    # (b) selection overlap vs raw-token DSIR with collision-free buckets
    k = 4
    raw_sel = {r.doc_id for r in dsir_resample(docs, target, k=k).collect()}
    hashed_sel = {
        r.doc_id
        for r in dsir_resample(
            docs, target, k=k, n_buckets=1 << 16
        ).collect()
    }
    assert len(raw_sel & hashed_sel) >= k - 1, (raw_sel, hashed_sel)

    # (c) tiny table still selects exactly k rows, deterministically
    tiny1 = sorted(
        r.doc_id
        for r in dsir_resample(docs, target, k=k, n_buckets=8).collect()
    )
    tiny2 = sorted(
        r.doc_id
        for r in dsir_resample(docs, target, k=k, n_buckets=8).collect()
    )
    assert tiny1 == tiny2 and len(tiny1) == k


def test_bpe_encode_equals_sequential_replay(spark):
    """Rank-priority BPE encoding (merge the lowest-rank adjacent pair
    until none applies) must equal the canonical sequential replay of
    the learned merge list (for each merge in training order, merge all
    its adjacent occurrences left-to-right), word by word, and the
    token concatenation must rebuild every word."""
    import pandas as pd

    from crick_spark.pipeline.text import bpe_encode, bpe_train

    rows = [
        (1, "the theme of the thesis is these themes"),
        (2, "lower lowest newer newest wider widest"),
        (3, "a bb ccc dddd"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    merges = bpe_train(docs, n_merges=10)

    def sequential(word):
        syms = list(word)
        for l, r, _ in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == l and syms[i + 1] == r:
                    syms[i : i + 2] = [l + r]
                else:
                    i += 1
        return syms

    got = {r.doc_id: r.tokens for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in rows:
        want = [t for w in text.lower().split() for t in sequential(w)]
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
        assert "".join(got[doc_id]) == text.lower().replace(" ", "")


def test_remove_repeated_spans_lead_window_family(spark):
    """r8 family-contract edge case (the ADVICE finding): occurrences of
    one repeated passage absorbed into maximal spans of DIFFERENT
    extents (back-to-back self-repeat merges into one long span) still
    share their LEADING window, so they are ONE family — exactly one
    occurrence (smallest (doc_id, start)) survives corpus-wide."""
    import pandas as pd

    from crick_spark.pipeline.dedup import (
        remove_repeated_spans,
        repeated_window_spans,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, f"{shared} unique tail one two three"),
        # back-to-back repeat: one maximal span of 20 words whose lead
        # window is the same passage
        (2, f"{shared} {shared}"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    spans = repeated_window_spans(docs, window_words=10)
    got = {
        (r.doc_id, r.span_start, r.span_end): r.lead_wh for r in spans.collect()
    }
    assert set(got) == {(1, 1, 10), (2, 1, 20)}
    # different extents, same lead window hash -> one family
    assert got[(1, 1, 10)] == got[(2, 1, 20)]
    cleaned = {
        r.doc_id: (r.text, r.n_words_removed)
        for r in remove_repeated_spans(docs, spans).collect()
    }
    assert cleaned[1] == (rows[0][1], 0)  # first occurrence survives
    assert cleaned[2] == ("", 20)  # the longer absorbed span is cut whole


def test_nb_classifier_matches_reference_and_separates(spark):
    """Multinomial NB (r8): (a) log posteriors equal a from-scratch
    add-1 NB reference on a corpus with separable classes; (b) the
    argmax recovers the true class on held-out docs drawn from the same
    token distributions; (c) the n_buckets hashed-feature variant stays
    self-consistent (same winner on collision-free buckets)."""
    import math
    from collections import Counter

    import pandas as pd

    from crick_spark.pipeline.classify import nb_score, nb_train

    train_rows = [
        (0, "physics energy quantum field theory", "sci"),
        (2, "quantum field equations and energy states", "sci"),
        (4, "energy states of the quantum field theory", "sci"),
        (6, "cheap pills buy now click here", "spam"),
        (8, "click here for cheap deals now", "spam"),
    ]
    held_rows = [
        (1, "quantum theory of the energy field", "sci"),
        (3, "buy cheap pills here now", "spam"),
    ]
    train = spark.createDataFrame(
        pd.DataFrame(train_rows, columns=["doc_id", "text", "kind"])
    )
    held = spark.createDataFrame(
        pd.DataFrame(held_rows, columns=["doc_id", "text", "kind"])
    )
    lik, stats = nb_train(train, label_col="kind")
    got = {
        r.doc_id: (r.predicted, r.log_posterior)
        for r in nb_score(held, lik, stats).collect()
    }

    cnt: dict = {}
    docs_per = Counter()
    for _, text, k in train_rows:
        docs_per[k] += 1
        for t in text.split():
            cnt.setdefault(k, Counter())[t] += 1
    vocab = {t for c in cnt.values() for t in c}
    v = float(len(vocab))
    n_all = sum(docs_per.values())

    def score(text, k):
        t_c = sum(cnt[k].values())
        s = math.log(docs_per[k] / n_all)
        for t in text.split():
            s += math.log((cnt[k].get(t, 0) + 1) / (t_c + v))
        return s

    for doc_id, text, true_k in held_rows:
        want = {k: score(text, k) for k in cnt}
        best = max(want, key=lambda k: (want[k], k))
        assert got[doc_id][0] == best == true_k
        assert abs(got[doc_id][1] - round(want[best], 6)) < 1e-9

    # hashed features, collision-free bucket count: same winners
    B = 1 << 16
    lik_h, stats_h = nb_train(train, label_col="kind", n_buckets=B)
    got_h = {
        r.doc_id: r.predicted
        for r in nb_score(held, lik_h, stats_h, n_buckets=B).collect()
    }
    assert got_h == {d: k for d, (k, _) in got.items()}


def test_unigram_encode_optimal_lossless_and_oov(spark):
    """Unigram ENCODE (r8): (a) each word's segmentation is the
    maximum-likelihood one (checked against brute-force enumeration of
    ALL segmentations on short words); (b) token concatenation rebuilds
    every word (lossless); (c) characters outside the trained vocab
    fall back to single-char pieces instead of failing."""
    import itertools
    import math

    import pandas as pd

    from crick_spark.pipeline.text import unigram_encode

    model = [
        ("ab", math.log(0.30)),
        ("abc", math.log(0.25)),
        ("c", math.log(0.15)),
        ("a", math.log(0.12)),
        ("b", math.log(0.10)),
        ("d", math.log(0.08)),
    ]
    logp = dict(model)
    rows = [(1, "abc abcd ab"), (2, "abab"), (3, "xa")]  # x is OOV
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    got = {
        r.doc_id: list(r.tokens) for r in unigram_encode(docs, model).collect()
    }

    def all_segs(word):
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pieces, start = [], 0
            for i, c in enumerate(cuts, 1):
                if c:
                    pieces.append(word[start:i])
                    start = i
            pieces.append(word[start:])
            yield pieces

    def best_score(word):
        scores = [
            sum(logp[p] for p in seg)
            for seg in all_segs(word)
            if all(p in logp for p in seg)
        ]
        return max(scores) if scores else None

    # (a)+(b) per word of docs 1-2
    for doc_id, text in rows[:2]:
        toks, out = text.split(), got[doc_id]
        rebuilt, i = [], 0
        for w in toks:
            acc = []
            while "".join(acc) != w:
                acc.append(out[i]); i += 1
            rebuilt.append("".join(acc))
            ws = best_score(w)
            assert abs(sum(logp[p] for p in acc) - ws) < 1e-12, (w, acc)
        assert rebuilt == toks and i == len(out)
    # (c) OOV char: lossless single-char fallback
    assert "".join(got[3]) == "xa" and "x" in got[3]


def test_ivfpq_equals_ivf_when_pool_unbounded(spark):
    """IVF-PQ sanity (r8): PQ only REORDERS the candidate shortlist —
    with an unbounded rerank pool (rerank_factor*k >= every candidate in
    the probed clusters) the exact rerank sees the identical candidate
    set as plain IVF, so the results must be byte-identical.  Recall
    loss in production settings can therefore come only from the
    ADC-ranked pool cutoff, which the registered gate measures."""
    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivfpq_bulk_topk,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(emb, k=8)
    books = train_pq_codebooks(emb, m=16, ksub=16)
    ivf = ivf_bulk_topk(queries, emb, cents, k=5, nprobe=2)
    ivfpq = ivfpq_bulk_topk(
        queries, emb, cents, books, k=5, nprobe=2, rerank_factor=10_000
    )
    a = sorted(map(tuple, ivf.collect()))
    b = sorted(map(tuple, ivfpq.collect()))
    assert a == b and len(a) > 0


def test_ivfpq_residual_mode(spark):
    """FAISS by_residual (r9): codes quantize x_norm − c(x).  Three
    invariants: (a) residual training/encoding is deterministic,
    (b) residual codes genuinely differ from plain codes (the mode is
    wired through, not ignored), (c) with an unbounded rerank pool the
    residual path equals plain IVF byte-for-byte — the ADC decomposition
    q·c + q·r̃ only REORDERS the shortlist, exact rerank fixes the rest."""
    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivfpq_bulk_topk,
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("bigint").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(emb, k=8)
    books1 = train_pq_codebooks(emb, m=16, ksub=16, centroids=cents)
    books2 = train_pq_codebooks(emb, m=16, ksub=16, centroids=cents)
    assert (books1 == books2).all()

    plain = train_pq_codebooks(emb, m=16, ksub=16)
    codes_res = (
        pq_encode(emb, books1, centroids=cents)
        .toPandas()
        .set_index("vec_id")["codes"]
    )
    codes_plain = (
        pq_encode(emb, plain).toPandas().set_index("vec_id")["codes"]
    )
    assert any(
        tuple(codes_res[i]) != tuple(codes_plain[i]) for i in codes_res.index
    )

    ivf = ivf_bulk_topk(queries, emb, cents, k=5, nprobe=2)
    ivfpq = ivfpq_bulk_topk(
        queries, emb, cents, books1, k=5, nprobe=2,
        rerank_factor=10_000, by_residual=True,
    )
    a = sorted(map(tuple, ivf.collect()))
    b = sorted(map(tuple, ivfpq.collect()))
    assert a == b and len(a) > 0


def test_contaminated_window_spans_cross_corpus(spark):
    """Span-level decontamination (r8): a train doc sharing a >=10-word
    passage with the eval corpus loses exactly that passage (maximal
    span, 1-based positions); self-repeats WITHIN train that never
    appear in eval are untouched (the cross-corpus semantics that
    differ from repeated_window_spans)."""
    import pandas as pd

    from crick_spark.pipeline.dedup import (
        contaminated_window_spans,
        remove_repeated_spans,
    )

    bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    selfrep = "one two three four five six seven eight nine ten"
    train_rows = [
        (1, f"intro words here {bench} closing remarks"),
        # self-repeated passage, absent from eval: must survive
        (2, f"{selfrep} {selfrep}"),
        (3, "completely clean document with enough words to stand alone"),
    ]
    eval_rows = [(100, f"benchmark prompt {bench} benchmark answer")]
    train = spark.createDataFrame(
        pd.DataFrame(train_rows, columns=["doc_id", "text"])
    )
    evald = spark.createDataFrame(
        pd.DataFrame(eval_rows, columns=["doc_id", "text"])
    )
    spans = contaminated_window_spans(train, evald, window_words=10)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    assert got == {(1, 4, 13)}  # the benchmark passage, nothing else
    # decontamination cuts EVERY contaminated occurrence: keep_first=False
    cleaned = {
        r.doc_id: (r.text, r.n_words_removed)
        for r in remove_repeated_spans(
            train, spans, keep_first=False
        ).collect()
    }
    assert cleaned[1] == ("intro words here closing remarks", 10)
    assert cleaned[2] == (train_rows[1][1], 0)
    assert cleaned[3] == (train_rows[2][1], 0)


def test_real_wav_codec_roundtrip_and_chunk_walk():
    """r11 (VERDICT #4): the pure-Python RIFF/WAVE PCM codec parses real
    bytes exactly — 16-bit roundtrips the encoder, stereo interleaves,
    8-bit recenters to signed, unknown/odd-sized chunks before ``data``
    walk correctly, and non-PCM / truncated / foreign bytes all raise."""
    import numpy as np
    import pytest

    from crick_spark.pipeline.multimodal import (
        decode_wav,
        encode_wav,
        real_audio_decoder,
        wav_info,
    )

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, size=200, dtype=np.int64)
    blob = encode_wav(s, 8000)
    assert len(blob) == 44 + 400
    assert wav_info(blob) == (8000, 1, 16, 200)
    assert np.array_equal(decode_wav(blob), s)
    assert np.array_equal(real_audio_decoder(blob, "audio"), s)

    # stereo: interleaved stream survives byte-exact
    st = encode_wav(s, 44100, n_channels=2)
    assert wav_info(st) == (44100, 2, 16, 200)
    assert np.array_equal(decode_wav(st), s)
    with pytest.raises(ValueError, match="multiple"):
        encode_wav(s[:3], 44100, n_channels=2)

    # an unknown odd-sized chunk between fmt and data: spec pads to even
    hdr, payload = blob[:36], blob[36:]
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    walked = (
        b"RIFF"
        + (len(blob) - 8 + len(junk)).to_bytes(4, "little")
        + blob[8:36]
        + junk
        + payload
    )
    assert wav_info(walked) == (8000, 1, 16, 200)
    assert np.array_equal(decode_wav(walked), s)

    # 8-bit PCM is unsigned per spec → recentered to signed
    eight = bytearray(encode_wav(np.zeros(4), 8000))
    eight[34:36] = (8).to_bytes(2, "little")          # bits per sample
    eight[40:44] = (4).to_bytes(4, "little")          # data size: 4 bytes
    wav8 = bytes(eight[:44]) + bytes([0, 128, 255, 130])
    assert wav_info(wav8) == (8000, 1, 8, 4)
    assert decode_wav(wav8).tolist() == [-128, 0, 127, 2]

    # loud failures: non-PCM format tag, truncated payload, foreign bytes
    bad = bytearray(blob)
    bad[20:22] = (3).to_bytes(2, "little")  # IEEE float format
    with pytest.raises(ValueError, match="PCM"):
        wav_info(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        wav_info(blob[:100])
    with pytest.raises(ValueError, match="RIFF"):
        wav_info(b"ID3 not a wav")
    with pytest.raises(NotImplementedError):
        real_audio_decoder(blob, "image")


def test_ivf_layout_append_schema_fence(spark, tmp_path):
    """r10 ADVICE: ivf_layout_append must refuse to create a
    mixed-schema layout directory — codes passed against a plain IVF
    layout, codes omitted on an IVF-PQ layout, or a missing resident
    layout all raise instead of silently writing files a plain
    (no-mergeSchema) read would misparse."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from crick_spark.pipeline.similarity import (
        ivf_layout_append,
        train_ivf_centroids,
        train_pq_codebooks,
        write_ivf_layout,
        write_ivfpq_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    even = emb.where(F.col("vec_id") % 2 == 0)
    odd = emb.where(F.col("vec_id") % 2 == 1)
    cents = train_ivf_centroids(even, k=4)
    cbs = train_pq_codebooks(even, m=4, ksub=16)

    plain = str(tmp_path / "plain")
    write_ivf_layout(even, cents, plain)
    with pytest.raises(ValueError, match="does not match"):
        ivf_layout_append(odd, cents, plain, codebooks=cbs)

    pq_path = str(tmp_path / "pq")
    write_ivfpq_layout(even, cents, cbs, pq_path)
    with pytest.raises(ValueError, match="does not match"):
        ivf_layout_append(odd, cents, pq_path)  # codes omitted

    with pytest.raises(ValueError, match="existing layout"):
        ivf_layout_append(odd, cents, str(tmp_path / "nowhere"))

    # a CORRUPT resident layout is a different problem and must surface
    # as itself, not masquerade as "missing layout" (r10 ADVICE): an
    # unreadable footer raises the underlying Spark error
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"PAR1 this is not parquet")
    with pytest.raises(Exception) as ei:
        ivf_layout_append(odd, cents, str(corrupt))
    assert not isinstance(ei.value, ValueError)

    # matching schemas still append (both layouts)
    assert ivf_layout_append(odd, cents, plain)["rows"] > 0
    assert ivf_layout_append(odd, cents, pq_path, codebooks=cbs)["rows"] > 0


def test_real_image_decoders_roundtrip_and_formats():
    """r10 (VERDICT #6): the pure-Python Netpbm/BMP decoders parse real
    bytes exactly — P6 roundtrips the encoder, ASCII P3/P2 and binary P5
    parse with comments/whitespace, BMP undoes bottom-up BGR row padding."""
    import numpy as np
    import pytest

    from crick_spark.pipeline.multimodal import (
        decode_bmp,
        decode_pnm,
        encode_ppm,
        real_image_decoder,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=8 * 4 * 3, dtype=np.int64)
    blob = encode_ppm(px, 8, 4)
    assert blob[:11] == b"P6\n8 4\n255\n" and len(blob) == 11 + 96
    assert np.array_equal(real_image_decoder(blob, "image"), px)

    # header comments + arbitrary whitespace (Netpbm spec)
    commented = b"P6 # cmt\n# another\n 8\t4 # dims\n255\n" + bytes(
        px.astype(np.uint8)
    )
    assert np.array_equal(decode_pnm(commented), px)

    # ASCII P3 and grayscale P2/P5
    p3 = ("P3\n2 1\n255\n" + " ".join("1 2 3 4 5 6".split())).encode()
    assert decode_pnm(p3).tolist() == [1, 2, 3, 4, 5, 6]
    assert decode_pnm(b"P2\n3 1\n255\n9 8 7").tolist() == [9, 8, 7]
    assert decode_pnm(b"P5\n3 1\n255\n" + bytes([9, 8, 7])).tolist() == [9, 8, 7]

    # BMP: 2x2 24-bit, bottom-up BGR, 8-byte stride (2 pad bytes/row)
    top = [(10, 20, 30), (40, 50, 60)]     # row 0 (R,G,B)
    bottom = [(70, 80, 90), (11, 12, 13)]  # row 1
    def bgr_row(pxs):
        return b"".join(bytes([b, g, r]) for r, g, b in pxs) + b"\x00\x00"
    payload = bgr_row(bottom) + bgr_row(top)  # stored bottom-up
    header = (
        b"BM" + (54 + len(payload)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little") + (2).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + b"\x00" * 20
    )
    got = decode_bmp(header + payload)
    want = [v for row in (top, bottom) for pxl in row for v in pxl]
    assert got.tolist() == want

    with pytest.raises(ValueError):
        decode_pnm(b"JFIF not a pnm")
    # P1/P4 bitmaps: loud unsupported-format rejection, never the ASCII
    # split path over raw payload bytes (r10 ADVICE)
    with pytest.raises(ValueError, match="P4"):
        decode_pnm(b"P4\n8 1\n" + bytes([0b10110000]))
    with pytest.raises(ValueError, match="P1"):
        decode_pnm(b"P1\n2 1\n1 0")
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)  # bpp=0
    with pytest.raises(NotImplementedError):
        real_image_decoder(blob, "audio")


def test_real_decode_through_mapinpandas(spark):
    """Real PPM bytes flow decode→feature→column through the SAME
    mapInPandas seam as the stub: per-doc mean/std equal numpy over the
    known pixel formula, n_bytes = header + payload."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        attach_ppm_media,
        extract_image_features,
        real_image_decoder,
    )

    docs = spark.createDataFrame(
        [(d, "t") for d in (0, 1, 5, 254)], "doc_id long, text string"
    )
    media = attach_ppm_media(docs)
    feats = {
        r["doc_id"]: r
        for r in extract_image_features(
            media, decoder=real_image_decoder
        ).collect()
    }
    i = np.arange(96, dtype=np.int64)
    for d in (0, 1, 5, 254):
        px = (d * 7 + i * 13) % 256
        assert feats[d]["n_bytes"] == 11 + 96
        assert abs(feats[d]["mean_intensity"] - px.mean()) < 1e-9
        assert abs(feats[d]["std_intensity"] - px.std()) < 1e-9


def test_unigram_driver_path_equals_distributed(spark):
    """r10 (VERDICT #8): the driver EM fast path (word table fits the
    cap → seeding + every EM round run driver-side off ONE
    decide-and-use collect) returns a piece table BYTE-IDENTICAL to
    the distributed mapInPandas path, including the loglik trace's
    monotonicity and the stats fields."""
    from crick_spark.pipeline.text import unigram_lm_train
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    s_fast: dict = {}
    s_dist: dict = {}
    fast = unigram_lm_train(
        docs, vocab_size=120, seed_size=400, em_rounds=3, stats=s_fast
    )
    dist = unigram_lm_train(
        docs,
        vocab_size=120,
        seed_size=400,
        em_rounds=3,
        stats=s_dist,
        driver_em_max_words=0,  # force the distributed path
    )
    assert fast == dist  # byte-identical (piece, logprob) tables
    assert s_fast["n_pieces"] == s_dist["n_pieces"]
    assert s_fast["n_chars"] == s_dist["n_chars"]
    # same trace up to float summation order; monotone on both paths
    assert all(
        abs(a - b) < 1e-6 * max(1.0, abs(a))
        for a, b in zip(s_fast["loglik_trace"], s_dist["loglik_trace"])
    )
    tr = s_fast["loglik_trace"]
    assert all(tr[i] <= tr[i + 1] + 1e-9 for i in range(len(tr) - 2))


def test_unigram_em_rounds_zero_rejected(spark):
    """em_rounds=0 fails as a contract (ValueError) on BOTH paths — the
    prune loop consumes EM usage counts, so zero rounds can never run
    (r10 VERDICT #3: previously an unbound-local NameError)."""
    import pytest

    from crick_spark.pipeline.text import (
        _unigram_lm_train_driver,
        unigram_lm_train,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    with pytest.raises(ValueError, match="em_rounds"):
        unigram_lm_train(docs, vocab_size=50, em_rounds=0)
    with pytest.raises(ValueError, match="em_rounds"):
        _unigram_lm_train_driver([("ab", 2)], 50, 100, 6, 0, None)


def test_bpe_driver_path_equals_distributed(spark):
    """r10: the BPE driver merge-loop fast path returns a merge list
    byte-identical to the distributed loop, with the same round count
    (the batched-greedy exactness guarantee is path-independent)."""
    from crick_spark.pipeline.text import bpe_train
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    s_fast: dict = {}
    s_dist: dict = {}
    fast = bpe_train(docs, n_merges=10, batch_size=6, stats=s_fast)
    dist = bpe_train(
        docs, n_merges=10, batch_size=6, stats=s_dist, driver_max_words=0
    )
    assert fast == dist
    assert s_fast == s_dist


def test_ppm_roundtrip_property():
    """Property: encode_ppm → real_image_decoder is the identity on any
    uint8 pixel stream at any (width, height) — the decoder parses real
    bytes exactly, not just the fixture shapes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crick_spark.pipeline.multimodal import (
        encode_ppm,
        real_image_decoder,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=w * h * 3, dtype=np.int64
        )
        assert np.array_equal(
            real_image_decoder(encode_ppm(px, w, h), "image"), px
        )

    check()


def test_real_y4m_codec_roundtrip_and_frame_walk():
    """r11: the pure-Python YUV4MPEG2 demuxer parses real bytes exactly —
    multi-frame C420 roundtrips the encoder, FRAME parameter tokens walk
    correctly, the frame-seek adapter returns the right plane, and bad
    magic / unsupported colourspace / odd geometry / truncated payloads
    all raise loudly."""
    import numpy as np
    import pytest

    from crick_spark.pipeline.multimodal import (
        decode_y4m,
        encode_y4m,
        real_video_decoder,
        real_video_frame_decoder,
        y4m_info,
    )

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(4, 48), dtype=np.int64)  # 8x4 C420
    blob = encode_y4m(frames, 8, 4, fps_num=30, fps_den=1)
    header_len = blob.index(b"\n") + 1
    assert len(blob) == header_len + 4 * (6 + 48)
    assert y4m_info(blob) == (8, 4, 30, 1, 4)
    assert np.array_equal(decode_y4m(blob), frames[:, :32])
    assert np.array_equal(real_video_decoder(blob, "video"), frames[:, :32])
    assert np.array_equal(
        real_video_frame_decoder(blob, "video", 2, 4), frames[2, :32]
    )

    # FRAME markers may carry parameters up to their newline — spec rule
    head, rest = blob.split(b"\n", 1)
    param = rest.replace(b"FRAME\n", b"FRAME Xsome_param\n", 1)
    assert y4m_info(head + b"\n" + param) == (8, 4, 30, 1, 4)
    first = decode_y4m(head + b"\n" + param)[0]
    assert np.array_equal(first, frames[0, :32])

    # loud failures: foreign bytes, non-420 colourspace, odd geometry,
    # truncated frame payload, missing geometry, non-video kind
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        y4m_info(b"RIFF not a y4m stream\n")
    c444 = blob.replace(b"C420jpeg", b"C444\x20\x20\x20\x20")
    with pytest.raises(ValueError, match="C420"):
        y4m_info(c444)
    with pytest.raises(ValueError, match="even"):
        encode_y4m(frames[:, : 7 * 4 * 3 // 2], 7, 4)
    with pytest.raises(ValueError, match="truncated"):
        y4m_info(blob[:-10])
    with pytest.raises(ValueError, match="missing"):
        y4m_info(b"YUV4MPEG2 F30:1\nFRAME\n")
    with pytest.raises(NotImplementedError):
        real_video_decoder(blob, "audio")


def test_video_features_and_frame_sampling_real_bytes(spark):
    """r11: attach_y4m_media → extract_video_features / sample_frames on
    REAL container bytes — header-derived geometry, luma stats, and the
    motion score match a straight numpy recomputation of the generator
    formula; sampled frame payloads are byte-exact."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        attach_y4m_media,
        extract_video_features,
        real_video_decoder,
        real_video_frame_decoder,
        sample_frames,
    )
    from crick_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    media = attach_y4m_media(docs)
    feats = {
        r["doc_id"]: r
        for r in extract_video_features(
            media, decoder=real_video_decoder
        ).collect()
    }
    p = np.arange(32)
    for d, r in feats.items():
        n = 2 + d % 5
        f = np.arange(n)[:, None]
        luma = (d * 17 + f * 29 + p[None, :] * 13) % 256
        assert (r["width"], r["height"], r["n_frames"]) == (8, 4, n)
        assert r["n_bytes"] == 38 + n * 54
        assert r["duration_s"] == pytest.approx(n / 5.0)
        assert r["mean_luma"] == pytest.approx(luma.mean())
        assert r["motion"] == pytest.approx(
            np.abs(np.diff(luma, axis=0)).mean()
        )

    sampled = sample_frames(
        media, fps=5.0, max_frames=8, frame_decoder=real_video_frame_decoder
    ).collect()
    assert len(sampled) == sum(2 + d % 5 for d in feats)
    for row in sampled:
        d, i = row["doc_id"], row["frame_idx"]
        want = (d * 17 + i * 29 + p * 13) % 256
        got = np.frombuffer(row["frame"], dtype=np.uint8)
        assert np.array_equal(got, want)


def test_frame_ahash_census_matches_numpy(spark):
    """r11: aHash per sampled frame equals the straight numpy bit-pack,
    and the census query shape (hash → frame count / distinct docs)
    matches a dict recomputation.  The luma generator depends on doc and
    frame only through (d*17 + f*29) mod 256, so cross-clip duplicate
    frames exist by construction and the census is non-trivial."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        ahash_frames,
        attach_y4m_media,
        real_video_frame_decoder,
        sample_frames,
    )
    from crick_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(40)
    media = attach_y4m_media(docs)
    frames = sample_frames(
        media, fps=5.0, max_frames=8, frame_decoder=real_video_frame_decoder
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r["ahash"]
        for r in ahash_frames(frames).collect()
    }

    p = np.arange(32)
    want = {}
    for d in {k[0] for k in got}:
        for f in range(2 + d % 5):
            luma = (d * 17 + f * 29 + p * 13) % 256
            bits = luma > luma.mean()
            want[(d, f)] = int((bits << p).sum())
    assert got == want

    census: dict[int, set] = {}
    for (d, _f), h in want.items():
        census.setdefault(h, set()).add(d)
    dup_hashes = {
        h for h, ds in census.items()
        if sum(1 for k in want if want[k] == h) > 1
    }
    assert dup_hashes  # generator periodicity guarantees collisions


def test_triangle_counts_matches_bruteforce_and_handles_hubs(spark):
    """r11: degree-oriented triangle counting == an itertools brute force
    on a random graph (incl. duplicate / reversed / self-loop edges
    normalized away), and a hub star plus one closing edge yields
    exactly the expected triangles — the shape whose wedge explosion the
    orientation exists to prevent."""
    import itertools

    import numpy as np

    from crick_spark.pipeline.graph import triangle_counts

    rng = np.random.default_rng(17)
    n = 40
    raw = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(300, 2))
        if a != b
    }
    # add noise the normalizer must absorb: reversals, dups, self-loops
    rows = (
        [(a, b) for a, b in raw]
        + [(b, a) for a, b in list(raw)[:50]]
        + [(5, 5), (7, 7)]
    )
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()
    }

    und = {tuple(sorted(e)) for e in raw}
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert got == want
    assert sum(want.values()) % 3 == 0 and want  # sanity: graph non-trivial

    # hub: star K1,20 has no triangles; closing one spoke pair adds one
    star = [(0, i) for i in range(1, 21)]
    e1 = spark.createDataFrame(star, "src long, dst long")
    assert triangle_counts(e1).count() == 0
    e2 = spark.createDataFrame(star + [(3, 4)], "src long, dst long")
    got2 = {r["node"]: r["n_triangles"] for r in triangle_counts(e2).collect()}
    assert got2 == {0: 1, 3: 1, 4: 1}


def test_kcore_peel_cascade_and_fixpoint(spark):
    """r11: bounded-round k-core peeling — a chain peels from both ends
    one round at a time (the canonical cascade), a clique is a fixpoint,
    and the explicit-k and derived-k (mean degree) paths agree with a
    hand recomputation."""
    from crick_spark.pipeline.graph import kcore_peel

    # path graph 0-1-2-3-4 at k=2: endpoints peel first, then cascade
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )
    rows = {
        r["round"]: (r["n_nodes"], r["n_edges"])
        for r in kcore_peel(chain, k=2, rounds=4).collect()
    }
    assert rows == {1: (3, 2), 2: (1, 0), 3: (0, 0), 4: (0, 0)}

    # K5 at derived k (mean degree 4): fixpoint from round 1, k recorded
    k5 = spark.createDataFrame(
        [(a, b) for a in range(5) for b in range(5) if a < b],
        "src long, dst long",
    )
    out = kcore_peel(k5, k=None, rounds=3).collect()
    assert all(r["k"] == 4 for r in out)
    assert all((r["n_nodes"], r["n_edges"]) == (5, 10) for r in out)


def test_coreness_converges_to_exact_core_numbers(spark):
    """r12: bounded-round h-index iteration — with enough rounds the
    labels equal true coreness from a Python peel on a random graph;
    the sequence is monotone non-increasing round over round; round 0
    is the degree; and a clique+tail composite lands the textbook
    values (clique nodes k-1, tail nodes 1)."""
    import numpy as np

    from crick_spark.pipeline.graph import coreness

    rng = np.random.default_rng(23)
    n = 36
    raw = {
        tuple(sorted((int(a), int(b))))
        for a, b in rng.integers(0, n, size=(140, 2))
        if a != b
    }
    edges = spark.createDataFrame(sorted(raw), "src long, dst long")

    # exact coreness by sequential peeling
    adj: dict[int, set[int]] = {}
    for a, b in raw:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    want: dict[int, int] = {}
    live = dict(deg)
    nbrs = {v: set(ns) for v, ns in adj.items()}
    k = 0
    while live:
        k = max(k, min(live.values()))
        peel = [v for v, d in live.items() if d <= k]
        for v in peel:
            want[v] = k
            for u in nbrs[v]:
                if u in live and u != v:
                    live[u] -= 1
            del live[v]

    got = {r["node"]: r["coreness"] for r in coreness(edges, rounds=30).collect()}
    assert got == want

    # monotone non-increasing, starting from degree
    prev = {r["node"]: r["coreness"] for r in coreness(edges, rounds=0).collect()}
    assert prev == deg
    for rounds in (1, 2, 3):
        cur = {
            r["node"]: r["coreness"]
            for r in coreness(edges, rounds=rounds).collect()
        }
        assert all(cur[v] <= prev[v] for v in cur)
        assert all(cur[v] >= want[v] for v in cur)  # upper bound throughout
        prev = cur

    # K6 with a pendant path: clique nodes coreness 5, path nodes 1
    k6 = [(a, b) for a in range(6) for b in range(6) if a < b]
    tail = [(5, 6), (6, 7)]
    comp = spark.createDataFrame(k6 + tail, "src long, dst long")
    got2 = {r["node"]: r["coreness"] for r in coreness(comp, rounds=10).collect()}
    assert got2 == {**{v: 5 for v in range(6)}, 6: 1, 7: 1}


def test_approx_triangle_total_doulion(spark):
    """r12: DOULION estimator — p=1.0 degenerates to the exact count;
    at p=0.5 the estimate is 8x the sampled count, the sampled edge set
    matches a Python recomputation of the md5 coin, and the error bound
    follows the closed form."""
    import hashlib
    import itertools
    import math

    from crick_spark.pipeline.graph import approx_triangle_total

    k12 = [(a, b) for a in range(12) for b in range(12) if a < b]
    edges = spark.createDataFrame(k12, "src long, dst long")

    full = approx_triangle_total(edges, p=1.0).collect()[0]
    want_t = len(list(itertools.combinations(range(12), 3)))  # C(12,3)
    assert full["n_sampled"] == full["n_edges"] == len(k12)
    assert full["t_sampled"] == full["t_est"] == want_t

    half = approx_triangle_total(edges, p=0.5).collect()[0]
    keep = {
        (a, b)
        for a, b in k12
        if int(hashlib.md5(f"{a}#{b}".encode()).hexdigest()[:6], 16)
        / (1 << 24)
        < 0.5
    }
    assert half["n_sampled"] == len(keep)
    t_s = sum(
        1
        for a, b, c in itertools.combinations(range(12), 3)
        if {(a, b), (a, c), (b, c)} <= keep
    )
    assert half["t_sampled"] == t_s
    assert half["t_est"] == 8 * t_s
    want_bound = round(math.sqrt(7.0 / max(8.0 * t_s, 1.0)), 6)
    assert half["rel_err_bound"] == want_bound


def test_graph_driver_close_matches_distributed(spark):
    """r15 (optimization round): the coreness h-index and DOULION
    triangle-total driver fast paths (numpy over one Arrow collect)
    must emit EXACTLY the forced-distributed results — same rows, same
    integer counts — on random graphs, for long AND string node ids
    (coreness; the triangle path is integer-id-only and must fall back
    on strings), and across round/probability settings."""
    import numpy as np
    from pyspark.sql import functions as F

    from crick_spark.pipeline.graph import approx_triangle_total, coreness

    rng = np.random.default_rng(91)
    raw = {
        tuple(sorted((int(a), int(b))))
        for a, b in rng.integers(0, 150, size=(1200, 2))
        if a != b
    }
    edges = spark.createDataFrame(sorted(raw), "src long, dst long")
    for rounds in (0, 2, 4):
        fast = sorted(map(tuple, coreness(edges, rounds=rounds).collect()))
        dist = sorted(
            map(
                tuple,
                coreness(
                    edges, rounds=rounds, driver_close_max_edges=0
                ).collect(),
            )
        )
        assert fast == dist
    sedges = edges.select(
        F.concat(F.lit("n"), F.col("src")).alias("src"),
        F.concat(F.lit("n"), F.col("dst")).alias("dst"),
    )
    sfast = sorted(map(tuple, coreness(sedges, rounds=3).collect()))
    sdist = sorted(
        map(
            tuple,
            coreness(sedges, rounds=3, driver_close_max_edges=0).collect(),
        )
    )
    assert sfast == sdist
    for p in (0.25, 0.5, 1.0):
        fast = [tuple(r) for r in approx_triangle_total(edges, p=p).collect()]
        dist = [
            tuple(r)
            for r in approx_triangle_total(
                edges, p=p, driver_close_max_edges=0
            ).collect()
        ]
        assert fast == dist
    # string ids keep the distributed wedge join (and still agree with
    # the long-id result, triangle counts being label-invariant)
    sres = [tuple(r) for r in approx_triangle_total(sedges, p=1.0).collect()]
    lres = [tuple(r) for r in approx_triangle_total(edges, p=1.0).collect()]
    assert sres[0][0] == lres[0][0]  # n_edges
    assert sres[0][2] >= 0


def test_triangle_total_audit_single_traversal_consistency(spark):
    """r14 (VERDICT r13 #7): triangle_total_audit derives the sampled
    count INSIDE the exact traversal — its (t_exact, t_sampled, t_est)
    must equal the two-traversal pair (triangle_counts total +
    approx_triangle_total) on the same graph and coin, including on a
    hub-heavy graph where orientation order matters, and p=1.0
    degenerates to t_sampled == t_exact."""
    import hashlib
    import itertools

    from crick_spark.pipeline.graph import (
        approx_triangle_total,
        triangle_total_audit,
    )

    # K12 plus a hub fan (node 100 connected to 0..7) and a disjoint path
    k12 = [(a, b) for a in range(12) for b in range(12) if a < b]
    extra = [(i, 100) for i in range(8)] + [(200, 201), (201, 202)]
    edges = spark.createDataFrame(k12 + extra, "src long, dst long")

    audit = triangle_total_audit(edges, p=0.5).collect()[0]
    est = approx_triangle_total(edges, p=0.5).collect()[0]
    nodes = sorted({n for e in k12 + extra for n in e})
    eset = {tuple(sorted(e)) for e in k12 + extra}
    want_exact = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {(a, b), (a, c), (b, c)} <= eset
    )
    assert audit["t_exact"] == want_exact
    assert audit["n_edges"] == est["n_edges"] == len(eset)
    assert audit["n_sampled"] == est["n_sampled"]
    assert audit["t_sampled"] == est["t_sampled"]
    assert audit["t_est"] == est["t_est"]
    # and the sampled count matches a Python recomputation of the coin
    keep = {
        (a, b)
        for a, b in eset
        if int(hashlib.md5(f"{a}#{b}".encode()).hexdigest()[:6], 16)
        / (1 << 24)
        < 0.5
    }
    want_s = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if {(a, b), (a, c), (b, c)} <= keep
    )
    assert audit["t_sampled"] == want_s

    degen = triangle_total_audit(edges, p=1.0).collect()[0]
    assert degen["t_sampled"] == degen["t_exact"] == want_exact
    assert degen["t_est"] == want_exact


def test_png_roundtrip_all_filters_and_strictness():
    """r12: encode_png/decode_png roundtrip exactly under every scanline
    filter (RGB and grayscale), mixed filters per image, and strict
    failure on unsupported shapes — pure kernel test, no Spark."""
    import numpy as np
    import pytest as _pytest

    from crick_spark.pipeline.multimodal import (
        decode_png,
        encode_png,
        png_info,
    )

    rng = np.random.default_rng(7)
    for color_type, bpp in ((2, 3), (0, 1)):
        px = rng.integers(0, 256, size=6 * 5 * bpp, dtype=np.int64)
        for f in range(5):
            blob = encode_png(px, 6, 5, color_type, row_filters=[f] * 5)
            assert png_info(blob) == (6, 5, 8, color_type)
            assert (decode_png(blob) == px).all(), f"filter {f}"
        mixed = encode_png(px, 6, 5, color_type, row_filters=[0, 1, 2, 3, 4])
        assert (decode_png(mixed) == px).all()

    # adversarial gradient rows where Average/Paeth predictors differ
    grad = (np.arange(8 * 4 * 3, dtype=np.int64) * 37) % 256
    blob = encode_png(grad, 8, 4, 2, row_filters=[4, 3, 4, 3])
    assert (decode_png(blob) == grad).all()

    with _pytest.raises(ValueError):
        encode_png(grad, 8, 4, color_type=6)  # RGBA unsupported
    with _pytest.raises(ValueError):
        encode_png(grad, 8, 4, 2, row_filters=[7, 0, 0, 0])
    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk" + b"\x00" * 40)


def test_real_image_decoder_sniffs_png(spark):
    """r12: the Decoder seam routes PNG bytes by signature beside
    BMP/Netpbm, through the same mapInPandas feature path."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        attach_png_media,
        extract_image_features,
        real_image_decoder,
    )

    docs = spark.createDataFrame(
        [(d, "t", 10) for d in range(7)], "doc_id long, text string, n_chars int"
    )
    feats = extract_image_features(
        attach_png_media(docs), decoder=real_image_decoder
    ).collect()
    assert len(feats) == 7
    i = np.arange(96, dtype=np.int64)
    for r in feats:
        px = (r["doc_id"] * 7 + i * 13) % 256
        assert abs(r["mean_intensity"] - px.mean()) < 1e-9
        assert abs(r["std_intensity"] - px.std()) < 1e-9


def test_audio_fingerprint_gain_invariant_content_sensitive(spark):
    """r12: the energy-contour fingerprint collapses integer-gain
    variants of the same stream (byte forms differ), distinguishes the
    16 fixture base streams, and matches a manual numpy recomputation
    including the short-clip window fallback."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        attach_wav_dup_media,
        audio_fingerprint,
        encode_wav,
        real_audio_decoder,
    )

    docs = spark.createDataFrame(
        [(d, "t", 10) for d in range(96)],
        "doc_id long, text string, n_chars int",
    )
    media = attach_wav_dup_media(docs)
    rows = audio_fingerprint(
        media, n_windows=16, decoder=real_audio_decoder
    ).collect()
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert all(r["n_windows"] == 16 for r in rows)
    for d in range(96):
        assert fp[d] == fp[d % 16]  # gain variants collapse per group
    assert len({fp[g] for g in range(16)}) == 16  # bases all distinct

    # manual recomputation for one doc
    i = np.arange(160, dtype=np.int64)
    g, scale = 5 % 16, 1 + (5 // 16) % 3
    s = ((g * 37 + i * (97 + 13 * g)) % 4001 - 2000) * scale
    e = (s**2).reshape(16, 10).sum(axis=1)
    want = sum(1 << (j - 1) for j in range(1, 16) if e[j] > e[j - 1])
    assert fp[5] == want

    # short clip: 7 samples with n_windows=16 -> per=1, 7 windows
    short = spark.createDataFrame(
        [(0, encode_wav(np.array([3, -1, 4, -1, 5, -9, 2]), 8000))],
        "doc_id long, media binary",
    ).select(
        "doc_id",
        "media",
        F.struct(
            F.lit("audio").alias("kind"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(1).alias("channels"),
            F.lit(8000).alias("sample_rate"),
            F.lit(7 / 8000.0).alias("duration_s"),
        ).alias("meta"),
    )
    r = audio_fingerprint(
        short, n_windows=16, decoder=real_audio_decoder
    ).collect()[0]
    es = np.array([9, 1, 16, 1, 25, 81, 4])
    assert r["n_windows"] == 7
    assert r["fp"] == sum(
        1 << (j - 1) for j in range(1, 7) if es[j] > es[j - 1]
    )


def test_personalized_pagerank_matches_numpy_with_dangling(spark):
    """r12: PPR must equal a from-scratch numpy restart-walk on a random
    digraph WITH sinks: teleport and dangling mass both flow to the seed
    distribution (weighted seeds, seeds outside the graph ignored),
    total mass stays 1.0, and zero-seed components keep rank only via
    in-links."""
    import numpy as np

    from crick_spark.pipeline.graph import personalized_pagerank

    rng = np.random.RandomState(13)
    n = 28
    edges = []
    for s in range(n - 4):  # last 4 nodes are sinks
        outs = rng.choice(n, size=rng.randint(1, 4), replace=False)
        for dd in outs:
            edges.append((f"v{s}", f"v{int(dd)}", float(rng.randint(1, 9))))
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    # weighted seeds: v0 weight 3, v5 weight 1, plus one seed NOT in the
    # graph (must be ignored by the in-plan normalization)
    seeds = spark.createDataFrame(
        [("v0", 3.0), ("v5", 1.0), ("not-in-graph", 9.0)], ["node", "wt"]
    )

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    m = len(nodes)
    P = np.zeros((m, m))
    for s, dd, w in edges:
        P[idx[dd], idx[s]] += w
    has_out = P.sum(axis=0) > 0
    P[:, has_out] /= P[:, has_out].sum(axis=0, keepdims=True)
    sv = np.zeros(m)
    sv[idx["v0"]], sv[idx["v5"]] = 3.0, 1.0
    sv /= sv.sum()
    d = 0.85
    r = sv.copy()
    for _ in range(4):
        dm = r[~has_out].sum()
        r = (1 - d) * sv + d * (P @ r + dm * sv)

    out = personalized_pagerank(
        df, seeds, iterations=4, damping=d, weight_col="w",
        reset_weight_col="wt", eager=True,
    )
    got = {row.node: row.rank for row in out.collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, (v, got[v], r[idx[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9, "mass not conserved"
    # seed-proximity sanity: the heavy seed outranks the light one
    assert got["v0"] > got["v5"]


def test_connected_components_contract_matches_hashmin_and_handles_long_paths(spark):
    """r12: star-contraction CC == union-find ground truth == hash-min CC
    on a noisy random graph, and converges on a 300-link path in O(log n)
    rounds — the diameter regime where hash-min's default 25-superstep
    budget raises."""
    import numpy as np
    import pytest as _pytest

    from crick_spark.pipeline.graph import (
        connected_components,
        connected_components_contract,
    )

    rng = np.random.default_rng(31)
    raw = {
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(80, 2))
        if a != b
    }
    rows = [(a, b) for a, b in raw] + [(b, a) for a, b in list(raw)[:20]] + [(9, 9)]
    edges = spark.createDataFrame(rows, "src long, dst long")

    # union-find ground truth
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in raw:
        parent[find(a)] = find(b)
    want = {}
    nodes = {n for e in raw for n in e}
    for n in nodes:
        want.setdefault(find(n), []).append(n)
    want_label = {n: min(ns) for r, ns in want.items() for n in ns}
    want_label[9] = 9  # self-loop-only node labels itself (hash-min parity)

    got_c = {
        r["node"]: r["component"]
        for r in connected_components_contract(edges).collect()
    }
    got_h = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got_c == want_label
    assert got_c == got_h

    # 300-link path: diameter 300 — hash-min raises at its default
    # budget, star contraction converges in O(log n) rounds
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "src long, dst long"
    )
    got_path = {
        r["node"]: r["component"]
        for r in connected_components_contract(path, max_iter=20).collect()
    }
    assert got_path == {i: 0 for i in range(301)}
    with _pytest.raises(RuntimeError):
        connected_components(path, max_iter=25, driver_close_max_edges=0)


def test_ahash_64_pixel_frames_pack_bit63_as_sign(spark):
    """r12 (ADVICE closure proof at the advertised 8x8 size): a 64-pixel
    frame whose top pixel exceeds the mean must set bit 63 — landing as
    a NEGATIVE int64 via two's complement, exactly what a BIGINT-shift
    oracle produces — and >64-pixel frames must raise loudly."""
    import numpy as np

    from crick_spark.pipeline.multimodal import ahash_frames

    px = np.zeros(64, dtype=np.uint8)
    px[63] = 255  # only bit 63 set: hash = 1<<63 -> INT64_MIN
    px[0] = 255   # and bit 0: hash = INT64_MIN + 1
    frames = spark.createDataFrame(
        [(1, 0, bytearray(px.tobytes()))],
        "doc_id long, frame_idx int, frame binary",
    )
    got = ahash_frames(frames).collect()[0]["ahash"]
    want = np.uint64((1 << 63) | 1).astype(np.int64)
    assert got == int(want) == -(2**63) + 1

    big = spark.createDataFrame(
        [(1, 0, bytearray(np.zeros(65, dtype=np.uint8).tobytes()))],
        "doc_id long, frame_idx int, frame binary",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="64"):
        ahash_frames(big).collect()


def test_audio_fingerprint_empty_clip_flagged_not_fatal(spark):
    """r13 (ADVICE r12): a zero-sample WAV (truncated/empty clip) must
    not kill the Arrow batch — it yields a flag row while healthy rows
    in the SAME batch still fingerprint normally.  r14 (ADVICE r13):
    the flag fp is NULL, not 0 — fp=0 is the legitimate fingerprint of
    a non-increasing energy contour (silence), so a 0 sentinel would
    merge truncated clips with real ones under fp-keyed dedup; NULL is
    outside the value domain and NULL-key rows are dropped by
    ExactDedupStore.fold by construction."""
    import numpy as np

    from crick_spark.pipeline.multimodal import (
        audio_fingerprint,
        encode_wav,
        real_audio_decoder,
    )

    meta = F.struct(
        F.lit("audio").alias("kind"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit(1).alias("channels"),
        F.lit(8000).alias("sample_rate"),
        F.lit(0.0).alias("duration_s"),
    ).alias("meta")
    media = spark.createDataFrame(
        [
            (0, encode_wav(np.array([], dtype=np.int16), 8000)),
            (1, encode_wav(np.array([3, -1, 4, -1, 5, -9, 2]), 8000)),
        ],
        "doc_id long, media binary",
    ).select("doc_id", "media", meta).coalesce(1)
    rows = {
        r["doc_id"]: r
        for r in audio_fingerprint(
            media, n_windows=16, decoder=real_audio_decoder
        ).collect()
    }
    assert rows[0]["fp"] is None and rows[0]["n_windows"] == 0
    es = np.array([9, 1, 16, 1, 25, 81, 4])
    assert rows[1]["n_windows"] == 7
    assert rows[1]["fp"] == sum(
        1 << (j - 1) for j in range(1, 7) if es[j] > es[j - 1]
    )


def test_ivfpq_query_panel_loud_cap(spark, monkeypatch):
    """r13 (VERDICT r12 #7): per-query ADC LUTs are driver-side state,
    so a panel larger than ANN_QUERY_PANEL_MAX must fail with a clear
    message (the text.py limit(cap+1) loud-fail pattern), while an
    at-cap panel still resolves."""
    import pytest

    from crick_spark.pipeline import similarity as sim
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = sim.train_ivf_centroids(emb, k=4)
    books = sim.train_pq_codebooks(emb, m=16, ksub=16)
    panel = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    monkeypatch.setattr(sim, "ANN_QUERY_PANEL_MAX", 2)
    with pytest.raises(ValueError, match="ANN_QUERY_PANEL_MAX"):
        sim.ivfpq_bulk_topk(panel, emb, cents, books, k=3, nprobe=2)
    monkeypatch.setattr(sim, "ANN_QUERY_PANEL_MAX", 3)
    assert sim.ivfpq_bulk_topk(
        panel, emb, cents, books, k=3, nprobe=2
    ).count() == 9


def test_triangle_counts_capped_bounds_and_exactness(spark):
    """r13 (VERDICT r12 #6): degree-capped exact triangles — the capped
    graph's max degree is genuinely <= d_max (both-endpoint worst-rank
    rule), t_capped equals an itertools brute force on an independently
    recomputed capped edge set (md5 coin + per-node ranks), and with
    d_max >= true max degree the cap is a no-op (t_capped == exact)."""
    import hashlib
    import itertools

    import numpy as np

    from crick_spark.pipeline.graph import triangle_counts_capped

    rng = np.random.default_rng(23)
    n = 30
    und = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, size=(260, 2))
            if a != b
        }
    )
    # plant a hub: node 0 connected to everything
    und = sorted(set(und) | {(0, i) for i in range(1, n)})
    edges = spark.createDataFrame(und, "src long, dst long")

    def coin(a, b):
        return int(hashlib.md5(f"{a}#{b}".encode()).hexdigest()[:6], 16) / (
            1 << 24
        )

    def capped_set(d):
        inc = {}
        for a, b in und:
            inc.setdefault(a, []).append((coin(a, b), a, b))
            inc.setdefault(b, []).append((coin(a, b), a, b))
        rank = {}
        for node, lst in inc.items():
            for i, (_, a, b) in enumerate(sorted(lst), start=1):
                rank[(a, b)] = max(rank.get((a, b), 0), i)
        return {e for e, r in rank.items() if r <= d}

    def brute(es):
        nodes = sorted({x for e in es for x in e})
        return sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if {(a, b), (a, c), (b, c)} <= es
        )

    for d in (4, 8):
        row = triangle_counts_capped(edges, d_max=d).collect()[0]
        want_edges = capped_set(d)
        assert row["max_capped_degree"] <= d
        assert row["n_edges"] == len(und)
        assert row["n_capped_edges"] == len(want_edges)
        assert row["t_capped"] == brute(want_edges)

    full = triangle_counts_capped(edges, d_max=n + 10).collect()[0]
    assert full["n_capped_edges"] == len(und)
    assert full["t_capped"] == brute(set(und))


def test_ivf_layout_delete_rtbf(spark, tmp_path):
    """r13: right-to-be-forgotten over the IVF layout — deleted ids
    vanish, survivors are untouched row-for-row, untouched clusters'
    files are byte-identical, a fully-emptied cluster's partition dir
    is removed, the search path equals an in-memory search over the
    surviving corpus, and a replay is an idempotent no-op."""
    import glob
    import hashlib

    from crick_spark.pipeline.similarity import (
        ivf_bulk_topk,
        ivf_bulk_topk_from_layout,
        ivf_layout_delete,
        train_ivf_centroids,
        write_ivf_layout,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = train_ivf_centroids(emb, k=8)
    path = str(tmp_path / "layout")
    write_ivf_layout(emb, cents, path)
    before = {(r["vec_id"],) for r in spark.read.parquet(path).collect()}

    def file_hashes():
        out = {}
        for f in glob.glob(f"{path}/ivf_cluster=*/*.parquet"):
            out[f] = hashlib.md5(open(f, "rb").read()).hexdigest()
        return out

    # delete one whole cluster plus a scattered subset
    lay = spark.read.option("basePath", path).parquet(path)
    victim_cluster = lay.groupBy("ivf_cluster").count().orderBy(
        "ivf_cluster"
    ).collect()[0]["ivf_cluster"]
    whole = {r["vec_id"] for r in lay.where(
        F.col("ivf_cluster") == victim_cluster
    ).collect()}
    scattered = {r["vec_id"] for r in emb.where(
        F.col("vec_id") % 17 == 3
    ).collect()}
    dele = sorted(whole | scattered)
    pre_hashes = file_hashes()
    ddf = spark.createDataFrame([(i,) for i in dele], "vec_id long")
    stats = ivf_layout_delete(spark, ddf, path)
    assert stats["n_deleted"] == len(set(dele) & {v for (v,) in before})

    after_df = spark.read.option("basePath", path).parquet(path)
    after = {r["vec_id"] for r in after_df.collect()}
    assert after == {v for (v,) in before} - set(dele)
    # fully-emptied cluster dir removed
    assert not glob.glob(f"{path}/ivf_cluster={victim_cluster}/*")
    # untouched clusters byte-identical
    post_hashes = file_hashes()
    touched_dirs = {f"ivf_cluster={c}" for c in stats["clusters_touched"]}
    for f, h in pre_hashes.items():
        if not any(t in f for t in touched_dirs):
            assert post_hashes.get(f) == h, f
    # reader equivalence over the surviving corpus
    panel = emb.where(~F.col("vec_id").isin(dele)).orderBy("vec_id").limit(
        3
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    mem = ivf_bulk_topk(
        panel, emb.where(~F.col("vec_id").isin(dele)), cents, k=5, nprobe=3
    )
    layr = ivf_bulk_topk_from_layout(spark, panel, path, cents, k=5, nprobe=3)
    assert sorted(map(tuple, mem.collect())) == sorted(
        map(tuple, layr.collect())
    )
    # idempotent replay
    stats2 = ivf_layout_delete(spark, ddf, path)
    assert stats2 == {
        "n_deleted": 0, "clusters_touched": [], "n_rewritten_rows": 0,
    }
    assert spark.read.parquet(path).count() == len(after)


def test_exact_dedup_store_delete_rtbf(spark, tmp_path):
    """r13: ExactDedupStore.delete removes keys from only the touched
    (bucket, batch) partitions, keeps every other key's first-batch
    attribution, removes fully-emptied partition dirs, is idempotent,
    and a re-fold of deleted content attributes it to the NEW batch
    (the store forgets — the erasure semantic)."""
    from crick_spark.streaming.exact_dedup import ExactDedupStore

    store = ExactDedupStore(str(tmp_path / "store"), key_col="k", n_buckets=4)
    b0 = spark.createDataFrame([(f"k{i}",) for i in range(40)], "k string")
    b1 = spark.createDataFrame(
        [(f"k{i}",) for i in range(20, 60)], "k string"
    )
    store.fold(b0, 0)
    store.fold(b1, 1)
    want = {(f"k{i}", 0) for i in range(40)} | {
        (f"k{i}", 1) for i in range(40, 60)
    }
    got = {(r["key"], r["first_batch"]) for r in store.keys(spark).collect()}
    assert got == want

    dele = spark.createDataFrame(
        [(f"k{i}",) for i in range(0, 60, 3)], "k string"
    )
    stats = store.delete(dele)
    assert stats["n_deleted"] == 20
    got2 = {(r["key"], r["first_batch"]) for r in store.keys(spark).collect()}
    assert got2 == {(k, b) for k, b in want if int(k[1:]) % 3 != 0}
    # idempotent replay
    assert store.delete(dele) == {"n_deleted": 0, "partitions_touched": []}
    # re-fold of erased content: attributed to the NEW batch
    refold = spark.createDataFrame([("k0",), ("k3",), ("k41",)], "k string")
    store.fold(refold, 2)
    got3 = {(r["key"], r["first_batch"]) for r in store.keys(spark).collect()}
    assert ("k0", 2) in got3 and ("k3", 2) in got3
    assert ("k41", 1) in got3  # never deleted: keeps original attribution


def test_bpe_unrolled_oracle_property_vs_python():
    """r13: the DuckDB unrolled-CTE BPE oracle (_bpe_unrolled_oracle's
    double-space replace trick) must equal a clean pure-Python
    sequential greedy trainer on arbitrary corpora — overlapping pairs
    ('aaaa'), early pair exhaustion, ties, and multi-byte codepoints
    included.  Spark ≡ sequential is pinned elsewhere; this closes
    oracle ≡ sequential on shapes the fixtures don't have."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crick_spark.plans.pipeline_queries import _bpe_unrolled_oracle

    word = st.text(alphabet=["a", "b", "c", "é"], min_size=1, max_size=7)
    corpus = st.lists(word, min_size=3, max_size=25)

    def python_bpe(words, n_merges):
        freq = {}
        for w in words:
            if len(w) >= 2:
                freq[w] = freq.get(w, 0) + 1
        tbl = {w: list(w) for w in freq}
        merges = []
        for _ in range(n_merges):
            pc = {}
            for w, syms in tbl.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] = (
                        pc.get((syms[i], syms[i + 1]), 0) + freq[w]
                    )
            if not pc:
                break
            (l, r), f = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((l, r, f))
            for w, syms in tbl.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                tbl[w] = out
        return merges

    @settings(max_examples=40, deadline=None)
    @given(ws=corpus)
    def check(ws):
        want = python_bpe(ws, 3)
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame({"doc_id": range(len(ws)), "text": ws}),
        )
        got = [
            (r[1], r[2], int(r[3]))
            for r in con.sql(_bpe_unrolled_oracle(3)).fetchall()
        ]
        con.close()
        assert got == want, (ws, got, want)

    check()


def test_poisson_bootstrap_ci_sanity(spark):
    """r13: the deterministic Poisson bootstrap — the CI brackets the
    sample mean, is deterministic across reruns, narrows roughly like
    1/sqrt(n), and rejects degenerate parameters."""
    import pytest

    from crick_spark.pipeline.sampling import poisson_bootstrap_ci

    def frame(n):
        return spark.createDataFrame(
            [(i, float((i * 37) % 101)) for i in range(n)], "id long, x double"
        )

    small = poisson_bootstrap_ci(frame(200), "x", "id", n_reps=40).collect()[0]
    big = poisson_bootstrap_ci(frame(5000), "x", "id", n_reps=40).collect()[0]
    for r in (small, big):
        assert r["boot_lo"] <= r["mean"] <= r["boot_hi"], r
    assert (big["boot_hi"] - big["boot_lo"]) < (
        small["boot_hi"] - small["boot_lo"]
    )
    again = poisson_bootstrap_ci(frame(200), "x", "id", n_reps=40).collect()[0]
    assert again == small  # md5 coins: byte-deterministic
    with pytest.raises(ValueError, match="n_reps"):
        poisson_bootstrap_ci(frame(10), "x", "id", n_reps=2)
    with pytest.raises(ValueError, match="level"):
        poisson_bootstrap_ci(frame(10), "x", "id", level=1.5)
