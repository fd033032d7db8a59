"""Clustered synthetic corpora (sources/synthetic.py) and the
cluster-structure measurement (similarity.ivf_structure_stats) — the r11
ANN-calibration fixtures (VERDICT r10 #2)."""

from __future__ import annotations

import numpy as np
import pytest


def _rows(df):
    return {r["vec_id"]: (r["cluster"], tuple(r["embedding"])) for r in df.collect()}


class TestMogEmbeddings:
    def test_partition_independent_determinism(self, spark):
        """Same (seed, vec_id) → same row regardless of partitioning —
        the contract that makes the fixture a fixture."""
        from crick_spark.sources.synthetic import mog_embeddings

        a = _rows(mog_embeddings(spark, 200, dim=16, n_clusters=4, seed=3))
        b = _rows(
            mog_embeddings(spark, 200, dim=16, n_clusters=4, seed=3).repartition(17)
        )
        assert a == b

    def test_seed_changes_corpus(self, spark):
        from crick_spark.sources.synthetic import mog_embeddings

        a = _rows(mog_embeddings(spark, 50, dim=8, n_clusters=2, seed=3))
        b = _rows(mog_embeddings(spark, 50, dim=8, n_clusters=2, seed=4))
        assert a != b

    def test_noise_controls_dispersion(self, spark):
        """Mean cosine to the TRUE center rises as noise falls — the
        within/between knob actually works."""
        from crick_spark.sources.synthetic import mog_centers, mog_embeddings
        from crick_spark.pipeline.similarity import ivf_structure_stats

        centers = mog_centers(4, 32, seed=5)

        def mean_top(noise):
            emb = mog_embeddings(
                spark, 200, dim=32, n_clusters=4, seed=5, noise=noise
            )
            row = ivf_structure_stats(emb, centers).collect()[0]
            return row["mean_top_cos"]

        tight, loose = mean_top(0.03), mean_top(0.3)
        assert tight > 0.95
        assert tight > loose + 0.2

    def test_kmeans_recovers_structure(self, spark):
        """train_ivf_centroids on a tight MoG corpus finds cells that the
        structure score recognises as clustered — the end-to-end loop the
        ANN.md calibration relies on."""
        from crick_spark.pipeline.similarity import (
            ivf_structure_stats,
            train_ivf_centroids,
        )
        from crick_spark.sources.synthetic import mog_embeddings

        emb = mog_embeddings(
            spark, 400, dim=32, n_clusters=8, seed=11, noise=0.04
        ).cache()
        cents = train_ivf_centroids(emb, k=8, n_iter=5)
        row = ivf_structure_stats(emb, cents).collect()[0]
        assert row["mean_top_cos"] > 0.9
        assert row["mean_margin"] > 0.3
        emb.unpersist()


class TestLatticeEmbeddings:
    def test_matches_formula(self, spark):
        """Spark generation == the documented closed form, row by row."""
        from crick_spark.sources.synthetic import (
            LATTICE_CLUSTER_LOOKUP,
            lattice_centers,
            lattice_clustered_embeddings,
        )

        got = _rows(lattice_clustered_embeddings(spark, 64, dim=16, noise_scale=0.6))
        centers = lattice_centers(8, 16)
        for i in range(64):
            c = LATTICE_CLUSTER_LOOKUP[i % 16]
            want = centers[c] + 0.6 * (
                ((np.arange(16) * 61 + i * 131) % 997 - 498) / 498.0
            )
            assert got[i][0] == c
            np.testing.assert_allclose(got[i][1], want, rtol=0, atol=0)

    def test_skewed_cluster_sizes(self, spark):
        from crick_spark.sources.synthetic import lattice_clustered_embeddings

        sizes = {
            r["cluster"]: r["cnt"]
            for r in lattice_clustered_embeddings(spark, 1200)
            .groupBy("cluster")
            .count()
            .withColumnRenamed("count", "cnt")
            .collect()
        }
        assert sizes == {0: 225, 1: 225, 2: 150, 3: 150, 4: 150, 5: 75, 6: 75, 7: 150}


class TestStructureStats:
    def test_grouped_stats_against_numpy(self, spark):
        """ivf_structure_stats(group_col=...) == a straight numpy
        recomputation of the same profile."""
        from crick_spark.pipeline.similarity import ivf_structure_stats
        from crick_spark.sources.synthetic import (
            LATTICE_CLUSTER_LOOKUP,
            lattice_centers,
            lattice_clustered_embeddings,
        )

        n, dim = 320, 16
        emb = lattice_clustered_embeddings(spark, n, dim=dim, noise_scale=0.6)
        centers = lattice_centers(8, dim)
        got = {
            r["cluster"]: r
            for r in ivf_structure_stats(emb, centers, group_col="cluster").collect()
        }

        ids = np.arange(n)
        cl = np.asarray(LATTICE_CLUSTER_LOOKUP)[ids % 16]
        jj = np.arange(dim)[None, :]
        V = centers[cl] + 0.6 * ((ids[:, None] * 131 + jj * 61) % 997 - 498) / 498.0
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        sims = Vn @ Cn.T
        top = sims.argmax(axis=1)
        for c in range(8):
            sel = cl == c
            assert got[c]["cnt"] == int(sel.sum())
            assert got[c]["mean_intra_cos"] == pytest.approx(
                sims[sel, c].mean(), abs=1e-6
            )
            assert got[c]["mean_top_cos"] == pytest.approx(
                sims[sel].max(axis=1).mean(), abs=1e-6
            )
            assert got[c]["assign_acc"] == pytest.approx(
                (top[sel] == c).mean(), abs=1e-6
            )

    def test_structureless_corpus_scores_low(self, spark):
        """The drift-signal threshold is real: the iid testdata corpus
        against its own k-means centroids sits far below the clustered
        regime (ANN.md measures 0.388 vs 0.799–0.956)."""
        from crick_spark.pipeline.similarity import (
            ivf_structure_stats,
            train_ivf_centroids,
        )
        from crick_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
        cents = train_ivf_centroids(emb, k=8, n_iter=3)
        row = ivf_structure_stats(emb, cents).collect()[0]
        assert row["mean_top_cos"] < 0.7  # the by_residual gate line
        emb.unpersist()


class TestChooseByResidual:
    def test_picks_sides_per_calibration(self, spark):
        """choose_by_residual returns True exactly in the regime the
        ANN.md clustered table showed residual winning: tight MoG → True,
        the structureless testdata corpus → False."""
        from crick_spark.pipeline.similarity import (
            choose_by_residual,
            train_ivf_centroids,
        )
        from crick_spark.sources.synthetic import mog_embeddings
        from crick_spark.sources.tables import load_table

        tight = mog_embeddings(
            spark, 400, dim=32, n_clusters=8, seed=11, noise=0.04
        ).cache()
        cents = train_ivf_centroids(tight, k=8, n_iter=3)
        assert choose_by_residual(tight, cents) is True
        tight.unpersist()

        iid = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
        cents = train_ivf_centroids(iid, k=8, n_iter=3)
        assert choose_by_residual(iid, cents) is False
        iid.unpersist()


class TestChooseSearchParams:
    def test_params_follow_structure_on_both_fixtures(self, spark):
        """r12: choose_search_params lands in the measured regime on both
        calibration fixtures — tight MoG (clustered: residual codes,
        nprobe = nlist/16, shallow rerank) and the structureless testdata
        corpus (plain codes, nprobe = nlist/4, deep rerank) — and the
        knobs are consistent with choose_by_residual's gate."""
        from crick_spark.pipeline.similarity import (
            choose_by_residual,
            choose_search_params,
            train_ivf_centroids,
        )
        from crick_spark.sources.synthetic import mog_embeddings
        from crick_spark.sources.tables import load_table

        tight = mog_embeddings(
            spark, 400, dim=32, n_clusters=8, seed=11, noise=0.04
        ).cache()
        cents = train_ivf_centroids(tight, k=16, n_iter=3)
        p = choose_search_params(tight, cents)
        assert p["by_residual"] is True
        assert p["by_residual"] == choose_by_residual(tight, cents)
        assert p["mean_top_cos"] >= 0.7
        assert p["nprobe"] == 1  # 16/16
        assert p["rerank_factor"] == 2
        tight.unpersist()

        iid = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
        cents = train_ivf_centroids(iid, k=16, n_iter=3)
        p = choose_search_params(iid, cents)
        assert p["by_residual"] is False
        assert p["mean_top_cos"] < 0.7
        assert p["nprobe"] == 4  # 16/4
        assert p["rerank_factor"] == 8
        iid.unpersist()

    def test_nprobe_bounded_by_nlist(self, spark):
        """Tiny list counts can't recommend more probes than lists."""
        from crick_spark.pipeline.similarity import (
            choose_search_params,
            train_ivf_centroids,
        )
        from crick_spark.sources.tables import load_table

        iid = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
        cents = train_ivf_centroids(iid, k=2, n_iter=2)
        p = choose_search_params(iid, cents)
        assert 1 <= p["nprobe"] <= 2
        iid.unpersist()

    def test_target_recall_floors_structureless_knobs(self, spark):
        """r14 (VERDICT r13 #3): quality-gate mode.  On a structureless
        corpus, target_recall floors nprobe at (target+0.05)·nlist
        coverage and the rerank pool at 16× — the scale-stable
        derivation of the knobs knn_ivfpq_bulk_recall used to pin by
        hand (nlist=16, target 0.7 → nprobe 12, the exact working
        values).  On a clustered corpus the default (cheap) knobs
        already measure ≥0.96 recall, so the mode changes nothing."""
        from crick_spark.pipeline.similarity import (
            choose_search_params,
            train_ivf_centroids,
        )
        from crick_spark.sources.synthetic import mog_embeddings
        from crick_spark.sources.tables import load_table

        iid = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
        cents = train_ivf_centroids(iid, k=16, n_iter=3)
        p = choose_search_params(iid, cents, target_recall=0.7)
        assert p["by_residual"] is False
        assert p["nprobe"] == 12  # ceil(0.75 * 16)
        assert p["rerank_factor"] == 16
        # floors only raise: a lower bar can't drop below the budget rule
        p_low = choose_search_params(iid, cents, target_recall=0.1)
        assert p_low["nprobe"] >= 4 and p_low["rerank_factor"] == 16
        # a bar near 1.0 clamps coverage at every list
        p_hi = choose_search_params(iid, cents, target_recall=0.99)
        assert p_hi["nprobe"] == 16
        iid.unpersist()

        tight = mog_embeddings(
            spark, 400, dim=32, n_clusters=8, seed=11, noise=0.04
        ).cache()
        cents = train_ivf_centroids(tight, k=16, n_iter=3)
        p = choose_search_params(tight, cents, target_recall=0.7)
        assert p["by_residual"] is True
        assert p["nprobe"] == 1 and p["rerank_factor"] == 2
        tight.unpersist()


class TestPrototypePruning:
    def test_hard_easy_selection_and_counts(self, spark):
        """r12: per-cluster prototypicality pruning — keep='hard' retains
        the low-cosine tail, keep='easy' the high-cosine head, each
        cluster keeps exactly ceil(frac*n), selection is deterministic,
        and every kept 'hard' score is <= every dropped score within its
        cluster."""
        import math

        from crick_spark.pipeline.similarity import (
            prototype_scores,
            prune_by_prototypicality,
        )
        from crick_spark.sources.synthetic import (
            lattice_centers,
            lattice_clustered_embeddings,
        )

        emb = lattice_clustered_embeddings(
            spark, n=320, dim=16, noise_scale=0.6
        ).cache()
        cents = lattice_centers(8, 16)
        scored = prototype_scores(emb, cents).collect()
        by_cluster: dict[int, list] = {}
        for r in scored:
            by_cluster.setdefault(r["proto_cluster"], []).append(
                (r["proto_cos"], r["vec_id"])
            )

        hard = prune_by_prototypicality(
            emb, cents, keep_fraction=0.5, keep="hard"
        ).collect()
        easy = prune_by_prototypicality(
            emb, cents, keep_fraction=0.5, keep="easy"
        ).collect()
        for mode, rows in (("hard", hard), ("easy", easy)):
            kept: dict[int, set] = {}
            for r in rows:
                kept.setdefault(r["proto_cluster"], set()).add(r["vec_id"])
            for c, members in by_cluster.items():
                want_n = math.ceil(0.5 * len(members))
                assert len(kept.get(c, set())) == want_n, (mode, c)
                ordered = sorted(
                    members, key=lambda t: (t[0], t[1]),
                    reverse=(mode == "easy"),
                )
                want_ids = {vid for _, vid in ordered[:want_n]}
                assert kept[c] == want_ids, (mode, c)
        emb.unpersist()


class TestPrototypePruningFloatCeil:
    def test_non_dyadic_fraction_keeps_decimal_count(self, spark):
        """r13 (ADVICE r12): ceil must follow the DECIMAL intent of
        keep_fraction, not binary-float artifacts — 0.07 of a
        100-member cluster keeps 7, even though 0.07*100 ==
        7.000000000000001 in doubles (naive ceil would keep 8)."""
        import numpy as np

        from crick_spark.pipeline.similarity import (
            prune_by_prototypicality,
        )

        assert 0.07 * 100 > 7  # the float artifact this test pins

        cents = np.zeros((2, 4), dtype=np.float64)
        cents[0, 0] = 1.0
        cents[1, 1] = 1.0
        rows = [
            (i, [float(x) for x in cents[i % 2]]) for i in range(200)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        for mode in ("hard", "easy"):
            kept = prune_by_prototypicality(
                emb, cents, keep_fraction=0.07, keep=mode
            ).collect()
            per = {}
            for r in kept:
                per[r["proto_cluster"]] = per.get(r["proto_cluster"], 0) + 1
            assert per == {0: 7, 1: 7}, (mode, per)
