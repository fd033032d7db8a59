"""Incremental dedup-cluster maintenance — persisted connected-components
labels folded forward by micro-batches of new near-duplicate pairs.

The batch path ends at ``pipeline/graph.py:connected_components`` — a full
closure over ALL pairs ever seen.  A 100 TB curation pipeline cannot
re-close history every micro-batch: the incremental dedup stream
(``streaming/incremental_dedup.py``) already emits only the NEW candidate
pairs per batch, and this store folds them into a persisted
``(node, component)`` labeling without ever re-reading historical pairs.

Per batch, the closure runs on the CONTRACTED graph only: each new
pair's endpoints are replaced by their current stored label (or
themselves if unseen), giving edges between component representatives —
O(|batch|) edges regardless of history size.  Hash-min propagation over
that contracted graph (``connected_components``, O(merged-diameter)
supersteps) yields an old-label → new-label mapping, bounded by the
batch; applying it to the stored labels is ONE broadcast-mapping join
(the mapping is batch-sized — bounded by the micro-batch, never by the
corpus, so the broadcast is legitimate), plus an insert of the batch's
unseen nodes.  Correctness is exact, not approximate: a stored label is
the min node id of its component, so min-over-representatives equals
min-over-members and the incremental labeling is IDENTICAL to a full
re-closure over the union of all folded pairs (asserted in tests and by
the registered query's recursive-CTE oracle).

State protocol is the repo's SketchStore/BloomDedupStore double-buffer:
the label snapshot alternates between two exact paths, an APPEND-ONLY
meta log carries (batch_id, path), replays fence on batch_id, and the
meta row commits last — a crash mid-write re-surfaces the previous
generation.  The per-batch snapshot REWRITE is O(|labels|); on a real
cluster the upgrade path is a transactional table format (Delta/Iceberg)
whose partition-level commits confine the rewrite to buckets holding
remapped components — the fold's COMPUTE is already O(|batch|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.pipeline.graph import connected_components


class ClusterStore:
    def __init__(self, base_dir: str):
        self.base = base_dir
        # exact snapshot paths: the flip decision compares the committed
        # meta path against these strings byte-for-byte
        self._paths = [f"{base_dir}/labels_a.pq", f"{base_dir}/labels_b.pq"]
        self._meta = f"{base_dir}/meta"

    def read_meta(self, spark: SparkSession):
        from pyspark.errors import AnalysisException

        try:
            rows = (
                spark.read.parquet(self._meta)
                .orderBy(F.col("batch_id").desc())
                .limit(1)
                .collect()
            )
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return -1, None
            raise
        if rows:
            return int(rows[0]["batch_id"]), rows[0]["path"]
        return -1, None

    def labels(self, spark: SparkSession) -> DataFrame | None:
        """Current committed (node, component) labeling, or None before
        the first fold."""
        _, cur = self.read_meta(spark)
        return spark.read.parquet(cur) if cur else None

    def fold(self, pairs: DataFrame, batch_id: int) -> bool:
        """Fold one batch of near-dup pairs (id_a, id_b) into the stored
        labeling; returns False for a fenced replay."""
        s = pairs.sparkSession
        last_id, cur = self.read_meta(s)
        if int(batch_id) <= last_id:
            return False
        p = (
            pairs.select("id_a", "id_b")
            .where(F.col("id_a").isNotNull() & F.col("id_b").isNotNull())
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        labels = s.read.parquet(cur) if cur else None
        if labels is not None:
            la = labels.select(
                F.col("node").alias("id_a"), F.col("component").alias("__ca__")
            )
            lb = labels.select(
                F.col("node").alias("id_b"), F.col("component").alias("__cb__")
            )
            # batch pairs resolve their endpoints' current labels: two
            # id equi-joins of the SMALL batch against the label table —
            # no hint; AQE broadcasts whichever side is actually small
            e = (
                p.join(la, "id_a", "left")
                .join(lb, "id_b", "left")
                .select(
                    F.coalesce("__ca__", "id_a").alias("u"),
                    F.coalesce("__cb__", "id_b").alias("v"),
                )
            )
        else:
            e = p.select(
                F.col("id_a").alias("u"), F.col("id_b").alias("v")
            )
        e = e.where(F.col("u") != F.col("v"))
        # closure over the CONTRACTED graph only: O(|batch|) edges
        cc = connected_components(e, src="u", dst="v")
        if labels is not None:
            # old-rep -> new-component mapping; batch-bounded, broadcast
            mapping = cc.where(F.col("node") != F.col("component")).select(
                F.col("node").alias("__old__"),
                F.col("component").alias("__new__"),
            )
            updated = (
                labels.join(
                    F.broadcast(mapping),
                    labels.component == F.col("__old__"),
                    "left",
                )
                .select(
                    "node",
                    F.coalesce("__new__", "component").alias("component"),
                )
            )
            batch_nodes = (
                p.select(F.col("id_a").alias("node"))
                .unionByName(p.select(F.col("id_b").alias("node")))
                .distinct()
            )
            new_nodes = batch_nodes.join(labels, "node", "left_anti")
            new_labels = new_nodes.join(
                F.broadcast(cc.withColumnRenamed("component", "__c__")),
                "node",
                "left",
            ).select("node", F.coalesce("__c__", "node").alias("component"))
            final = updated.unionByName(new_labels)
        else:
            final = cc
        flip = 0 if cur != self._paths[0] else 1
        target = self._paths[flip]
        final.write.mode("overwrite").parquet(target)
        s.createDataFrame(
            [(int(batch_id), target)], "batch_id long, path string"
        ).write.mode("append").parquet(self._meta)
        return True
