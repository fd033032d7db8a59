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

State layout (r8 — the O(|labels|)-rewrite fix the r7 docstring
conceded): the labeling is BUCKETED by ``pmod(xxhash64(node),
n_buckets)`` and each fold writes ONE generation directory
``labels/gen_<batch>/bucket=K/`` holding ONLY the buckets the batch
touched — buckets containing a node whose component was remapped, or
receiving a new node.  An APPEND-ONLY meta log carries one
``(batch_id, bucket, path)`` row per touched bucket, committed LAST as
a single file (task-commit rename — a crash mid-fold re-surfaces the
previous generation whole); the current labeling is, per bucket, the
path from the latest batch that touched it.  Untouched buckets' files
are never rewritten — byte-identical across folds (tested).  Per-fold
cost: the label READ stays O(|labels|) but column-pruned (node,
component only; remap probes are row-group-skippable), while the
REWRITE — the expensive side on a real filesystem — is
O(|touched buckets|), the same commit confinement a transactional
table format (Delta/Iceberg) would give.  The bucket id is derived
from the node, never stored, so ``n_buckets`` must stay fixed for a
store's lifetime (recorded in meta and asserted on reopen).
Superseded generation directories accumulate one per fold and hold
only that fold's touched buckets; ``vacuum()`` drops the ones no meta
row references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.pipeline.graph import connected_components


class ClusterStore:
    def __init__(self, base_dir: str, n_buckets: int = 16):
        self.base = base_dir
        self.n_buckets = int(n_buckets)
        self._labels_root = f"{base_dir}/labels"
        self._meta = f"{base_dir}/meta"

    def _bucket(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def read_meta(self, spark: SparkSession):
        """Returns (last_batch_id, {bucket: current_path}) — per bucket,
        the snapshot path of the LATEST batch that touched it."""
        from pyspark.errors import AnalysisException

        try:
            rows = spark.read.parquet(self._meta).collect()
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return -1, {}
            raise
        if not rows:
            return -1, {}
        last_id = max(int(r["batch_id"]) for r in rows)
        stored_nb = {int(r["n_buckets"]) for r in rows}
        if stored_nb != {self.n_buckets}:
            raise ValueError(
                f"store was written with n_buckets={sorted(stored_nb)}, "
                f"reopened with {self.n_buckets} — bucket ids are derived "
                "from node hashes, so n_buckets is fixed for the store's "
                "lifetime"
            )
        current: dict[int, tuple[int, str]] = {}
        for r in rows:
            b = int(r["bucket"])
            if b < 0:  # no-op-batch fence sentinel
                continue
            bid = int(r["batch_id"])
            if b not in current or bid > current[b][0]:
                current[b] = (bid, r["path"])
        return last_id, {b: p for b, (_, p) in current.items()}

    def _read_labels(
        self, spark: SparkSession, bucket_paths: dict[int, str]
    ) -> DataFrame | None:
        if not bucket_paths:
            return None
        return spark.read.parquet(*bucket_paths.values()).select(
            "node", "component"
        )

    def labels(self, spark: SparkSession) -> DataFrame | None:
        """Current committed (node, component) labeling, or None before
        the first fold."""
        _, bucket_paths = self.read_meta(spark)
        return self._read_labels(spark, bucket_paths)

    # contracted graphs at or under this edge count close driver-side
    # (one collect + union-find) instead of spinning up the iterative
    # distributed closure — the mapping those edges produce is ALREADY
    # batch-bounded and broadcast, so collecting the edges themselves
    # adds no new scaling assumption; bigger batches fall back to the
    # distributed hash-min propagation
    DRIVER_CLOSE_MAX_EDGES = 1_000_000

    def _close(self, s: SparkSession, e: DataFrame) -> DataFrame:
        """(node, component=min id of its component) over contracted
        edges — driver union-find when the batch is small, distributed
        hash-min otherwise.  Identical output either way (min-root
        union preserves the min-label invariant)."""
        cap = self.DRIVER_CLOSE_MAX_EDGES
        head = e.limit(cap + 1).collect()
        if len(head) > cap:
            return connected_components(e, src="u", dst="v")
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in head:
            ra, rb = find(row["u"]), find(row["v"])
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # min root wins -> min-label components
        nodes = {row["u"] for row in head} | {row["v"] for row in head}
        node_t = e.schema["u"].dataType
        from pyspark.sql.types import StructField, StructType

        return s.createDataFrame(
            [(n, find(n)) for n in sorted(nodes)],
            StructType(
                [
                    StructField("node", node_t),
                    StructField("component", node_t),
                ]
            ),
        )

    def fold(self, pairs: DataFrame, batch_id: int) -> bool:
        """Fold one batch of near-dup pairs (id_a, id_b) into the stored
        labeling; returns False for a fenced replay."""
        s = pairs.sparkSession
        last_id, bucket_paths = self.read_meta(s)
        if int(batch_id) <= last_id:
            return False
        p = (
            pairs.select("id_a", "id_b")
            .where(F.col("id_a").isNotNull() & F.col("id_b").isNotNull())
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        labels = self._read_labels(s, bucket_paths)
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
        cc = self._close(s, e)
        if labels is not None:
            # old-rep -> new-component mapping; batch-bounded, broadcast
            mapping = cc.where(F.col("node") != F.col("component")).select(
                F.col("node").alias("__old__"),
                F.col("component").alias("__new__"),
            )
            # touched buckets: where a remapped component's members live
            # (column-pruned probe of the store) ∪ where new nodes land
            remap_bkts = {
                r["b"]
                for r in labels.join(
                    F.broadcast(mapping),
                    labels.component == F.col("__old__"),
                    "left_semi",
                )
                .select(self._bucket(F.col("node")).alias("b"))
                .distinct()
                .collect()
            }
            batch_nodes = (
                p.select(F.col("id_a").alias("node"))
                .unionByName(p.select(F.col("id_b").alias("node")))
                .distinct()
            )
            new_nodes = batch_nodes.join(labels, "node", "left_anti")
            new_bkts = {
                r["b"]
                for r in new_nodes.select(
                    self._bucket(F.col("node")).alias("b")
                )
                .distinct()
                .collect()
            }
            touched = sorted(remap_bkts | new_bkts)
            if not touched:
                # within-component pairs only: nothing changes — commit a
                # fence sentinel so the replay guard still advances
                self._commit_meta(s, batch_id, [])
                return True
            updated = (
                labels.where(
                    self._bucket(F.col("node")).isin(touched)
                )
                .join(
                    F.broadcast(mapping),
                    labels.component == F.col("__old__"),
                    "left",
                )
                .select(
                    "node",
                    F.coalesce("__new__", "component").alias("component"),
                )
            )
            new_labels = new_nodes.join(
                F.broadcast(cc.withColumnRenamed("component", "__c__")),
                "node",
                "left",
            ).select("node", F.coalesce("__c__", "node").alias("component"))
            final = updated.unionByName(new_labels)
        else:
            final = cc
            touched = None  # resolved from the written content below
        gen_dir = f"{self._labels_root}/gen_{int(batch_id)}"
        out = final.withColumn("bucket", self._bucket(F.col("node")))
        out.write.partitionBy("bucket").mode("overwrite").parquet(gen_dir)
        if touched is None:
            touched = sorted(
                r["bucket"]
                for r in s.read.parquet(gen_dir)
                .select("bucket")
                .distinct()
                .collect()
            )
        self._commit_meta(
            s,
            batch_id,
            [(b, f"{gen_dir}/bucket={b}") for b in touched],
        )
        return True

    def _commit_meta(
        self, s: SparkSession, batch_id: int, bucket_rows: list
    ) -> None:
        """Meta commits LAST and as ONE file (repartition(1) → single
        task-commit rename; NOT coalesce(1), whose single-partition
        local-relation write measures ~5 s against repartition's ~0.6),
        so a crash anywhere earlier in the fold re-surfaces the previous
        generation whole."""
        rows = bucket_rows or [(-1, None)]
        s.createDataFrame(
            [(int(batch_id), b, p, self.n_buckets) for b, p in rows],
            "batch_id long, bucket int, path string, n_buckets int",
        ).repartition(1).write.mode("append").parquet(self._meta)

    def vacuum(self, spark: SparkSession) -> int:
        """Best-effort removal of superseded per-bucket snapshot dirs (no
        meta row of the CURRENT resolution references them).  Returns the
        number of directories removed.  Callers must not hold DataFrames
        over old generations across a vacuum."""
        import glob
        import shutil

        _, current = self.read_meta(spark)
        keep = set(current.values())
        removed = 0
        for d in glob.glob(f"{self._labels_root}/gen_*/bucket=*"):
            if d not in keep:
                shutil.rmtree(d, ignore_errors=True)
                removed += 1
        return removed
