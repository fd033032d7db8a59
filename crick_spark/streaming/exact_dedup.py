"""Exact incremental dedup with first-batch attribution — the exact
twin of :mod:`bloom_dedup`.

``BloomDedupStore`` bounds state (n_bits/8 bytes forever) at the price
of one-sided error; THIS store is the other point on the trade: state
grows with the distinct-key universe, but every answer is exact and each
key carries the batch that first introduced it — the provenance a
training-data pipeline needs to answer "which crawl snapshot first
contributed this document/frame/hash?".

Layout = the commit protocol.  Keys live under
``store/bucket={h}/batch={b}/`` — partitioned by a stable key-hash
bucket AND the introducing batch:

- **Fold** (one per micro-batch, in batch order): distinct the batch's
  keys, read ONLY the resident rows of the touched buckets with
  ``batch < batch_id`` (partition pruning on both columns — a fold
  never opens unrelated buckets or its own replayed output), anti-join,
  and write survivors via dynamic-partition overwrite of exactly the
  (touched bucket, this batch) partitions.
- **Idempotence**: a replay recomputes the same touched set from the
  same batch content and overwrites the same partitions with the same
  rows; the ``batch < batch_id`` resident filter means a half-written
  previous attempt is invisible to its own replay.  No meta file is
  needed — the partition VALUES are the commit record (contrast
  bloom_dedup's driver-side meta snapshot, which exists because a Bloom
  filter is one blob, not a keyed table).
- **100 TB shape**: the anti-join shuffles only the batch's distinct
  keys plus the touched buckets' resident keys; ``n_buckets`` caps the
  resident fraction any batch drags in (pick ≈ corpus_keys /
  executor-memory-sized bucket).  Nothing scales with total history
  except the pruned bucket reads.

Order contract: ``fold`` must be called in nondecreasing ``batch_id``
order (Structured Streaming's foreachBatch guarantee; driver loops must
preserve it) — attribution is first-CALLED-batch wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactDedupStore:
    def __init__(self, path: str, key_col: str = "key", n_buckets: int = 64):
        self.path = path
        self.key_col = key_col
        self.n_buckets = int(n_buckets)

    def _resident(self, spark: SparkSession, before_batch: int) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            df = spark.read.option("basePath", self.path).parquet(self.path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return None  # first fold: nothing resident yet
            raise
        return df.where(F.col("batch") < F.lit(int(before_batch)))

    def fold(self, batch_df: DataFrame, batch_id: int) -> dict:
        """Fold one micro-batch; returns per-fold stats
        (``batch_id, n_keys, n_new``).  Emitted = first-seen only."""
        spark = batch_df.sparkSession
        bid = int(batch_id)
        # ONE materialization of the batch scan: the touched-bucket
        # collect, n_keys, the anti-join, and the write all read this
        # truncated relation instead of each re-running the upstream
        # batch plan (the module's "folds read O(touched buckets)" cost
        # claim now holds without callers checkpointing upstream)
        keys = (
            batch_df.select(F.col(self.key_col).alias("key"))
            .where(F.col("key").isNotNull())
            .distinct()
            .withColumn(
                "bucket", F.pmod(F.xxhash64("key"), F.lit(self.n_buckets))
            )
            .localCheckpoint(eager=True)
        )
        # the touched-bucket set is derived from batch CONTENT, so a
        # replay prunes to the same partitions it overwrites
        touched = [r["bucket"] for r in keys.select("bucket").distinct().collect()]
        if not touched:
            return {"batch_id": bid, "n_keys": 0, "n_new": 0}
        resident = self._resident(spark, bid)
        new = keys
        if resident is not None:
            seen = resident.where(F.col("bucket").isin(touched)).select(
                "bucket", "key"
            )
            new = keys.join(seen, ["bucket", "key"], "left_anti")
        n_keys = keys.count()
        out = new.withColumn("batch", F.lit(bid))
        (
            out.repartition("bucket")
            .write.partitionBy("bucket", "batch")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(self.path)
        )
        # survivors counted from the partitions just written (pruned to
        # (touched bucket, this batch)) — residents are read exactly
        # once per fold, by the write above
        n_new = (
            spark.read.option("basePath", self.path)
            .parquet(self.path)
            .where((F.col("batch") == bid) & F.col("bucket").isin(touched))
            .count()
        )
        return {"batch_id": bid, "n_keys": n_keys, "n_new": n_new}

    def delete(self, keys_df: DataFrame) -> dict:
        """Right-to-be-forgotten over the store (r13): remove the listed
        keys by rewriting ONLY the (bucket, batch) partitions that
        contain them — the erasure twin of ``fold``, same commit
        protocol.  Semantics: a deleted key loses its first-batch
        attribution entirely; if the same content is folded again later
        it is attributed to the re-ingesting batch (the store FORGETS,
        which is exactly what erasure compliance requires).  Idempotent:
        a replay finds no resident matches and writes nothing.

        **Erasure is guaranteed only after a successful return** (ADVICE
        r13): the dynamic overwrite and the Hadoop-FS removal of
        fully-emptied (bucket, batch) dirs are two steps, so a crash
        between them leaves deleted keys resident.  Compliance callers
        MUST treat any failure as not-yet-erased and replay ``delete``
        — the replay re-finds surviving matches (or no-ops on the
        already-clean state) and completes the removal.

        Returns ``{"n_deleted", "partitions_touched"}``."""
        spark = keys_df.sparkSession
        keys = (
            keys_df.select(F.col(self.key_col).alias("key"))
            .where(F.col("key").isNotNull())
            .distinct()
            .withColumn(
                "bucket", F.pmod(F.xxhash64("key"), F.lit(self.n_buckets))
            )
            .localCheckpoint(eager=True)
        )
        resident = self._resident(spark, before_batch=1 << 62)
        if resident is None:
            return {"n_deleted": 0, "partitions_touched": []}
        hits = resident.join(keys, ["bucket", "key"]).select("bucket", "batch")
        probe = hits.groupBy("bucket", "batch").agg(F.count("*").alias("n")).collect()
        touched = sorted((int(r["bucket"]), int(r["batch"])) for r in probe)
        n_deleted = int(sum(r["n"] for r in probe))
        if not touched:
            return {"n_deleted": 0, "partitions_touched": []}
        from functools import reduce

        in_touched = reduce(
            lambda a, b: a | b,
            [
                (F.col("bucket") == bkt) & (F.col("batch") == ba)
                for bkt, ba in touched
            ],
        )
        survivors = (
            resident.where(in_touched)
            .join(keys.select("bucket", "key"), ["bucket", "key"], "left_anti")
            .localCheckpoint(eager=True)  # break lineage before overwrite
        )
        alive = {
            (int(r["bucket"]), int(r["batch"]))
            for r in survivors.select("bucket", "batch").distinct().collect()
        }
        if alive:
            (
                survivors.repartition("bucket")
                .write.partitionBy("bucket", "batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(self.path)
            )
        emptied = [t for t in touched if t not in alive]
        if emptied:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()
            for b, ba in emptied:
                p = jvm.org.apache.hadoop.fs.Path(
                    f"{self.path}/bucket={b}/batch={ba}"
                )
                fs = p.getFileSystem(hconf)
                if fs.exists(p):
                    fs.delete(p, True)
        return {"n_deleted": n_deleted, "partitions_touched": touched}

    def keys(self, spark: SparkSession) -> DataFrame:
        """All keys ever admitted, with first-batch attribution:
        ``(key, first_batch)``.  Each key lives in exactly one batch
        partition (the anti-join guarantees it), so this is a read, not
        an aggregation."""
        df = spark.read.option("basePath", self.path).parquet(self.path)
        return df.select(
            "key", F.col("batch").cast("int").alias("first_batch")
        )
