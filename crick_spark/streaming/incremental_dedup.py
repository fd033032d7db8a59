"""Streaming incremental near-duplicate detection — dedup-against-history.

The production pattern for continuous training-data ingestion: documents
arrive in micro-batches, and each batch must be checked for near-duplicates
both *within itself* and *against everything already ingested* — without
ever rescanning the historical corpus.

Mechanics (same sketch algebra as the batch path, ``pipeline/dedup.py``):
per batch, MinHash signatures → LSH band buckets; the batch's buckets
equi-join the accumulated bucket store (parquet, ~bands × 16 B per doc —
the *sketch* of history, never its text) for cross-batch candidates, plus
one self-join for within-batch candidates; then the batch's buckets are
written to the store.  Because signatures and buckets are deterministic
per document (independent of batching), the union of candidates over any
batch split equals the single-batch LSH candidate set exactly — asserted
in tests.

State semantics: both the bucket store and the pairs sink are partitioned
by ``batch_id`` and written with dynamic partition OVERWRITE, so a
replayed micro-batch (foreachBatch is at-least-once) rewrites its own
partition instead of appending a second copy — the store stays exactly
one row per (doc, band) and cross-batch join fan-out cannot inflate on
retry.

All filesystem probes go through the Hadoop FileSystem API
(`_store_has_data`), never ``os.path`` — on a real cluster the store
lives on object storage (s3a://, hdfs://) where driver-local ``os.*``
checks always return False and would silently drop every vs-history
candidate.

100 TB shape: per micro-batch work is |batch| × bands bucket rows joined
against a bucket store that is bands × 16 B per historical doc (e.g.
~256 GB of store per billion docs — a partitioned parquet join, not a
corpus scan); the historical text is never read again.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.pipeline.dedup import band_buckets, minhash_signatures
from crick_spark.tmpdirs import run_tmpdir


def _store_has_data(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and contains at least one data file,
    probed through the Hadoop FileSystem for the path's own scheme
    (file:, hdfs://, s3a://, ...) — NOT the driver's local filesystem.

    ``os.path.isdir`` on an object-store URI is always False on a
    cluster, which would silently disable the vs-history join — the
    whole point of the operator.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    if not fs.exists(p):
        return False
    it = fs.listFiles(p, True)  # recursive: data lives under batch_id=N/
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.startswith("part-") or name.endswith(".parquet"):
            return True
    return False


def _pair_cols(id_col: str):
    a, b = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    return (
        F.least(a, b).alias("id_a"),
        F.greatest(a, b).alias("id_b"),
    )


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    state_dir: str,
    pairs_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    batch_id: int = 0,
    cluster_store=None,
) -> None:
    """Fold one micro-batch into the dedup state: emit candidate pairs
    (within-batch + vs-history) to ``pairs_dir``, write the batch's band
    buckets to ``state_dir``.

    Idempotent per ``batch_id``: both sinks are partitioned by batch id
    and dynamically overwritten, so replaying a micro-batch (foreachBatch
    delivers at-least-once) cannot duplicate state rows or pairs.

    ``cluster_store`` (a ``streaming.cluster_store.ClusterStore``)
    closes the loop from pairs to CLUSTERS in the same micro-batch: the
    batch's candidate pairs are folded into the persisted
    (node, component) labeling — contracted-graph closure, O(|batch|)
    work, exactly equivalent to re-closing all history (see the store's
    module docstring).  The store fences on the same ``batch_id``, so a
    replay that rewrites the pairs partition is a no-op on the labels.
    """
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(batch, id_col, text_col, num_perm)
    bb = band_buckets(sigs, id_col, "minhash", bands, rows_per_band)
    bb.cache()
    a, b = bb.alias("a"), bb.alias("b")
    within = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(*_pair_cols(id_col))
    pairs = within
    if _store_has_data(spark, state_dir):
        hist = (
            spark.read.parquet(state_dir)
            .select(id_col, "band", "bucket")
            .alias("b")
        )
        cross = (
            bb.alias("a")
            .join(
                hist,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            )
            .select(*_pair_cols(id_col))
        )
        pairs = pairs.unionByName(cross)
    pairs = pairs.distinct()
    if cluster_store is not None:
        # materialize once: the pair set feeds BOTH the pairs sink and
        # the label fold; without this the band joins would run twice
        pairs = pairs.localCheckpoint(eager=True)
    (
        pairs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(pairs_dir)
    )
    if cluster_store is not None:
        cluster_store.fold(pairs, int(batch_id))
    (
        bb.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )
    bb.unpersist()


def incremental_near_dup_candidates(
    spark: SparkSession,
    docs_stream: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    work_dir: str | None = None,
    with_clusters: bool = False,
) -> DataFrame:
    """Drive a documents stream through the incremental dedup with an
    availableNow foreachBatch and return the accumulated DISTINCT
    candidate pairs (id_a < id_b).  Equals the batch
    ``lsh_candidate_pairs`` over the same corpus regardless of how the
    stream was micro-batched.

    ``with_clusters=True`` additionally maintains the persisted
    (node, component) labeling per micro-batch (``ClusterStore`` under
    ``work_dir/clusters``) and returns it INSTEAD of the pairs — the
    full continuous-curation loop: stream → signatures → candidate
    pairs vs history → incrementally-closed dedup clusters, with no
    step ever rescanning history."""

    work = work_dir or run_tmpdir("crick_incdedup_")
    state_dir = f"{work}/buckets"
    pairs_dir = f"{work}/pairs"
    store = None
    if with_clusters:
        from crick_spark.streaming.cluster_store import ClusterStore

        store = ClusterStore(f"{work}/clusters")

    def fold(batch: DataFrame, bid: int) -> None:
        process_batch(
            spark,
            batch,
            id_col,
            text_col,
            state_dir,
            pairs_dir,
            num_perm,
            bands,
            batch_id=bid,
            cluster_store=store,
        )

    q = (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{work}/ckpt_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if with_clusters:
        labels = store.labels(spark)
        if labels is not None:
            return labels
        from pyspark.sql.types import StructField, StructType

        id_type = docs_stream.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", id_type),
                    StructField("component", id_type),
                ]
            ),
        )
    if not _store_has_data(spark, pairs_dir):
        from pyspark.sql.types import StructField, StructType

        id_type = docs_stream.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [StructField("id_a", id_type), StructField("id_b", id_type)]
            ),
        )
    return spark.read.parquet(pairs_dir).select("id_a", "id_b").distinct()
