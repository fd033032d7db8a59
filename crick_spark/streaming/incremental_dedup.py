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
appended to the store.  Because signatures and buckets are deterministic
per document (independent of batching), the union of candidates over any
batch split equals the single-batch LSH candidate set exactly — asserted
in tests.

100 TB shape: per micro-batch work is |batch| × bands bucket rows joined
against a bucket store that is bands × 16 B per historical doc (e.g.
~256 GB of store per billion docs — a partitioned parquet join, not a
corpus scan); the historical text is never read again.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.pipeline.dedup import band_buckets, minhash_signatures


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
) -> None:
    """Fold one micro-batch into the dedup state: emit candidate pairs
    (within-batch + vs-history) to ``pairs_dir``, append the batch's band
    buckets to ``state_dir``."""
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
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        hist = spark.read.parquet(state_dir).alias("b")
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
    pairs.distinct().write.mode("append").parquet(pairs_dir)
    bb.write.mode("append").parquet(state_dir)
    bb.unpersist()


def incremental_near_dup_candidates(
    spark: SparkSession,
    docs_stream: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    work_dir: str | None = None,
) -> DataFrame:
    """Drive a documents stream through the incremental dedup with an
    availableNow foreachBatch and return the accumulated DISTINCT
    candidate pairs (id_a < id_b).  Equals the batch
    ``lsh_candidate_pairs`` over the same corpus regardless of how the
    stream was micro-batched."""
    import tempfile

    work = work_dir or tempfile.mkdtemp(prefix="crick_incdedup_")
    state_dir = f"{work}/buckets"
    pairs_dir = f"{work}/pairs"

    def fold(batch: DataFrame, _bid: int) -> None:
        process_batch(
            spark, batch, id_col, text_col, state_dir, pairs_dir, num_perm, bands
        )

    q = (
        docs_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", f"{work}/ckpt_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if not os.path.isdir(pairs_dir):
        from pyspark.sql.types import StructField, StructType

        id_type = docs_stream.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [StructField("id_a", id_type), StructField("id_b", id_type)]
            ),
        )
    return spark.read.parquet(pairs_dir).distinct()
