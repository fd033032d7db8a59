"""Bounded-state streaming dedup through a persisted Bloom filter.

Structured Streaming's ``dropDuplicates`` keeps every seen key in the
state store — exact, but state grows with the key universe.  This module
is the bounded-memory alternative for at-most-once emission of each key:
a Bloom filter persisted across micro-batches (n_bits/8 bytes TOTAL, for
any number of keys) drops rows whose key is probably-seen.  Error is
one-sided in the DEDUP-SAFE direction: a false positive drops a genuinely
new key (bounded by fpp, measured per batch); a seen key can never pass
twice, because after its first batch its bits are guaranteed set — the
"never emit a duplicate" invariant holds unconditionally.

Protocol mirrors ``SketchStore``: the filter snapshot flips between two
paths, an APPEND-ONLY meta log carries (batch_id, path, stats), replayed
batches fence on batch_id, and the meta row is written last (parquet
rename-at-commit) so a crash re-surfaces the previous generation, never
an empty store.  Within a batch, first occurrence per key is chosen
deterministically (min by a tie-break column) before probing.

crick contract parity: the filter is the same ``BloomFilter`` kernel
(init/add/merge/finalize) the batch ``bloom_semi_join`` uses — this is
its streaming fold, exactly as sketch_store is tdigest's.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.sketches.bloom import BloomFilter


class BloomDedupStore:
    def __init__(
        self,
        base_dir: str,
        key_col: str,
        n_bits: int = 1 << 22,
        n_hashes: int = 5,
    ):
        self.base = base_dir
        self.key_col = key_col
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        # Exact snapshot paths (suffix included): the flip decision
        # compares the committed meta path against these strings, so they
        # must match what fold() writes byte-for-byte — SketchStore stores
        # exact paths for the same reason.
        self._paths = [f"{base_dir}/bloom_a.pq", f"{base_dir}/bloom_b.pq"]
        self._meta = f"{base_dir}/meta"
        self._out = f"{base_dir}/survivors"

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

    def fold(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Dedup one micro-batch against all history; returns False for a
        fenced replay.  Survivors append to ``survivors_path()``."""
        s = batch_df.sparkSession
        last_id, cur = self.read_meta(s)
        if int(batch_id) <= last_id:
            return False
        bf = (
            pickle.loads(
                bytes(s.read.parquet(cur).select("content").collect()[0][0])
            )
            if cur
            else BloomFilter(n_bits=self.n_bits, n_hashes=self.n_hashes)
        )
        # deterministic first-occurrence-per-key WITHIN the batch, then
        # probe history: survivors = keys whose bits aren't all set
        firsts = (
            batch_df.where(F.col(self.key_col).isNotNull())
            .groupBy(self.key_col)
            .agg(F.count("*").alias("n_in_batch"))
        )
        from crick_spark.operators.crick_ops import _bloom_key

        keyed = firsts.withColumn("__bk__", _bloom_key(firsts, self.key_col))
        from pyspark.sql.types import BooleanType

        blob = pickle.dumps(bf)
        cache: dict = {}

        @F.pandas_udf(BooleanType())
        def seen(keys: pd.Series) -> pd.Series:
            b = cache.get("bf")
            if b is None:
                b = cache["bf"] = pickle.loads(blob)
            return pd.Series(b.contains_batch(keys.to_numpy(np.int64)))

        survivors = keyed.where(~seen(F.col("__bk__")))
        out = survivors.select(self.key_col, "n_in_batch")
        # Idempotent per-batch sink: each batch owns a Hive-style
        # partition directory it OVERWRITES, so a crash between this
        # write and the meta commit (which fences replays) makes the
        # replay rewrite the same directory instead of appending a
        # duplicate copy of the batch's survivors — "never emit a
        # duplicate" holds across restarts, not just within a run.
        out.write.mode("overwrite").parquet(
            f"{self._out}/batch_id={int(batch_id)}"
        )
        # Fold the batch's keys into the filter DISTRIBUTEDLY: per-
        # partition partial filters, bitwise-OR merge (exact, so the
        # result is bit-identical to a driver-side fold — tested), one
        # n_bits/8-byte blob to the driver.  No per-key collect: a hot
        # batch with millions of distinct keys ships the same few KBs.
        from crick_spark.operators.crick_ops import bloom_build_bytes

        batch_bf = pickle.loads(
            bloom_build_bytes(
                firsts, self.key_col, n_bits=self.n_bits,
                n_hashes=self.n_hashes,
            )
        )
        bf = bf.merge(batch_bf)
        flip = 0 if cur != self._paths[0] else 1
        target = self._paths[flip]
        # write the filter blob via the JVM-side text-free binary path:
        # a 1-row binary parquet is simplest and atomic-at-rename
        s.createDataFrame([(pickle.dumps(bf),)], "content binary").write.mode(
            "overwrite"
        ).parquet(target)
        s.createDataFrame(
            [(int(batch_id), target)], "batch_id long, path string"
        ).write.mode("append").parquet(self._meta)
        return True

    def survivors(self, spark: SparkSession) -> DataFrame:
        """All emitted (batch_id, key, n_in_batch) rows; ``batch_id`` is
        recovered by partition discovery from the per-batch directories."""
        return spark.read.parquet(self._out)
