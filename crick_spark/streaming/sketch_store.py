"""Persisted sketch store maintained by a micro-batch stream.

The streaming materialized-view pattern for SKETCH state (the streaming
twin of the batch ``incremental_sketch_merge`` contract,
crick/tdigest.pyx:310-324): each micro-batch folds its t-digest partials
and HLL registers into a parquet store — per batch the store reads back
KBs of sketch state, never history rows.

Restart/replay safety: foreachBatch re-executes batches after failures,
so ``fold`` fences on batch_id (an already-folded id is a no-op — a
second ingest would double the digest mass), and ALL store coordinates
live on disk in a meta file written LAST (the commit point): a crash
before the meta write leaves the store on the previous snapshots and the
replay re-folds cleanly onto the same flip path.  Snapshots alternate
between two paths so a batch never reads the file it is overwriting.
Production swaps the file-flip protocol for a transactional table
format; the batch-id fencing and read-state-from-disk shape is the
pattern.
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from crick_spark.operators.crick_ops import tdigest_agg
from crick_spark.operators.sketch_agg import SketchOps, merge_sketches

_BLOB_SCHEMA = StructType([StructField("sketch", BinaryType())])
_MERGE_OPS = SketchOps(build=None, merge=lambda a, b: a.merge(b))


def _to_blob(sk) -> pd.DataFrame:
    return pd.DataFrame([{"sketch": pickle.dumps(sk)}])


class SketchStore:
    """Per-group t-digest + HLL state under ``base_dir``, folded one
    micro-batch at a time; see module docstring for the protocol."""

    def __init__(
        self,
        base_dir: str,
        value_col: str = "value",
        key_col: str = "user_id",
        by: list[str] | None = None,
        lg_k: int = 14,
        retention_days: int | None = None,
        ts_col: str = "ts",
    ):
        """``retention_days`` (round 6): when set, state is kept as
        PER-DAY partials (day from ``ts_col``) and every fold drops days
        older than ``max_day - retention_days + 1`` — the store's size
        is bounded at groups × retention_days sketch rows no matter how
        long the stream replays, and reads answer over the sliding
        window.  When None (default) the store keeps one merged sketch
        per group — the all-time aggregate, the pre-round-6 behavior.
        Same per-day-partial layout as ``tdigest_decayed_quantiles``."""
        self.base = base_dir
        self.value_col = value_col
        self.key_col = key_col
        self.by = by or ["event_type"]
        self.lg_k = lg_k
        self.retention_days = retention_days
        self.ts_col = ts_col
        self._td_paths = [f"{base_dir}/td_a", f"{base_dir}/td_b"]
        self._hll_paths = [f"{base_dir}/hll_a", f"{base_dir}/hll_b"]
        self._meta = f"{base_dir}/meta"

    def read_meta(self, spark: SparkSession):
        """(last_batch_id, td_path, hll_path) from disk; (-1, None, None)
        for a fresh store.  ONLY a missing meta path means fresh — any
        other read error (transient FS failure, corrupt file) must
        propagate so foreachBatch retries the batch, because treating it
        as fresh would silently discard all accumulated state AND disable
        the replay fence.

        The meta log is APPEND-ONLY (one row per committed batch); the
        current generation is the row with max(batch_id).  An
        overwrite-in-place meta would delete the old commit before the
        new one lands — a crash in that window would read as 'fresh
        store' and silently drop all state; append never deletes, so
        every crash point leaves either the old max row or the new one."""
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
                return -1, None, None
            raise
        if rows:
            r = rows[0]
            return int(r["batch_id"]), r["td"], r["hll"]
        return -1, None, None

    def fold(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Fold one micro-batch; returns False for a fenced replay."""
        s = batch_df.sparkSession
        last_id, td_cur, hll_cur = self.read_meta(s)
        if int(batch_id) <= last_id:
            return False
        # write to the path NOT currently referenced by meta — derived
        # from the store state, not from batch-id parity, so batch ids
        # need not be contiguous (fold(0) then fold(2) is fine); a
        # crash-retry of the same batch re-targets the same free path
        flip = 0 if td_cur != self._td_paths[0] else 1
        retained = self.retention_days is not None
        if retained:
            batch_df = batch_df.withColumn(
                "__day__", F.to_date(F.col(self.ts_col))
            )
        td_by = self.by + (["__day__"] if retained else [])
        td_new = tdigest_agg(batch_df, self.value_col, by=td_by)
        if td_cur is not None:
            td_new = s.read.parquet(td_cur).unionByName(td_new)
        compact = merge_sketches(
            td_new, _MERGE_OPS, td_by, _to_blob, _BLOB_SCHEMA
        )
        hll_new = batch_df.groupBy(*td_by).agg(
            F.hll_sketch_agg(self.key_col, F.lit(self.lg_k)).alias("hsk")
        )
        if hll_cur is not None:
            hll_new = (
                s.read.parquet(hll_cur)
                .unionByName(hll_new)
                .groupBy(*td_by)
                .agg(F.hll_union_agg("hsk").alias("hsk"))
            )
        if retained:
            # sliding-window TTL: drop day-partials older than the newest
            # retained day, via an in-plan max-day window over the tiny
            # partial relation (groups × days rows) — no driver collect.
            # State is bounded at groups × retention_days rows forever.
            from pyspark.sql.window import Window

            w = Window.partitionBy(F.lit(1))
            keep = F.datediff(
                F.max("__day__").over(w), F.col("__day__")
            ) < F.lit(int(self.retention_days))
            compact = compact.withColumn("__keep__", keep).where(
                "__keep__"
            ).drop("__keep__")
            hll_new = hll_new.withColumn("__keep__", keep).where(
                "__keep__"
            ).drop("__keep__")
        td_t = self._td_paths[flip]
        compact.write.mode("overwrite").parquet(td_t)
        hll_t = self._hll_paths[flip]
        hll_new.write.mode("overwrite").parquet(hll_t)
        # append-only commit marker: the new row lands (or doesn't) via
        # parquet's rename-at-commit; the previous generation's row is
        # never deleted, so a crash mid-commit can only re-surface the
        # old max(batch_id) row — never an empty 'fresh' store.  The
        # 1-row local relation already writes a single file — coalesce(1)
        # here cost ~4.5 s/batch (it forces a multi-partition physical
        # plan and a scheduler locality wait; measured round 6)
        s.createDataFrame(
            [(int(batch_id), td_t, hll_t)],
            "batch_id long, td string, hll string",
        ).write.mode("append").parquet(self._meta)
        return True

    def digests(self, spark: SparkSession, finalize, result_schema) -> DataFrame:
        """Merge + finalize the stored digests (one row per group)."""
        _, td_final, _ = self.read_meta(spark)
        if td_final is None:
            raise ValueError("sketch store is empty: no committed batches")
        return merge_sketches(
            spark.read.parquet(td_final),
            _MERGE_OPS,
            self.by,
            finalize,
            result_schema,
        )

    def hll_estimates(self, spark: SparkSession) -> DataFrame:
        """(by…, est_stream) from the stored HLL registers (per-day
        partials union-agg per group first under retention — HLL union
        is lossless, so the windowed estimate equals a direct HLL over
        the retained days)."""
        _, _, hll_final = self.read_meta(spark)
        if hll_final is None:
            raise ValueError("sketch store is empty: no committed batches")
        df = spark.read.parquet(hll_final)
        if self.retention_days is not None:
            df = df.groupBy(*self.by).agg(F.hll_union_agg("hsk").alias("hsk"))
        return df.select(
            *self.by, F.hll_sketch_estimate("hsk").alias("est_stream")
        )
