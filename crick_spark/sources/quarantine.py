"""Dead-letter ingestion sink: good rows and corrupt raw lines, split
idempotently per batch.

``source_jsonl_corrupt_records`` proves Spark's malformed-record READ
modes; a 100 TB pipeline must also PERSIST the bad rows for
reprocessing — the dead-letter (quarantine-table) pattern.  This sink
parses each micro-batch of raw JSON lines once, routes parsed rows to a
``good`` table and unparseable raw lines (verbatim, so they can be
repaired and replayed later) to a ``quarantine`` table, and commits
idempotently:

* each batch OVERWRITES its own Hive-style ``batch_id=N`` partition
  directory in BOTH tables — a crash-replay rewrites the same
  directories instead of appending a second copy (the BloomDedupStore
  sink pattern);
* the meta row commits LAST via a driver-side pyarrow write + atomic
  ``os.replace`` (zero Spark jobs — the ClusterStore protocol) and
  fences replayed batch ids, so the split is exactly-once end to end.

Parsing happens ONCE per batch: ``from_json`` in PERMISSIVE mode with a
corrupt-record column, one localCheckpoint of the batch-bounded parsed
relation, then the two partition writes read the materialization —
never a second parse of the raw lines.  The meta protocol requires a
driver-local ``base_dir`` and refuses remote schemes at construction
(swap the commit for a conditional-put on object stores).

crick parity note: the reference has no streaming surface; this is
pipeline infrastructure the brief's training-data track calls for
(quarantine write path, r10 VERDICT #5).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crick_spark.streaming.fsutil import local_meta_path


class QuarantineSink:
    def __init__(
        self,
        base_dir: str,
        schema: str,
        value_col: str = "value",
        corrupt_col: str = "_bad",
    ):
        local = local_meta_path(base_dir, "QuarantineSink")  # raises remote
        self.schema = schema
        self.value_col = value_col
        self.corrupt_col = corrupt_col
        self._meta_local = f"{local}/meta"
        self._good = f"{base_dir}/good"
        self._quarantine = f"{base_dir}/quarantine"

    # -- meta protocol (driver-local, zero Spark jobs) -------------------

    def _meta_files(self) -> list[tuple[int, str]]:
        try:
            names = os.listdir(self._meta_local)
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if not (n.startswith("part-") and n.endswith(".parquet")):
                continue
            try:
                out.append((int(n.split("-")[1]), n))
            except (IndexError, ValueError):
                continue
        return sorted(out)

    def read_meta(self) -> tuple[int, dict]:
        """(last committed batch_id, its {n_good, n_quarantined}), or
        (-1, {}) for a fresh sink."""
        import pyarrow.parquet as pq

        files = self._meta_files()
        if not files:
            return -1, {}
        bid, name = files[-1]
        t = pq.read_table(os.path.join(self._meta_local, name))
        return bid, {
            "n_good": int(t.column("n_good")[0].as_py()),
            "n_quarantined": int(t.column("n_quarantined")[0].as_py()),
        }

    def _commit_meta(self, batch_id: int, n_good: int, n_bad: int) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self._meta_local, exist_ok=True)
        name = f"part-{int(batch_id):09d}-{uuid.uuid4().hex}.parquet"
        table = pa.table(
            {
                "batch_id": pa.array([int(batch_id)], pa.int64()),
                "n_good": pa.array([int(n_good)], pa.int64()),
                "n_quarantined": pa.array([int(n_bad)], pa.int64()),
            }
        )
        tmp = os.path.join(self._meta_local, f".{name}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self._meta_local, name))

    # -- the ingest fold --------------------------------------------------

    def ingest(self, lines_df: DataFrame, batch_id: int) -> bool:
        """Split one micro-batch of raw lines; returns False for a fenced
        replay.  Good parsed rows land in ``good/batch_id=N``, corrupt
        raw lines land verbatim in ``quarantine/batch_id=N``."""
        last_id, _ = self.read_meta()
        if int(batch_id) <= last_id:
            return False
        full = f"{self.schema}, {self.corrupt_col} string"
        parsed = (
            lines_df.select(
                F.col(self.value_col).alias("__raw__"),
                F.from_json(
                    F.col(self.value_col),
                    full,
                    {
                        "mode": "PERMISSIVE",
                        "columnNameOfCorruptRecord": self.corrupt_col,
                    },
                ).alias("__p__"),
            )
            .select("__raw__", "__p__.*")
            # batch-bounded materialization: both partition writes below
            # read this, so the raw lines parse exactly once per batch
            .localCheckpoint(eager=True)
        )
        bad_mask = F.col(self.corrupt_col).isNotNull()
        good = parsed.where(~bad_mask).drop("__raw__", self.corrupt_col)
        good.write.mode("overwrite").parquet(
            f"{self._good}/batch_id={int(batch_id)}"
        )
        quarantined = parsed.where(bad_mask).select(
            F.col("__raw__").alias("raw"),
            F.length("__raw__").alias("raw_len"),
        )
        quarantined.write.mode("overwrite").parquet(
            f"{self._quarantine}/batch_id={int(batch_id)}"
        )
        # stats for the meta row: ONE agg over the materialized batch
        # (the writes above consumed the same checkpoint, so totals and
        # written rows agree by construction); the meta row — which
        # fences replays — commits last
        row = parsed.agg(
            F.count("*").alias("n"),
            F.sum(bad_mask.cast("long")).alias("nb"),
        ).collect()[0]
        n_bad = int(row["nb"] or 0)
        self._commit_meta(batch_id, int(row["n"]) - n_bad, n_bad)
        return True

    def good(self, spark: SparkSession) -> DataFrame:
        """All committed good rows (``batch_id`` recovered by partition
        discovery)."""
        return spark.read.parquet(self._good)

    def quarantined(self, spark: SparkSession) -> DataFrame:
        """All quarantined raw lines, verbatim — the reprocessing feed:
        repair upstream, then replay the lines through ``ingest`` under
        a NEW batch_id."""
        return spark.read.parquet(self._quarantine)
