"""Sketches as custom streaming state — the crick-on-Spark streaming story.

Each group key holds one pickled sketch in the state store
(``applyInPandasWithState``); every micro-batch folds its Arrow batches
into the state sketch (crick ``update``), and emits the current finalized
result (crick ``quantile``/``topk``).  State size is the sketch bound —
≤ 2·ceil(compression) centroids per key (``crick/tdigest_stubs.c:65``) —
so per-key state is KBs regardless of stream length, and the watermark
timeout reaps idle keys.

This is exactly the role crick plays inside dask's streaming reductions
(SURVEY §3.3), with Spark's state store replacing dask's scheduler.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crick_spark.sketches import TDigest

STATE_SCHEMA = StructType([StructField("blob", StringType())])


def tdigest_stream_quantiles(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    compression: float = 100.0,
    watermark: str | None = None,
) -> DataFrame:
    """Per-key running t-digest over a stream; emits (key, n, p…) each
    micro-batch with the digest's lifetime-so-far estimates."""
    out_fields = [
        StructField("key", StringType()),
        StructField("n", LongType()),
    ] + [
        StructField(f"p{str(q).replace('.', '_')}", DoubleType()) for q in qs
    ]
    out_schema = StructType(out_fields)

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            digest = pickle.loads(bytes.fromhex(state.get[0]))
        else:
            digest = TDigest(compression=compression)
        for pdf in pdfs:
            digest = digest.merge(
                TDigest.from_values(
                    pdf[value_col].to_numpy(np.float64), compression=compression
                )
            )
        state.update((pickle.dumps(digest).hex(),))
        row = {"key": key[0], "n": int(digest.size())}
        for q in qs:
            row[f"p{str(q).replace('.', '_')}"] = float(digest.quantile(q))
        yield pd.DataFrame([row])

    src = events.withWatermark("ts", watermark) if watermark else events
    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
