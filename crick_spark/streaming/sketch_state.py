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

def spacesaving_stream_topk(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 5,
    capacity: int = 50,
) -> DataFrame:
    """Per-key streaming heavy hitters: each group key holds one
    Space-Saving summary (state = O(capacity) counters,
    ``crick/space_saving_stubs.c.in:75-95``) in the state store; every
    micro-batch folds its rows in and emits the current top-k with error
    bounds.

    Uses ``applyInPandasWithState``; the Spark 4.x
    ``transformWithStateInPandas`` port is mechanical (ValueState instead
    of GroupState) but that API needs protobuf at runtime, which this
    container lacks — gated off rather than shipped untested."""
    from crick_spark.sketches import SpaceSaving

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("rank", LongType()),
            StructField("item", LongType()),
            StructField("cnt", LongType()),
            StructField("error", LongType()),
        ]
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sk = pickle.loads(bytes.fromhex(state.get[0]))
        else:
            sk = SpaceSaving(capacity=capacity)
        for pdf in pdfs:
            sk.add_batch(pdf[item_col].to_numpy(np.int64))
        state.update((pickle.dumps(sk).hex(),))
        top = sk.topk(k)
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "rank": np.arange(1, len(top) + 1, dtype=np.int64),
                "item": [t[0] for t in top],
                "cnt": [t[1] for t in top],
                "error": [t[2] for t in top],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
