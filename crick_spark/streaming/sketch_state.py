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

    Uses ``applyInPandasWithState``; the Spark 4.x port is
    ``spacesaving_stream_topk_tws`` below (ValueState instead of
    GroupState), gated on the protobuf runtime probe ``tws_available``."""
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


# ---------------------------------------------------------------------------
# Spark 4.x transformWithStateInPandas port
# ---------------------------------------------------------------------------
def tws_available() -> tuple[bool, str]:
    """Runtime probe for the transformWithStateInPandas prerequisites.

    The TWS Python worker speaks a protobuf protocol to the JVM state
    server (pyspark.sql.streaming.proto imports google.protobuf), so the
    API exists but cannot RUN without the protobuf package.  Returns
    (ok, reason) so callers/tests can gate with an explicit message
    instead of failing deep inside a stream worker."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False, "google.protobuf not installed (TWS state protocol dependency)"
    try:
        from pyspark.sql.streaming import StatefulProcessor  # noqa: F401
    except ImportError:
        return False, "pyspark.sql.streaming.StatefulProcessor not available"
    return True, ""


def spacesaving_stream_topk_tws(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = 5,
    capacity: int = 50,
) -> DataFrame:
    """``spacesaving_stream_topk`` on the Spark 4.x state API
    (``transformWithStateInPandas`` + ValueState): same per-key bounded
    Space-Saving summary, same output schema — only the state plumbing
    differs.  Raises ImportError with the probe's reason when the runtime
    lacks protobuf (see ``tws_available``); semantics-equivalence vs the
    applyInPandasWithState path is asserted in tests when the dep exists
    and recorded as an explicit skip when it doesn't."""
    ok, reason = tws_available()
    if not ok:
        raise ImportError(f"transformWithStateInPandas unavailable: {reason}")

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

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

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("summary", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                sk = pickle.loads(bytes.fromhex(self._state.get()[0]))
            else:
                sk = SpaceSaving(capacity=capacity)
            for pdf in rows:
                sk.add_batch(pdf[item_col].to_numpy(np.int64))
            self._state.update((pickle.dumps(sk).hex(),))
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

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        TopKProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
