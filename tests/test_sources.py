"""Testdata-contract tests for the source layer.

The driver regenerates /root/testdata between rounds and has already changed
the events.ts parquet encoding twice (TIMESTAMP(NANOS) → timestamp[us]/NTZ).
``normalize_events_ts`` is the single choke point for that contract; these
tests pin it at every scale factor so an encoding change breaks HERE, loudly,
instead of deep inside a range-join analysis error mid-bench.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampNTZType, TimestampType

SF_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]


@pytest.mark.parametrize("sf_dir", [d for d in SF_DIRS if os.path.isdir(d)])
def test_events_ts_is_ltz_at_every_sf(spark, sf_dir):
    from crick_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType == TimestampType(), (
        f"{sf_dir}/events.parquet: ts must normalize to TIMESTAMP_LTZ, "
        f"got {df.schema['ts'].dataType}"
    )
    # LTZ-only expressions must analyze (this is what broke in round 2)
    df.select(F.unix_micros("ts")).limit(1).collect()


def test_normalize_handles_all_encodings(spark):
    """The normalizer must cover every encoding the driver has shipped:
    long nanos, TIMESTAMP_NTZ, and already-LTZ (idempotence)."""
    from crick_spark.sources.tables import normalize_events_ts

    nanos = 1_700_000_000_123_456_789  # > 2^53: catches float-division drift
    long_df = spark.createDataFrame(
        [(nanos,)], StructType([StructField("ts", LongType())])
    )
    out = normalize_events_ts(long_df)
    assert out.schema["ts"].dataType == TimestampType()
    assert out.select(F.unix_micros("ts")).first()[0] == nanos // 1000

    ntz_df = spark.createDataFrame(
        [("2024-05-01 12:34:56.789",)], ["s"]
    ).select(F.to_timestamp_ntz("s").alias("ts"))
    assert ntz_df.schema["ts"].dataType == TimestampNTZType()
    out = normalize_events_ts(ntz_df)
    assert out.schema["ts"].dataType == TimestampType()
    # UTC session tz ⇒ wall-clock value preserved exactly
    assert str(out.select(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS")).first()[0]) == (
        "2024-05-01 12:34:56.789"
    )

    ltz_df = out
    again = normalize_events_ts(ltz_df)
    assert again.schema["ts"].dataType == TimestampType()


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"), reason="sf0.001 testdata absent"
)
def test_streaming_reader_matches_batch_contract(spark):
    """stream_events must yield the same normalized ts type as load_table."""
    from crick_spark.streaming.windows import stream_events

    sdf = stream_events(spark, "/root/testdata/sf0.001")
    assert sdf.schema["ts"].dataType == TimestampType()


EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("sf_dir", [d for d in SF_DIRS if os.path.isdir(d)])
def test_table_columns_match_contract(spark, sf_dir):
    """Schema-drift tripwire: the driver regenerates /root/testdata between
    rounds; a dropped or renamed column should fail HERE with the table
    name, not as an unresolved-attribute error deep inside one of the 155
    registered query plans.  Column NAMES only — value-type drift (like
    the events.ts encoding changes) is handled by normalize_events_ts and
    its own tests above."""
    from crick_spark.sources.tables import load_table

    for table, want in EXPECTED_COLUMNS.items():
        got = set(load_table(spark, sf_dir, table).columns)
        assert want <= got, f"{sf_dir}/{table}: missing columns {want - got}"


def test_bloom_filter_layout_skips_row_groups(spark, tmp_path):
    """r10: parquet bloom filters must actually prune row groups the
    min/max stats cannot — on a randomly laid-out high-cardinality key,
    the point-lookup scan over the bloom layout emits strictly fewer
    rows than over the plain layout, with identical query results."""
    from pyspark.sql import functions as F

    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_MEDIUM as SF_MED

    o = load_table(spark, SF_MED, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    shuffled = o.orderBy(F.xxhash64("o_orderkey")).repartition(1)
    plain = str(tmp_path / "plain")
    bloom = str(tmp_path / "bloom")
    shuffled.write.mode("overwrite").option(
        "parquet.block.size", 64 * 1024
    ).parquet(plain)
    (
        shuffled.write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.expected.ndv", "5000")
        .parquet(bloom)
    )

    def scan_rows(path):
        df = spark.read.parquet(path).where(
            F.col("o_orderkey").isin(1, 700, 1400)
        )
        res = sorted(map(tuple, df.collect()))
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        it = leaves.head().metrics().iterator()
        metrics = {}
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        return res, int(metrics["numOutputRows"])

    res_plain, rows_plain = scan_rows(plain)
    res_bloom, rows_bloom = scan_rows(bloom)
    assert res_plain == res_bloom  # layout never changes results
    assert len(res_plain) == 3
    # several row groups exist, and blooms prune strictly beyond stats
    import glob

    import pyarrow.parquet as pq

    f = glob.glob(f"{bloom}/*.parquet")[0]
    assert pq.ParquetFile(f).metadata.num_row_groups >= 3
    assert rows_bloom < rows_plain, (
        f"bloom layout scanned {rows_bloom} rows vs plain {rows_plain} — "
        "row-group bloom pruning is not firing"
    )


def test_quarantine_sink_split_replay_and_reprocess(spark, tmp_path):
    """QuarantineSink (r10 VERDICT #5): good/bad rows split into the two
    tables, a replayed batch id is fenced, a crash between the partition
    writes and the meta commit replays idempotently (REWRITE, not a
    second copy), quarantined raw lines are verbatim so a repaired feed
    re-ingests them under a new batch id, and remote base dirs refuse."""
    import pytest

    from crick_spark.sources.quarantine import QuarantineSink

    sink = QuarantineSink(str(tmp_path / "sink"), schema="a long, b string")

    def lines(rows):
        return spark.createDataFrame([(r,) for r in rows], "value string")

    b0 = ['{"a": 1, "b": "x"}', '{"a": tr', '{"a": 2, "b": "y"}']
    b1 = ['{"a": 3, "b": "z"}', "garbage"]
    assert sink.ingest(lines(b0), 0) is True
    assert sink.ingest(lines(b0), 0) is False  # fenced replay
    assert sink.ingest(lines(b1), 1) is True
    assert sink.read_meta() == (1, {"n_good": 1, "n_quarantined": 1})

    good = sink.good(spark).toPandas().sort_values("a")
    assert good["a"].tolist() == [1, 2, 3]
    assert good["batch_id"].tolist() == [0, 0, 1]
    quar = sink.quarantined(spark).toPandas().sort_values("raw")
    assert quar["raw"].tolist() == sorted(['{"a": tr', "garbage"])
    assert quar["raw_len"].tolist() == [len(r) for r in quar["raw"]]

    # crash window: batch 2's partitions landed but meta did not — the
    # restart replays batch 2 and must leave ONE copy, not two
    b2 = ['{"a": 9, "b": "w"}', '{"a": 9, "b": "w2"}', "nope"]
    crash = QuarantineSink(str(tmp_path / "sink"), schema="a long, b string")
    parsed = lines(b2)
    # simulate the pre-crash writes by running ingest, then deleting the
    # meta file it committed (the crash happened just before the commit)
    assert crash.ingest(parsed, 2) is True
    import os

    bid, name = crash._meta_files()[-1]
    assert bid == 2
    os.remove(os.path.join(crash._meta_local, name))
    assert crash.read_meta()[0] == 1  # previous generation re-surfaces
    assert crash.ingest(parsed, 2) is True  # replay rewrites in place
    assert crash.read_meta() == (2, {"n_good": 2, "n_quarantined": 1})
    assert sink.good(spark).where("batch_id = 2").count() == 2
    assert sink.quarantined(spark).where("batch_id = 2").count() == 1

    # the reprocessing feed: repair the quarantined lines, replay them
    repaired = sink.quarantined(spark).selectExpr(
        "concat('{\"a\": ', raw_len, ', \"b\": \"fixed\"}') AS value"
    )
    assert sink.ingest(repaired, 3) is True
    assert sink.read_meta()[1] == {"n_good": 3, "n_quarantined": 0}
    assert sink.good(spark).where("batch_id = 3").count() == 3

    with pytest.raises(ValueError, match="scheme"):
        QuarantineSink("s3a://bucket/sink", schema="a long")
