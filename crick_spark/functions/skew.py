"""Skew-handling primitives: salted aggregation and salted joins.

At 100 TB the failure mode of ``groupBy(key)`` / ``join(key)`` is a handful
of hot keys pinning single reducers.  AQE's skew-join splitting handles the
*join* case at runtime; these helpers handle the cases AQE can't:

* ``salted_agg`` — low-cardinality or hot-key aggregation: pre-aggregate on
  (key, salt) so every core contributes (a 5-distinct-value groupBy would
  otherwise reduce on 5 cores), then merge the salt buckets.  Results are
  identical to the unsalted aggregate for any algebraic aggregate (count →
  sum merge, sum/min/max → themselves).
* ``salted_join`` — hot-key equi-join: the fact side gets a per-row salt,
  the dimension side is exploded ``n_salts``× so every (key, salt) bucket
  finds its match.  Replication cost is |dim| × n_salts — use for small/
  medium dims with hot fact keys (for large-large skew, prefer AQE).

Salts derive from ``xxhash64`` of stable row content, never ``rand()`` —
plans stay deterministic and re-executable (speculative retries of a task
must salt identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial expression, merge function) per supported algebraic aggregate
_MERGE = {
    "count": ("count", F.sum),
    "sum": ("sum", F.sum),
    "min": ("min", F.min),
    "max": ("max", F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 32,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: ``aggs`` is a list of
    (column, fn, alias) with fn ∈ {count, sum, min, max}.  ``salt_on``
    names a column (or Column) whose hash spreads rows; default is a
    deterministic per-row spread from all non-key columns via
    ``spark_partition_id``-free hashing of the key tuple + a row hash."""
    salt_src = (
        F.col(salt_on)
        if isinstance(salt_on, str)
        else salt_on
        if salt_on is not None
        else F.xxhash64(*[F.col(c) for c in df.columns])
    )
    salt = F.pmod(F.xxhash64(salt_src), F.lit(int(n_salts))).alias("__salt__")
    partial_exprs = []
    final_exprs = []
    for col, fn, alias in aggs:
        partial_name, merge_fn = _MERGE[fn]
        part_alias = f"__p_{alias}__"
        partial_exprs.append(getattr(F, partial_name)(col).alias(part_alias))
        final_exprs.append(merge_fn(part_alias).alias(alias))
    partial = df.withColumn("__salt__", salt).groupBy(*keys, "__salt__").agg(
        *partial_exprs
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key spreading: fact rows get
    ``salt = hash(row) % n_salts``; the dim side is exploded n_salts× so
    bucket (key, s) always finds its dim row.  Output equals
    ``fact.join(dim, on, how)`` for inner/left joins."""
    n = int(n_salts)
    fact_s = fact.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n)).cast("int"),
    )
    dim_s = dim.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(s) for s in range(n)]))
    )
    out = fact_s.join(dim_s, [on, "__salt__"], how)
    return out.drop("__salt__")


def salted_self_pair_join(
    postings: DataFrame,
    keys: list[str],
    df_threshold: int = 1000,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Skew-spread both sides of a posting-list self-pair join — the
    Σ_k df_k² shape behind TF-IDF cosine pairs and n-gram Jaccard,
    where one Zipf-hot key would pin its whole df² pair workload on a
    single reducer.

    Buckets (key tuples) whose posting count exceeds ``df_threshold``
    get ``s = ceil(df / threshold)`` sub-buckets: the left side keeps
    one deterministic salt per row (hash of the whole row), the right
    side is replicated into ALL ``s`` salts — so every (left, right)
    pair of a hot bucket meets in exactly ONE (key, salt) sub-bucket
    and the hottest bucket's pair work drops from df² to df²/s per
    task.  Cold buckets (the overwhelming majority under Zipf) pay
    nothing: salt 0, no replication.  The hot-key census is at most
    |postings|/threshold rows — usually tiny under Zipf, but still
    corpus-scaled in the worst case (vocab-sized at degenerate
    thresholds), so it carries NO broadcast hint: AQE broadcasts it at
    runtime when it is actually small, the only acceptable way per the
    r6 forced-broadcast ban.

    Returns ``(left, right, join_keys)`` where ``join_keys`` is
    ``keys + ["__salt__"]``; join them and aggregate as usual — results
    are IDENTICAL to the unsalted join (each pair still meets exactly
    once), only the task-level distribution changes.  AQE's skew-join
    splitting cannot do this: it splits oversized SHUFFLE partitions,
    but a single hot key's bucket is one irreducible partition to it,
    and the pair work is quadratic IN the bucket, not linear.
    """
    thr = int(df_threshold)
    census = (
        postings.groupBy(*keys)
        .agg(F.count("*").alias("__df__"))
        .where(F.col("__df__") > thr)
        .select(
            *keys,
            F.ceil(F.col("__df__") / thr).cast("int").alias("__s__"),
        )
    )
    row_hash = F.xxhash64(*[F.col(c) for c in postings.columns])
    left = (
        postings.join(census, keys, "left")
        .withColumn(
            "__salt__",
            F.when(
                F.col("__s__").isNotNull(),
                F.pmod(row_hash, F.col("__s__")).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__s__")
    )
    right = (
        postings.join(census, keys, "left")
        .withColumn(
            "__salt__",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("__s__"), F.lit(1)) - 1
                )
            ),
        )
        .drop("__s__")
    )
    return left, right, [*keys, "__salt__"]


def ensure_scan_parallelism(df: DataFrame, min_parts: int | None = None):
    """Spread a low-partition-count relation across the cluster before
    CPU-heavy per-row work (tokenize, shingle, hash).

    A small parquet file is one row group → ONE scan partition, so a
    tokenize-explode pipeline above it runs single-threaded no matter
    how many cores exist — byte-range splitting can't help because
    parquet rows can't be split below row-group granularity.  At real
    scale inputs have ≫ cores splits and this is a no-op (the partition
    count is inspected, never blindly repartitioned — no extra exchange
    lands in large-input plans); below ``min_parts`` (default
    ``sc.defaultParallelism``) one round-robin repartition of the RAW
    rows buys every downstream expression full-core execution.
    MEASURED (tfidf_similar_docs, sf0.1, 5k docs in one row group):
    5.0-5.3 s warm → 2.4-3.5 s."""
    sc = df.sparkSession.sparkContext
    target = int(min_parts) if min_parts else sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
