"""Temporal relational operators Spark lacks as built-ins: as-of join and
range (interval) join.

Neither exists in the crick reference (crick has no relational layer at
all — SURVEY §2.5); they are part of the engine's beyond-reference surface
for event/telemetry analytics at 100 TB.  Both are expressed as pure
DataFrame plans so Catalyst handles pushdown/AQE, and both are shaped to
avoid the quadratic pair space a naive theta-join would produce:

* ``asof_join``: union-merge formulation — tag both inputs, union, one
  window per key ordered by time, carry the last-seen right payload
  forward.  ONE shuffle on the key, zero row explosion, no per-left-row
  probe of the right side (the classic sort-merge as-of, cf. pandas
  ``merge_asof`` / QuestDB ASOF JOIN semantics).
* ``range_join``: time-bucketed equi-join — each left row explodes into
  the (at most two) fixed-width time buckets its window can touch, the
  join runs on (key, bucket) with the range predicate as a residual
  filter.  Turns the theta-join into an equi-join Spark can hash/sort-
  merge; work is proportional to true pair density per bucket, not
  |L|x|R| per key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ltz(df: DataFrame, col: str) -> DataFrame:
    """Coerce a time column to TIMESTAMP_LTZ (NTZ or long-nanos input).

    ``unix_micros`` / window functions over mixed-source unions require LTZ;
    parquet written with isAdjustedToUTC=false reads as NTZ in Spark 4.
    Delegates to the centralized contract in ``sources/tables.py``
    (``normalize_events_ts``) so there is one implementation to update
    when the next encoding change ships; the session timezone is pinned to
    UTC, so the conversion never shifts wall-clock values.
    """
    from crick_spark.sources.tables import normalize_events_ts

    return normalize_events_ts(df, col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``right_cols`` from
    the right row with the same key and the greatest ``right_time`` <=
    ``left_time`` (inclusive).  Left rows with no prior right row keep
    NULL payloads (filter afterwards for inner semantics).

    Determinism: among right rows tied on ``right_time``, the greatest
    ``right_cols`` tuple (lexicographic struct order) wins — put a unique
    id first in ``right_cols`` to pin the winner.

    Scale shape: unionByName → single window (shuffle by key, sort by
    time within partition) → filter.  State per key is one payload
    struct, never a buffered row set; skewed keys are bounded by the
    window sort, not a join fanout.

    Time-column contract: timestamp / timestamp_ntz columns are used
    as-is (NTZ reinterpreted in the UTC-pinned session).  A BIGINT time
    column is assumed to be **epoch-nanoseconds** (the events-table
    contract in ``sources/tables.py``); pass epoch-micros/millis longs
    through ``F.timestamp_micros``/``F.timestamp_millis`` yourself
    before calling, or the times will be off by 1000×.
    """
    left = _ltz(left, left_time)
    right = _ltz(right, right_time)
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__asof_p__")
    r = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_time).alias("__asof_t__"),
        F.lit(0).alias("__asof_side__"),
        payload,
    )
    l = left.select(
        "*",
        F.col(left_time).alias("__asof_t__"),
        F.lit(1).alias("__asof_side__"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal time -> inclusive;
    # the last non-null payload in this order is the as-of match.
    win = (
        Window.partitionBy(left_on)
        .orderBy("__asof_t__", "__asof_side__", "__asof_p__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__asof_m__", F.last("__asof_p__", ignorenulls=True).over(win))
    return matched.where(F.col("__asof_side__") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__asof_m__.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Interval join: pairs (l, r) sharing ``on`` with
    ``l.time + lower_us < r.time <= l.time + upper_us`` (times compared in
    exact integer microseconds — no float drift).

    Implementation: bucket width = window length, each left row joins the
    two adjacent buckets its window can span, right rows land in exactly
    one bucket; the range predicate is a residual filter on the equi-join.

    Time-column contract: same as :func:`asof_join` — BIGINT time
    columns are interpreted as epoch-nanoseconds per the events-table
    contract; convert other long encodings to timestamps first.
    """
    width = upper_us - lower_us
    left = _ltz(left, left_time)
    right = _ltz(right, right_time)
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))
    lft = left.select(
        F.col(on),
        lt.alias("__lt__"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lt + F.lit(lower_us)) / width),
                    F.floor((lt + F.lit(upper_us)) / width),
                )
            )
        ).alias("__bkt__"),
    )
    rgt = right.select(
        F.col(on),
        rt.alias("__rt__"),
        F.floor(rt / width).alias("__bkt__"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    return (
        lft.join(rgt, [on, "__bkt__"])
        .where(
            (F.col("__rt__") > F.col("__lt__") + F.lit(lower_us))
            & (F.col("__rt__") <= F.col("__lt__") + F.lit(upper_us))
        )
        .drop("__bkt__", "__lt__", "__rt__")
    )


def default_fuzzy_blocks(c: Column, max_dist: int) -> Column:
    """Default blocking keys for :func:`fuzzy_join` — *recall-complete*
    for Levenshtein ≤ ``max_dist``.

    Keys = all character 3-grams of the lowercased de-spaced string,
    plus a ``#short`` band key when the de-spaced length < 4k+3.

    Recall proof sketch (q-gram lemma): case-folding and de-spacing
    never increase edit distance (every raw edit maps to at most one
    folded edit; space edits become no-ops), so the de-spaced pair is
    still within k edits.  One edit destroys at most q=3 grams, so k
    edits destroy ≤ 3k of the |s|−2 grams; if |s| ≥ 3k+3 some gram
    survives untouched and — being a contiguous unchanged run — appears
    verbatim among the other string's grams: shared key.  If |s| < 3k+3
    the string emits LENGTH-BUCKETED short keys ``#short:<n>`` for n in
    [len, len+k] (emit threshold deliberately 4k+3, not 3k+3, so both
    sides of a short pair emit).  Edits change length by ≤1 each, so a
    short pair within k edits has |Δlen| ≤ k and the longer length lands
    in the shorter string's emitted range: shared key.  Bucketing by
    length keeps short-string dictionaries from collapsing into ONE hot
    ``#short`` block (a 1M-row short-SKU dictionary would otherwise
    funnel through a single join key as an all-pairs DP); each bucket
    holds only strings of one de-spaced length.  Hence every pair with
    distance ≤ k shares ≥1 key — measured at recall=1.0 by the
    ``fuzzy_match_recall`` oracle, which injects first-token typos (the
    failure mode of naive first-token blocking).

    Precision/scale: common grams make bigger blocks than a first-token
    scheme — the price of guaranteed recall.  Candidates are pruned by a
    length-band residual before the DP, and the DP itself is
    threshold-bounded.  For web-scale dictionaries pass a custom
    ``block`` (e.g. rarest-gram prefix filtering) — the contract is any
    function Column → array<string> of keys.
    """
    s = F.regexp_replace(F.lower(F.trim(c)), r"\s+", "")
    n = F.length(s)
    grams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: s.substr(i, F.lit(3)),
        ),
        lambda g: F.length(g) == 3,
    )
    short = F.when(
        n < F.lit(4 * max_dist + 3),
        F.transform(
            F.sequence(F.lit(0), F.lit(max_dist)),
            lambda j: F.concat(F.lit("#short:"), (n + j).cast("string")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(grams, short))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    block: "Callable[[Column], Column] | None" = None,
    values_distinct: bool = False,
) -> DataFrame:
    """Approximate string-equality join (entity resolution / data
    cleaning): pairs whose Levenshtein distance is ≤ ``max_dist``.

    Scale shape: a naive fuzzy join is |L|×|R| edit-distance calls — a
    theta-join Spark would execute as BNLJ.  This operator turns it
    into an *equi*-join on exploded blocking keys (default:
    :func:`default_fuzzy_blocks`, recall-complete 3-gram + short-band
    keys — see its docstring for the q-gram-lemma proof), with the
    work pipeline: explode keys over the DISTINCT value dictionaries →
    equi-join on key → length-band prune (an edit changes length by ≤1,
    so |len(a)−len(b)| ≤ k — cheap codegen, fires before anything
    expensive) → per-pair dedup (a pair sharing many grams is DP'd
    once) → threshold-bounded ``levenshtein(l, r, k)`` (JVM codegen
    early-exit DP, no UDF) → map back to fact rows by exact equi-join.
    Work is Σ_b |L_b|·|R_b| over gram blocks — bounded by dictionary
    statistics, never corpus², and the dictionaries are usually orders
    of magnitude smaller than the fact tables.

    ``block`` (Column → array<string>) swaps the key scheme: cheaper
    lossy blocking (first token, soundex) or rarest-gram prefix
    filtering for web-scale dictionaries.  ``values_distinct=True``
    skips the internal dictionary-dedup shuffles when the join columns
    are already distinct (e.g. inputs straight out of a groupBy on the
    value).
    """
    bl = block if block is not None else (
        lambda c: default_fuzzy_blocks(c, max_dist)
    )
    lv = left.select(F.col(left_col).alias("__lv"))
    rv = right.select(F.col(right_col).alias("__rv"))
    if not values_distinct:
        lv, rv = lv.distinct(), rv.distinct()
    lk = lv.select("__lv", F.explode(bl(F.col("__lv"))).alias("__blk"))
    rk = rv.select("__rv", F.explode(bl(F.col("__rv"))).alias("__blk"))
    pairs = (
        lk.join(rk, "__blk")
        .where(
            F.abs(F.length("__lv") - F.length("__rv")) <= F.lit(max_dist)
        )
        .select("__lv", "__rv")
        .dropDuplicates(["__lv", "__rv"])
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("__lv"), F.col("__rv"), int(max_dist)),
        )
        .where(F.col("edit_dist") >= 0)  # threshold DP returns -1 past k
    )
    out = (
        left.alias("l")
        .join(pairs, F.col(f"l.{left_col}") == F.col("__lv"))
        .join(right.alias("r"), F.col("__rv") == F.col(f"r.{right_col}"))
    )
    return out.select(
        *[F.col(f"l.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
            for c in right.columns
        ],
        F.col("edit_dist"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of the same table — the
    data-versioning / CDC primitive (what Delta/Iceberg table_changes
    exposes): returns one row per changed key with ``change_type`` ∈
    {insert, delete, update}.  Unchanged keys never leave the join.

    Value comparison is by ``xxhash64`` over a null-aware JSON encoding
    of the non-key columns (64-bit, JVM-side) so the shuffle carries
    (keys, 8-byte hash) instead of full rows — at 100 TB the diff of
    two snapshots moves key+hash only, one co-partitioned full-outer
    sort-merge join on the key (shuffle-free when both snapshots are
    bucketed by key, the layout a versioned table should have anyway).
    NOT ``xxhash64(*cols)`` directly: Spark's multi-arg hash chains
    per-column updates and a NULL leaves the state untouched, so
    (NULL,'x') and ('x',NULL) collide — to_json(struct(...)) keeps the
    field names, making NULL placement part of the hashed bytes.

    Key contract: ``keys`` must be non-NULL (the primary-key semantic
    every CDC system assumes — Delta/Iceberg MERGE key equality never
    matches NULLs).  NULL-keyed rows cannot pair across the full-outer
    join and would surface as spurious delete+insert pairs.

    Schema evolution: the compared column set is the UNION of both
    snapshots' non-key columns — a column present on one side only is
    read as NULL on the other (to_json drops null fields, so adding an
    all-NULL column flags nothing, while populated values in an added
    column correctly surface as updates).  Deriving from ``old`` alone
    would silently ignore changes confined to added columns.
    """
    old_vals = [c for c in old.columns if c not in keys]
    new_vals = [c for c in new.columns if c not in keys]
    val_cols = old_vals + [c for c in new_vals if c not in old_vals]

    def _h(df: DataFrame, have: list[str], alias: str):
        fields = [
            F.col(c).alias(c) if c in have else F.lit(None).alias(c)
            for c in val_cols
        ]
        return df.select(
            *keys, F.xxhash64(F.to_json(F.struct(*fields))).alias(alias)
        )

    oh = _h(old, old_vals, "__h_old__")
    nh = _h(new, new_vals, "__h_new__")
    j = oh.join(nh, keys, "full_outer")
    change = (
        F.when(F.col("__h_old__").isNull(), F.lit("insert"))
        .when(F.col("__h_new__").isNull(), F.lit("delete"))
        .when(F.col("__h_old__") != F.col("__h_new__"), F.lit("update"))
    )
    return j.select(*keys, change.alias("change_type")).where(
        F.col("change_type").isNotNull()
    )


def snapshot_diff_with_payload(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
) -> DataFrame:
    """:func:`snapshot_diff` variant carrying the NEW-side payload for
    insert/update rows (NULL payload for deletes) — the full change
    feed ``apply_changes`` consumes.  Same key+hash comparison; the
    payload join touches only changed keys."""
    changes = snapshot_diff(old, new, keys)
    return changes.join(new, keys, "left").select(
        *keys,
        "change_type",
        *[c for c in new.columns if c not in keys],
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Apply a change feed (from :func:`snapshot_diff_with_payload`) to a
    base snapshot — the MERGE INTO side of the CDC pair: deletes and
    updates drop their base rows (one co-partitioned anti-join on the
    key), then insert/update payloads union in.  ``apply_changes(old,
    diff(old, new)) ≡ new`` by construction — the round-trip the
    snapshot_roundtrip_orders oracle proves.  At 100 TB both legs
    co-partition on the snapshot key; only changed keys move.

    The rebuilt table takes the FEED'S schema (= the new snapshot's):
    columns the new snapshot added read NULL from surviving base rows
    (they were NULL in new for unchanged rows, else the row would be an
    update); columns it dropped are dropped.  Keys must be non-NULL
    (see :func:`snapshot_diff`)."""
    val_cols = [c for c in changes.columns if c not in keys + ["change_type"]]
    touched = changes.select(*keys)
    kept = base.join(touched, keys, "left_anti").select(
        *keys,
        *[
            F.col(c) if c in base.columns else F.lit(None).alias(c)
            for c in val_cols
        ],
    )
    upserts = changes.where(
        F.col("change_type").isin("insert", "update")
    ).select(*keys, *val_cols)
    return kept.unionByName(upserts)
