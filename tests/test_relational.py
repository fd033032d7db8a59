"""Unit tests for the temporal join operators (asof_join / range_join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crick_spark.operators.relational import asof_join, range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00")),  # before any right row -> NULL
            (2, _ts("2024-01-01T12:00:00")),  # exactly at right ts -> inclusive
            (3, _ts("2024-01-01T13:30:00")),  # between -> earlier row
            (4, _ts("2024-01-01T15:00:00")),  # after all -> latest row
        ],
        "id long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T12:00:00"), 1.0),
            (200, _ts("2024-01-01T14:00:00"), 2.0),
        ],
        "rid long, rt timestamp, v double",
    )
    left = left.withColumn("k", F.lit(1))
    right = right.withColumn("k", F.lit(1))
    out = asof_join(
        left, right, "k", "k", "t", "rt", right_cols=["rid", "v"]
    )
    got = {r["id"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got == {
        1: (None, None),
        2: (100, 1.0),
        3: (100, 1.0),
        4: (200, 2.0),
    }


def test_asof_tie_breaks_to_max_payload(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T12:00:00"))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, _ts("2024-01-01T11:00:00"), 5),
            (7, _ts("2024-01-01T11:00:00"), 9),  # same ts: max rid wins
        ],
        "k long, rt timestamp, rid long",
    )
    out = asof_join(left, right, "k", "k", "t", "rt", right_cols=["rid"])
    assert out.collect()[0]["asof_rid"] == 9


def test_range_join_window_boundaries(spark):
    base = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [(1, 10, base)], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, base, "same-instant"),  # excluded: strict lower bound
            (10, base + dt.timedelta(seconds=60), "at-upper"),  # included
            (10, base + dt.timedelta(seconds=61), "past-upper"),  # excluded
            (99, base + dt.timedelta(seconds=30), "other-key"),  # excluded
        ],
        "k long, t timestamp, tag string",
    )
    out = range_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        lower_us=0,
        upper_us=60_000_000,
        left_cols=["id"],
        right_cols=["tag"],
    )
    assert [r["r_tag"] for r in out.collect()] == ["at-upper"]


def test_range_join_bucket_crossing(spark):
    # right row lands in the bucket after the left row's own bucket:
    # the two-bucket explode must still find it.
    base = _ts("2024-01-01T00:00:55")
    left = spark.createDataFrame([(1, 1, base)], "id long, k long, t timestamp")
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=50))], "k long, t timestamp"
    )
    out = range_join(
        left, right, "k", "t", "t", 0, 60_000_000, ["id"], []
    )
    assert out.count() == 1


def test_fuzzy_join_blocked_levenshtein(spark):
    """fuzzy_join returns exactly the pairs within the edit bound — the
    default 3-gram blocking is recall-complete (q-gram lemma), so even
    FIRST-token typos are found, the failure mode of naive first-token
    blocking."""
    from crick_spark.operators.relational import fuzzy_join

    left = spark.createDataFrame(
        [("red widget",), ("red widgit",), ("blue ring",), ("red sprocket",)],
        ["name_a"],
    )
    right = spark.createDataFrame(
        [("red widgets",), ("blue rings",), ("ted widget",)], ["name_b"]
    )
    got = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_join(left, right, "name_a", "name_b", 2).collect()
    }
    assert ("red widget", "red widgets", 1) in got
    assert ("red widgit", "red widgets", 2) in got
    assert ("blue ring", "blue rings", 1) in got
    # first-token typo: old first-token blocking missed this pair
    assert ("red widget", "ted widget", 1) in got
    # distance past the bound -> excluded
    assert all(a != "red sprocket" for a, _, _ in got)


def test_resample_interpolate_linear(spark):
    """Gap-filled hourly resample: bucket averages for populated hours,
    straight-line values for interior gaps, was_gap flags exact."""
    import datetime as dt

    from crick_spark.operators.timeseries import resample_interpolate

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # series "a": hours 0,3 populated -> gaps at 1,2 interpolate 2,3
        ("a", t0, 1.0),
        ("a", t0.replace(minute=45), 1.0),  # same bucket, avg stays 1.0
        ("a", t0 + dt.timedelta(hours=3), 4.0),
        # series "b": single hour -> no gaps
        ("b", t0, 7.0),
    ]
    df = spark.createDataFrame(rows, ["series", "ts", "v"])
    out = {
        (r.series, r.bucket_ts.hour): (r.value, r.was_gap)
        for r in resample_interpolate(df, "series", "ts", "v").collect()
    }
    assert out[("a", 0)] == (1.0, False)
    assert out[("a", 1)] == (2.0, True)
    assert out[("a", 2)] == (3.0, True)
    assert out[("a", 3)] == (4.0, False)
    assert out[("b", 0)] == (7.0, False)
    assert len(out) == 5


def test_sessionize_gap_boundaries(spark):
    """A gap of exactly gap_minutes does NOT break the session; one
    microsecond more does.  Session ids are 0-based per key and ordered
    by (ts, tiebreak)."""
    import datetime as dt

    from crick_spark.operators.timeseries import sessionize

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("u1", t0, 1),
        ("u1", t0 + dt.timedelta(minutes=30), 2),  # exactly 30 -> same
        ("u1", t0 + dt.timedelta(minutes=60, microseconds=1), 3),  # break
        ("u2", t0, 4),
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    got = {
        r.eid: r.session_id
        for r in sessionize(df, "user", "ts", 30, tiebreak="eid").collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def test_sessionize_matches_python_on_random_streams(spark):
    """Randomized cross-validation: per-user session partitioning from
    the Spark plan must equal a from-scratch Python sweep over the same
    (seeded) random event streams."""
    import datetime as dt
    import random

    from crick_spark.operators.timeseries import sessionize

    rng = random.Random(11)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for u in range(8):
        t = t0
        for _ in range(rng.randint(1, 40)):
            t = t + dt.timedelta(seconds=rng.randint(1, 4000))
            rows.append((f"u{u}", t, eid))
            eid += 1
    df = spark.createDataFrame(rows, ["user", "ts", "eid"])
    got = {
        r.eid: (r.user, r.session_id)
        for r in sessionize(df, "user", "ts", 30, tiebreak="eid").collect()
    }

    by_user = {}
    for u, t, e in sorted(rows, key=lambda x: (x[0], x[1], x[2])):
        by_user.setdefault(u, []).append((t, e))
    want = {}
    for u, evs in by_user.items():
        sid = -1
        prev = None
        for t, e in evs:
            if prev is None or (t - prev).total_seconds() > 1800:
                sid += 1
            want[e] = (u, sid)
            prev = t
    assert got == want


def test_fuzzy_join_matches_bruteforce_within_blocks(spark):
    """Randomized cross-validation: fuzzy_join output equals the FULL
    brute-force 'levenshtein <= d' pair set computed in Python (real DP
    edit distance, no blocking term) — the recall-complete default
    blocking must not lose a single pair."""
    import random

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    from crick_spark.operators.relational import fuzzy_join

    rng = random.Random(3)
    vocab = ["red", "blue", "teal"]
    nouns = ["widget", "widgit", "wodget", "ring", "rang", "sprocket"]
    names = [
        f"{rng.choice(vocab)} {rng.choice(nouns)}" for _ in range(40)
    ]
    left = spark.createDataFrame([(n,) for n in names[:25]], ["a"])
    right = spark.createDataFrame([(n,) for n in names[25:]], ["b"])
    got = {
        (r.a, r.b)
        for r in fuzzy_join(left, right, "a", "b", max_dist=2).collect()
    }
    want = {
        (x, y)
        for x in names[:25]
        for y in names[25:]
        if lev(x, y) <= 2
    }
    assert got == want


def test_snapshot_diff_change_types_and_null_swaps(spark):
    """insert/delete/update classification, unchanged rows excluded, and
    the null-placement regression: (NULL,'x') -> ('x',NULL) IS an update
    (a naive multi-arg xxhash64 would chain past the NULL and miss it)."""
    from crick_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, "b", "y"),       # updated in new
            (3, "c", "z"),       # deleted in new
            (4, None, "x"),      # null-swap update in new
            (5, None, None),     # unchanged with nulls
        ],
        "k long, v1 string, v2 string",
    )
    new = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, "b", "y2"),
            (4, "x", None),
            (5, None, None),
            (6, "f", "g"),       # inserted
        ],
        "k long, v1 string, v2 string",
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "update", 3: "delete", 4: "update", 6: "insert"}


def test_build_vocab_and_bpe_candidates(spark):
    """Vocab ranking/coverage and first BPE merge against hand counts."""
    from crick_spark.pipeline.text import bpe_merge_candidates, build_vocab

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "bb aa cc"), (3, "aa")],
        "doc_id long, text string",
    )
    vocab = {r["token"]: (r["rank"], r["freq"], r["cum_coverage"])
             for r in build_vocab(docs, vocab_size=10).collect()}
    assert vocab["aa"] == (1, 4, round(4 / 7, 6))
    assert vocab["bb"] == (2, 2, round(6 / 7, 6))
    assert vocab["cc"][0] == 3
    # pairs: 'aa' word freq 4 -> pair 'aa' x4; 'bb' x2 -> 'bb' x2; 'cc' x1
    pairs = {r["pair"]: r["freq"] for r in bpe_merge_candidates(docs).collect()}
    assert pairs == {"aa": 4, "bb": 2, "cc": 1}


def test_mixture_epoch_plan_caps_and_shortfall(spark):
    from pyspark.sql import functions as F

    from crick_spark.pipeline.sampling import mixture_epoch_plan

    df = spark.createDataFrame(
        [("big", 100), ("big", 100), ("tiny", 10)],
        "domain string, toks long",
    )
    share = F.when(F.col("domain") == "big", 0.5).otherwise(0.5)
    out = {r["domain"]: r for r in mixture_epoch_plan(
        df, "domain", share, F.col("toks"), budget_tokens=400, max_epochs=4.0
    ).collect()}
    big, tiny = out["big"], out["tiny"]
    assert big["epochs_needed"] == 1.0 and not big["capped"]
    assert big["shortfall_tokens"] == 0.0
    # tiny: target 200 over 10 avail = 20 epochs -> capped at 4 -> 40 eff
    assert tiny["capped"] and tiny["epochs_needed"] == 20.0
    assert tiny["effective_tokens"] == 40.0 and tiny["shortfall_tokens"] == 160.0


def test_weighted_sample_es_rule_and_bias(spark):
    """Ranks match a numpy recompute of u^(1/w); an overwhelming-weight
    row is always drawn; non-positive weights are excluded."""
    import hashlib

    from crick_spark.pipeline.sampling import weighted_sample_per_group

    rows = [(i, "g", float(1 + (i % 7)), ) for i in range(200)]
    rows.append((900, "g", 1e9))   # overwhelming weight -> P(draw) ~ 1
    rows.append((901, "g", 0.0))   # excluded
    rows.append((902, "g", -3.0))  # excluded
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    got = weighted_sample_per_group(df, ["grp"], "id", "w", 10).collect()
    picked = {r["id"]: r["sample_rank"] for r in got}
    assert 900 in picked and 901 not in picked and 902 not in picked

    def u(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) / 16777216.0

    scored = sorted(
        ((u(i) ** (1.0 / w), i) for i, g, w in rows if w > 0),
        key=lambda t: (-t[0], t[1]),
    )
    expect = {i: rk + 1 for rk, (_, i) in enumerate(scored[:10])}
    assert picked == expect


def test_twap_zero_duration_group_yields_null(spark):
    """All samples at one timestamp -> sum(dur)=0 -> twap NULL, not a
    DIVIDE_BY_ZERO abort (ANSI mode)."""
    import datetime as dt

    from crick_spark.plans.registry import QUERIES  # noqa: F401  (pattern)
    from pyspark.sql import Window as W

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, t, "a", 10.0), (2, t, "a", 20.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    us = F.unix_micros(F.col("ts"))
    d = F.date_trunc("day", F.col("ts"))
    w = W.partitionBy("event_type", d).orderBy("ts", "event_id")
    s = df.select(
        "event_type", d.alias("d"), "value", us.alias("us"),
        F.lead(us).over(w).alias("nxt"),
    )
    out = s.groupBy("event_type", "d").agg(
        F.round(
            F.try_divide(
                F.sum(F.col("value") * (F.col("nxt") - F.col("us"))),
                F.sum(F.col("nxt") - F.col("us")),
            ), 6,
        ).alias("twap"),
    ).collect()
    assert out[0]["twap"] is None


def test_mixture_epoch_plan_zero_avail_domain(spark):
    """A stratum with zero available tokens reports capped=True,
    effective=0, shortfall=target - instead of aborting the plan."""
    from pyspark.sql import functions as F

    from crick_spark.pipeline.sampling import mixture_epoch_plan

    df = spark.createDataFrame(
        [("a", 100), ("empty", 0)], "domain string, toks long"
    )
    out = {r["domain"]: r for r in mixture_epoch_plan(
        df, "domain", F.lit(0.5), F.col("toks"), budget_tokens=400
    ).collect()}
    e = out["empty"]
    assert e["epochs_needed"] is None and e["capped"]
    assert e["effective_tokens"] == 0.0 and e["shortfall_tokens"] == 200.0


def test_snapshot_diff_schema_evolution_added_column(spark):
    """Changes confined to a column ADDED in the new snapshot must surface
    as updates (regression: val_cols from old alone silently ignored
    them); adding an all-NULL column flags nothing."""
    from crick_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame(
        [(1, "a", "extra"), (2, "b", None)], "k long, v string, v2 string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update"}  # k=2's added column is NULL -> unchanged


def test_apply_changes_roundtrip_with_nulls_and_schema(spark):
    """apply_changes(old, diff_with_payload(old, new)) == new exactly,
    including NULL payloads and delete/update/insert mixes."""
    from crick_spark.operators.relational import (
        apply_changes,
        snapshot_diff_with_payload,
    )

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "y"), (3, None, "z"), (4, "d", "w")],
        "k long, v1 string, v2 string",
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, "B", "y"), (4, None, "w"), (5, "e", None)],
        "k long, v1 string, v2 string",
    )
    feed = snapshot_diff_with_payload(old, new, ["k"])
    rebuilt = apply_changes(old, feed, ["k"])
    got = sorted(tuple(r) for r in rebuilt.collect())
    want = sorted(tuple(r) for r in new.collect())
    assert got == want


def test_apply_changes_schema_evolution(spark):
    """The rebuilt table takes the feed's (= new snapshot's) schema:
    added columns survive, dropped columns drop, result == new."""
    from crick_spark.operators.relational import (
        apply_changes,
        snapshot_diff_with_payload,
    )

    old = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")],
                                "k long, v1 string, v2 string")
    # new drops v2 and adds v3
    new = spark.createDataFrame([(1, "a", None), (2, "B", "t3")],
                                "k long, v1 string, v3 string")
    feed = snapshot_diff_with_payload(old, new, ["k"])
    rebuilt = apply_changes(old, feed, ["k"])
    assert rebuilt.columns == new.columns
    got = sorted(tuple(r) for r in rebuilt.collect())
    want = sorted(tuple(r) for r in new.collect())
    assert got == want


def test_copurchase_minsupport_apriori_equivalence(spark):
    """r10 (VERDICT #5): the a-priori brand prune is results-preserving
    — for any support threshold s, pruning brands with cnt < s BEFORE
    pair expansion yields exactly the all-pairs result filtered to
    pair_cnt >= s (pair_cnt <= min(cnt_a, cnt_b) guarantees no
    qualifying pair loses a brand).  Thresholds are chosen from the
    data so at least one run actually prunes brands."""
    from pyspark.sql import functions as F

    from crick_spark.plans.relational_queries import (
        copurchase_brand_lift,
        copurchase_lift_minsupport,
    )
    from crick_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    full = copurchase_brand_lift(spark, SF_SMALL).collect()
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, SF_SMALL, "part").select(
        "p_partkey", "p_brand"
    )
    singles = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .groupBy("p_brand")
        .count()
        .collect()
    )
    brand_counts = sorted(r["count"] for r in singles)
    max_pair = max(r["pair_cnt"] for r in full)
    # s beyond the smallest brand count prunes >=1 brand; a low s and a
    # mid-pair-count s cover the no-prune and deep-filter regimes
    thresholds = {2, brand_counts[0] + 1, max(2, max_pair // 2)}
    pruned_somewhere = False
    for s in sorted(thresholds):
        got = sorted(
            map(tuple, copurchase_lift_minsupport(spark, SF_SMALL, s).collect())
        )
        want = sorted(tuple(r) for r in full if r["pair_cnt"] >= s)
        assert got == want, f"divergence at min_support={s}"
        if any(c < s for c in brand_counts):
            pruned_somewhere = True
    assert pruned_somewhere, "no threshold exercised the brand prune"
