"""Corpus sampling operators for training-data preparation.

Domain mixing — resampling a corpus so the per-stratum (source/domain/
language) proportions match a target mix — is the data-weighting step of
every large-model training pipeline (cf. the mixture weights of GPT-3,
The Pile, DoReMi).  The implementation is two declarative passes:

1. a tiny ``groupBy(stratum).count()`` aggregate (one row per domain —
   KBs even at 100 TB), cross-joined with its own min to find the largest
   feasible downsample-only total;
2. a broadcast join of the resulting per-stratum keep-rates back onto the
   corpus, with a deterministic per-row md5 coin — no RNG state, stable
   across engines, runs, and partitionings; the corpus itself is never
   shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_uniform(col: Column) -> Column:
    """Deterministic uniform in [0, 1): the first 24 md5 bits of the key.
    Content-stable (same key → same coin on any engine) — the property
    that makes samples reproducible and join-consistent across runs."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 6), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 24))


def domain_mix_rates(
    df: DataFrame, stratum_col: str, target_share: Column
) -> DataFrame:
    """Per-stratum keep rates that realize ``target_share`` (a Column
    expression over the stratum, summing to 1 across strata) by *pure
    downsampling*: the feasible total is ``T = min_s(n_s / share_s)`` and
    each stratum keeps ``T · share_s / n_s`` of its rows (= 1 for the
    binding stratum).  Returns (stratum, n_total, keep_rate)."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_total"))
    counts = counts.withColumn("__share__", target_share)
    feasible = counts.select(
        F.min(F.col("n_total") / F.col("__share__")).alias("__T__")
    )
    return counts.crossJoin(F.broadcast(feasible)).select(
        stratum_col,
        "n_total",
        F.least(
            F.lit(1.0), F.col("__T__") * F.col("__share__") / F.col("n_total")
        ).alias("keep_rate"),
    )


def domain_mix_resample(
    df: DataFrame, stratum_col: str, target_share: Column, key_col: str
) -> DataFrame:
    """Deterministically resample ``df`` so stratum proportions match
    ``target_share``: broadcast the per-stratum rates and keep rows whose
    md5 coin (on ``key_col``) falls below the stratum's rate.  Per-row
    expression work on the corpus side — no shuffle, no RNG."""
    rates = domain_mix_rates(df, stratum_col, target_share)
    return df.join(F.broadcast(rates), stratum_col).where(
        md5_uniform(F.col(key_col)) < F.col("keep_rate")
    )


def domain_mix_summary(
    df: DataFrame, stratum_col: str, target_share: Column, key_col: str
) -> DataFrame:
    """Resample and roll up: per stratum, the input size, kept size, keep
    rate, and the realized share of the output corpus."""
    kept = (
        domain_mix_resample(df, stratum_col, target_share, key_col)
        .groupBy(stratum_col, "n_total", "keep_rate")
        .agg(F.count("*").alias("n_kept"))
    )
    total = kept.select(F.sum("n_kept").alias("__total_kept__"))
    return kept.crossJoin(F.broadcast(total)).select(
        stratum_col,
        "n_total",
        "n_kept",
        F.round("keep_rate", 6).alias("keep_rate"),
        F.round(F.col("n_kept") / F.col("__total_kept__"), 6).alias(
            "realized_share"
        ),
    )


def mixture_epoch_plan(
    df: DataFrame,
    stratum_col: str,
    target_share: Column,
    token_count_col: Column,
    budget_tokens: float,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Epoch-aware mixture planning — the UPSAMPLING side of domain
    mixing (``domain_mix_resample`` covers downsampling): given a total
    training-token budget and per-domain target shares, compute how many
    epochs (repeats) each domain needs and cap it at ``max_epochs``
    (repeating data beyond ~4 epochs stops helping — the
    data-constrained scaling result this plan encodes).  Domains hitting
    the cap contribute ``max_epochs × available`` tokens; the shortfall
    column is what a curator must source elsewhere.

    One tiny per-stratum aggregate (counts + token sums), arithmetic on
    the ≤|domains| result — nothing corpus-sized moves after the scan.

    ``target_share`` must be a deterministic function of ``stratum_col``
    alone (it is read with ``first()`` per group); a row-varying share
    has no meaning in a per-domain plan.
    """
    per = df.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count_col).alias("avail_tokens"),
        F.first(target_share).alias("__share__"),
    )
    target = F.col("__share__") * F.lit(float(budget_tokens))
    # try_divide: a stratum with zero available tokens (all-empty docs)
    # has undefined epochs (NULL) and must not abort the plan under ANSI
    # mode — it is exactly the domain that needs 100% external sourcing,
    # so capped=true, effective=0, shortfall=target
    epochs = F.try_divide(target, F.col("avail_tokens"))
    eff_epochs = F.least(epochs, F.lit(float(max_epochs)))
    effective = F.coalesce(
        eff_epochs * F.col("avail_tokens"), F.lit(0.0)
    )
    return per.select(
        stratum_col,
        "n_docs",
        "avail_tokens",
        F.round(target, 2).alias("target_tokens"),
        F.round(epochs, 6).alias("epochs_needed"),
        (
            epochs.isNull() | (epochs > F.lit(float(max_epochs)))
        ).alias("capped"),
        F.round(effective, 2).alias("effective_tokens"),
        F.round(target - effective, 2).alias("shortfall_tokens"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis reservoir rule (each row scores u^(1/w), keep
    the k largest) with the repo's deterministic md5 coin for u, so the
    sample is reproducible and SQL-oracle-able.  P(row in sample) is
    proportionally weight-biased exactly as the ES scheme guarantees.

    ``key_col`` must uniquely identify rows — the contract of every
    md5-coin sampler in this repo (train/val/test split, stratified
    sample, negative sampling).  Duplicate keys would draw the SAME
    coin (correlated, not independent uniforms) and tie-break by
    physical order, breaking both reproducibility and the ES
    inclusion probabilities.

    100 TB shape: top-k is associative, so the rank runs in TWO phases —
    a salted partial top-k (window keyed (group, hash(key) mod S), so no
    partition ever holds more than ~|group|/S rows even when one domain
    is the whole corpus) followed by the exact top-k over the ≤ S·k
    survivors per group.  Identical result to a single window, without
    the one-partition-per-group funnel.  Non-positive weights are
    excluded (their ES score is undefined), matching the reference
    samplers.
    """
    from pyspark.sql import Window as W

    n_salt = 64
    u = md5_uniform(F.col(key_col))
    score = F.pow(u, F.lit(1.0) / F.col(weight_col))
    salt = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salt))
    w_partial = W.partitionBy(*group_cols, "__salt__").orderBy(
        F.desc("__score__"), F.col(key_col)
    )
    w_final = W.partitionBy(*group_cols).orderBy(
        F.desc("__score__"), F.col(key_col)
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__score__", score)
        .withColumn("__salt__", salt)
        .withColumn("__prank__", F.row_number().over(w_partial))
        .where(F.col("__prank__") <= int(k))
        .withColumn("sample_rank", F.row_number().over(w_final))
        .where(F.col("sample_rank") <= int(k))
        .drop("__score__", "__salt__", "__prank__")
    )


def seeded_shuffle_shards(
    df,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "epoch0",
):
    """Reproducible corpus shuffle + sharding — the training-order step:
    every row gets a shard and a position inside it, both pure functions
    of (seed, id), so any worker can reconstruct epoch order with no
    coordination and a different seed string reshuffles everything.

    Coin = md5(seed || id) (the engine's deterministic-coin convention,
    cf. train_val_test_split): first nibble → shard (n_shards ≤ 16 via
    one nibble, larger via more nibbles upstream), position = rank of
    the full digest within the shard.  The plan is one hash projection
    + a per-shard window sort — each shard sorts |corpus|/n_shards rows
    independently (no global sort); at 100 TB you raise n_shards until
    a shard fits a task's spill budget.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    if not 1 <= n_shards <= 16:
        raise ValueError("n_shards must be in [1, 16] (one md5 nibble)")
    coin = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    hexmap = {c: i for i, c in enumerate("0123456789abcdef")}
    nib = F.substring(coin, 1, 1)
    shard = F.lit(0)
    for c, i in hexmap.items():
        shard = F.when(nib == c, i % n_shards).otherwise(shard)
    out = df.select(
        id_col, shard.alias("shard"), coin.alias("__coin__")
    )
    w = W.partitionBy("shard").orderBy("__coin__", id_col)
    return out.select(
        id_col, "shard", F.row_number().over(w).alias("pos")
    )


def dsir_log_ratios(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al., *Data Selection for Language
    Models via Importance Resampling*, NeurIPS 2023): score every raw
    document by how much more likely its tokens are under a LM of the
    TARGET distribution (the high-quality / in-domain corpus you want
    more of) than under a LM of the raw SOURCE corpus itself —
    log w(x) = Σ_t [log p_tgt(t) − log p_src(t)], add-1-smoothed
    unigram models on both sides.  High log_ratio = looks like the
    target; the weights feed importance RESAMPLING
    (``dsir_resample``), which provably corrects the source
    distribution toward the target.

    ``n_buckets`` is the fixed-size-table trick DSIR itself uses (Xie
    et al. hash into 10k buckets): each token maps to
    ``md5(tok)[0:8] mod n_buckets`` (the engine's deterministic-coin
    convention, so a DuckDB oracle reproduces the buckets exactly) and
    the two model tables are EXACTLY ``≤ n_buckets`` rows at ANY corpus
    size — the smoothing support is the full fixed bucket space
    (V = n_buckets), making both models proper distributions over it.
    With ``n_buckets=None`` features are raw tokens: model tables are
    vocab-sized (Heaps-bounded at test scale) and smoothing uses the
    UNION vocabulary (V = distinct tokens across source ∪ target) so no
    token has probability 0 under either model.  Collisions under
    hashing only blur the models (two tokens sharing a bucket share a
    probability) — selection quality degrades gracefully as buckets
    shrink (tested).

    Emits (id, n_tokens, log_ratio) for docs with ≥ 1 token; scoring is
    two equi-joins + a per-doc aggregate, all codegen.
    """
    from crick_spark.pipeline.retrieval import hashed_feature, tokens_expr

    # ONE shared definition with the NB classifier (classify._feat) —
    # the cross-module same-bucketing claim holds by construction
    feat = lambda col: hashed_feature(col, n_buckets)  # noqa: E731

    doc_toks = docs.select(
        id_col, F.explode(tokens_expr(F.col(text_col))).alias("__t__")
    ).select(id_col, feat(F.col("__t__")).alias("tok"))
    if n_buckets is not None:
        # r15 (guide §4/§2.3): in hashed mode every token pays an md5 +
        # mod, and the relation has TWO consumers (the source census and
        # the per-doc scoring join) — without materialization the hash
        # pass over the whole corpus executes twice.  The checkpointed
        # rows are (id, int) — fixed-width, payload-free, the class this
        # codebase already materializes — unlike RAW mode, whose token
        # strings would make the barrier cost more than the re-scan
        # saves (the r14 postings-checkpoint lesson), so raw mode keeps
        # the two-pass shape.  Lazy, so plan construction stays
        # side-effect-free for preflight.
        doc_toks = doc_toks.localCheckpoint(eager=False)
    tgt_toks = target.select(
        F.explode(tokens_expr(F.col(text_col))).alias("__t__")
    ).select(feat(F.col("__t__")).alias("tok"))
    src_cnt = doc_toks.groupBy("tok").agg(F.count("*").alias("c_src"))
    tgt_cnt = tgt_toks.groupBy("tok").agg(F.count("*").alias("c_tgt"))
    vocab = (
        src_cnt.select("tok")
        .unionByName(tgt_cnt.select("tok"))
        .distinct()
        .join(src_cnt, "tok", "left")
        .join(tgt_cnt, "tok", "left")
        .select(
            "tok",
            F.coalesce("c_src", F.lit(0)).alias("c_src"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
    )
    totals = vocab.agg(
        F.sum("c_src").cast("double").alias("t_src"),
        F.sum("c_tgt").cast("double").alias("t_tgt"),
        # hashed mode: the support is the FULL fixed bucket space, seen
        # or not — the table stays O(n_buckets) and the smoothing
        # denominator is corpus-independent
        (
            F.lit(float(n_buckets))
            if n_buckets is not None
            else F.count("*").cast("double")
        ).alias("v"),
    )
    scored = (
        doc_toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__lr__",
            F.log((F.col("c_tgt") + 1) / (F.col("t_tgt") + F.col("v")))
            - F.log((F.col("c_src") + 1) / (F.col("t_src") + F.col("v"))),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("__lr__"), 6).alias("log_ratio"),
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> DataFrame:
    """DSIR selection: importance-resample ``k`` source docs toward the
    target distribution via the GUMBEL-TOP-K trick DSIR itself uses —
    score = log_ratio + Gumbel(0,1) and keep the k largest, which draws
    without replacement proportionally to softmax(log_ratio).  The
    Gumbel comes from the repo's deterministic md5 coin
    (g = −ln(−ln u)), so the selected set is reproducible and
    SQL-oracle-able.  Everything stays in LOG space: per-doc log-ratios
    are token sums reaching ±hundreds, where the equivalent
    Efraimidis–Spirakis u^(1/w) comparator overflows exp().  The
    half-step on the 24-bit coin keeps u strictly inside (0,1) — u = 0
    would make the Gumbel infinite.  ``n_buckets`` selects the
    fixed-size hashed-feature models (see ``dsir_log_ratios``) — the
    100 TB path.  Emits the selected (id, n_tokens, log_ratio) rows."""
    lr = dsir_log_ratios(docs, target, id_col, text_col, n_buckets)
    bits = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10
    ).cast("double")
    u = (bits + F.lit(0.5)) / F.lit(float(1 << 24))
    gumbel = -F.log(-F.log(u))
    return (
        lr.withColumn("__s__", F.col("log_ratio") + gumbel)
        .orderBy(F.desc("__s__"), F.col(id_col))
        .limit(int(k))
        .select(id_col, "n_tokens", "log_ratio")
    )


# Truncated-Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/j!):
# a uniform coin maps to the weight whose cumulative bin it lands in; mass
# beyond w=6 (8.3e-5) folds into 6.  Literal doubles so a SQL oracle can
# reproduce the mapping bit-for-bit.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_reps: int = 40,
    level: float = 0.95,
) -> DataFrame:
    """Deterministic Poisson bootstrap for the mean (Chamandy et al.,
    *Estimating uncertainty for massive data streams*, Google 2012 —
    the single-pass bootstrap used on datasets where resampling rows is
    impossible): each row joins replicate r with weight ~ Poisson(1)
    drawn from the engine's content-stable md5 coin on (id, r), so the
    whole resample plan is ONE explode + one grouped aggregate —
    mergeable, no shuffling of the data beyond the replicate rollup,
    and byte-reproducible by any engine with md5 (SQL-oracle-able).

    The interval is EMPIRICAL order-statistic selection over the R
    replicate means (ranks floor(α/2·(R−1))+1 and floor((1−α/2)·(R−1))+1
    on means rounded to 1e-6, ties by replicate id) — integer rank
    selection, not interpolation, so the exact same two replicates are
    chosen in any engine.  Poisson(1) weights are truncated at 6
    (tail mass 8.3e-5, POISSON1_CDF) to keep the coin→weight map a
    finite literal CASE both sides.  The 1e-6 round is epsilon-bumped
    (+1e-9, far below half an output grid step but far above f64
    summation noise) because a weighted mean can sit EXACTLY on a
    rounding half-boundary and Spark/DuckDB would then round a
    noise-perturbed sum to different grid points, swapping the selected
    order statistics (ADVICE r13 — same hazard class as
    operators/timeseries.py resample_interpolate).  A replicate whose
    weights are ALL zero (possible only for tiny inputs) has a NULL
    mean; it is dropped before ranking on both sides — Spark orders
    NULLS FIRST, DuckDB NULLS LAST, so keeping them would select
    different replicates cross-engine (ADVICE r13).

    Returns one row: (n_rows, mean, boot_lo, boot_hi, n_reps).  At
    100 TB the explode is R× the scan width of ONE column pair — the
    documented cost of bootstrap-grade uncertainty in a single pass."""
    from pyspark.sql import Window

    R = int(n_reps)
    if R < 4:
        raise ValueError(f"n_reps must be >= 4, got {R}")
    if not (0.0 < level < 1.0):
        raise ValueError(f"level must be in (0, 1), got {level}")
    alpha = 1.0 - level
    lo_rank = int((alpha / 2) * (R - 1)) + 1
    hi_rank = int((1 - alpha / 2) * (R - 1)) + 1

    rows = df.select(
        F.col(id_col).alias("__id__"), F.col(value_col).alias("__x__")
    ).where(F.col("__x__").isNotNull())
    rep = rows.select(
        "__id__",
        "__x__",
        F.explode(F.sequence(F.lit(0), F.lit(R - 1))).alias("__r__"),
    )
    u = md5_uniform(F.concat_ws("#", F.col("__id__"), F.col("__r__")))
    w = F.lit(6)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    reps = (
        rep.withColumn("__w__", w)
        .groupBy("__r__")
        .agg(
            (
                F.sum(F.col("__w__") * F.col("__x__"))
                / F.sum("__w__")
            ).alias("__m__")
        )
        .select(
            "__r__", F.round(F.col("__m__") + F.lit(1e-9), 6).alias("__m__")
        )
        .where(F.col("__m__").isNotNull())
    )
    wnd = Window.orderBy("__m__", "__r__")  # R rows: single-task is right
    ranked = reps.withColumn("__rk__", F.row_number().over(wnd))
    picks = ranked.where(F.col("__rk__").isin([lo_rank, hi_rank])).agg(
        F.min("__m__").alias("boot_lo"), F.max("__m__").alias("boot_hi")
    )
    base = rows.agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("__x__") + F.lit(1e-9), 6).alias("mean"),
    )
    return base.crossJoin(F.broadcast(picks)).select(
        "n_rows",
        "mean",
        "boot_lo",
        "boot_hi",
        F.lit(R).cast("int").alias("n_reps"),
    )
