"""Iterative graph algorithms as DataFrame plans: weighted PageRank.

Companion to the connected-components label propagation in
``pipeline/dedup.py`` (the other iterative operator): both express the
iteration as repeated joins over an edge relation, letting Catalyst
plan each step.

100 TB shape per iteration: one join of the rank vector (2 cols: node,
rank) against the out-weight-normalized edge list, one groupBy(dst) —
i.e. two shuffles over edge-count rows, never materializing anything
quadratic.  The edge list is computed once and cached/reused across
iterations; for long iteration chains the rank vector is automatically
localCheckpoint-truncated every ``checkpoint_interval`` steps (same
lineage-control pattern as dedup's components loop), so plan depth and
scheduler cost stay bounded at any iteration count.  Fixed iteration
counts keep results deterministic and SQL-oracle-able (the oracle
unrolls the same iterations as chained CTEs); deep chains are
cross-checked against a numpy power iteration instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    eager: bool = False,
    broadcast_ranks: bool = False,
    dangling: str = "redistribute",
    checkpoint_interval: int | None = None,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns
    ``(node, rank)`` after ``iterations`` synchronous updates from a
    uniform 1/N start:  r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)·w(u,v)/outw(u)
    + dm/N), where dm is the rank mass sitting on dangling (no
    out-edge) nodes this iteration.

    ``dangling="redistribute"`` (default) spreads dangling mass
    uniformly — the standard correction that keeps total rank mass at
    exactly 1.0 on graphs with sinks.  The per-iteration cost is one
    semi-join of the 2-column rank vector against the precomputed
    dangling-node set plus a 1-row broadcast.  ``dangling=
    "assume_none"`` skips that machinery entirely for graphs that have
    an out-edge on every node BY CONSTRUCTION (bidirectionalized edge
    lists); results are identical on such graphs (dm ≡ 0), it is purely
    the cheaper plan.

    Lineage control: the rank vector is localCheckpoint-truncated every
    ``checkpoint_interval`` iterations automatically, so deep chains
    (iterations ≫ 5) keep bounded plan depth instead of accumulating
    2·iterations joins of analysis work — the dedup components loop's
    pattern, now built in.  The default (``None``) auto-selects:
    interval=1 — the per-superstep materialization Pregel/GraphX does —
    for deep chains (iterations > 5), MEASURED 6.3 s vs ~11-13 s at
    interval=5 on the sf0.01 purchase graph at 10 iterations (and far
    worse unbounded); interval=5 (i.e. effectively no truncation) for
    shallow chains, where each eager materialization would serialize
    the pipeline for no lineage benefit.  Override with an explicit
    interval when the rank vector is too large to materialize cheaply
    each step (it is 2 columns — it rarely is), or ``0`` to disable
    (only sensible for the shallow, fully-unrolled oracle forms).

    The normalized edge list and node set are cached for reuse across
    iterations.  With ``eager=True`` the final rank vector is
    materialized (``localCheckpoint``) and both caches are released
    before returning — use this in long-lived sessions that run many
    queries; the default lazy mode leaves the caches alive for the
    lifetime of the returned plan (compose further, then release them
    via the ``crick_cache_handles`` attribute on the returned
    DataFrame: ``for h in out.crick_cache_handles: h.unpersist()``).
    """
    if dangling not in ("redistribute", "assume_none"):
        raise ValueError(f"unknown dangling mode: {dangling!r}")
    if checkpoint_interval is None:
        checkpoint_interval = 1 if iterations > 5 else 5
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    norm = e.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    ).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    # N in-plan (1-row broadcast cross join), not a driver-side
    # count(): no extra job per call, no value baked into the closure —
    # the same pattern as the decayed-quantiles reference day
    cnt = nodes.agg(F.count("*").cast("double").alias("__n"))
    dang = None
    if dangling == "redistribute":
        # dangling node set, computed once: nodes with no out-edge
        dang = nodes.join(
            outw.select(F.col("src").alias("node")), "node", "left_anti"
        ).cache()
    ranks = nodes.crossJoin(F.broadcast(cnt)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    live_caches: list[DataFrame] = []
    for it in range(iterations):
        if dang is not None and not broadcast_ranks and checkpoint_interval != 1:
            # the dangling branch makes each iteration read the rank
            # vector TWICE (contrib + dm) — without sharing, execution
            # work doubles per step (2^interval redundant subtrees
            # between truncations; measured 35 s vs 4 s at sf0.01 for
            # 10 iterations).  Caching the 2-column vector makes both
            # branches hit one InMemoryRelation: linear work, still a
            # single action.  Handles are released at each truncation
            # boundary (everything before a checkpoint is materialized)
            # and at eager return.
            ranks = ranks.cache()
            live_caches.append(ranks)
        # broadcast_ranks ships the 2-column rank vector map-side so the
        # edge list never re-shuffles.  MEASURED at sf0.1 (16k nodes,
        # 3 iterations): 8.1 s vs 6.5 s for the default shuffle join —
        # each broadcast must materialize the previous iteration first,
        # serializing the chain, so it LOSES at shallow depth on small
        # graphs; it wins only when the edge-list shuffle dominates
        # (edges ≫ nodes x iterations).  Default stays the shuffle join.
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            r.join(norm, r.node == norm.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        if dang is not None:
            # rank mass stranded on sinks this iteration — 1-row
            # broadcast; empty dangling set sums to NULL -> 0.0
            dm = ranks.join(dang, "node", "left_semi").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
            )
            redistributed = F.lit(damping) * F.col("__dm") / F.col("__n")
        else:
            dm = None
            redistributed = F.lit(0.0)
        nxt = nodes.join(contrib, "node", "left").crossJoin(
            F.broadcast(cnt)
        )
        if dm is not None:
            nxt = nxt.crossJoin(F.broadcast(dm))
        ranks = nxt.select(
            "node",
            (
                F.lit(1.0 - damping) / F.col("__n")
                + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                + redistributed
            ).alias("rank"),
        )
        if (
            checkpoint_interval
            and (it + 1) % checkpoint_interval == 0
            and it + 1 < iterations
        ):
            ranks = ranks.localCheckpoint(eager=True)
            for c in live_caches:
                c.unpersist()
            live_caches.clear()
    if eager:
        ranks = ranks.localCheckpoint(eager=True)
        for c in live_caches:
            c.unpersist()
        live_caches.clear()
        norm.unpersist()
        nodes.unpersist()
        if dang is not None:
            dang.unpersist()
    else:
        # lazy mode: the returned plan still depends on these cached
        # relations, so they cannot be unpersisted here — expose the
        # handles so a caller composing further can release them after
        # its own materialization (repeat lazy calls in a long-lived
        # session should prefer eager=True, which leaks nothing)
        ranks.crick_cache_handles = (
            list(live_caches)
            + [norm, nodes]
            + ([dang] if dang is not None else [])
        )
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components by hash-min label propagation — the step that
    turns near-duplicate PAIRS into dedup CLUSTERS (pick one canonical
    doc per component; transitive closure of the pair relation).

    Every node starts labeled with its own id; each superstep replaces
    the label with the min over itself and its neighbors' labels, so the
    component's minimum id floods outward one hop per step — convergence
    in O(component diameter) supersteps, checked with a changed-label
    count per step (one action; the loop exits as soon as a step changes
    nothing, max_iter is the runaway bound, and exhausting it without
    convergence raises rather than returning a half-propagated
    labeling).  Lineage is truncated per superstep (localCheckpoint, the
    pagerank pattern) so the plan never grows with iterations.

    Near-dup components are tiny in practice (diameter ≤ a few hops), so
    plain min-propagation is the right plan; for adversarial
    long-diameter graphs the alternating star contractions of
    Kiveris et al., *Connected components in MapReduce and beyond*
    (SoCC 2014) bound rounds at O(log n) — same per-step join shape.

    Returns (node, component) with component = min node id reachable.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .cache()
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            labels.join(und, labels.node == und.u)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        nxt = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nmin"), F.col("component"))
                    < F.col("component")
                ).alias("__changed__"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.where("__changed__").limit(1).count()
        labels = nxt.drop("__changed__")
        if changed == 0:
            und.unpersist()
            return labels
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} supersteps"
    )
