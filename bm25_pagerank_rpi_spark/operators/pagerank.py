"""Native PageRank — the engine-side replacement for the reference's
link-analysis HTTP service (reference internal/ranking/data_getters.go:147-181
fetches {pageRank, inLinkCount, outLinkCount} per URL; features.go:246-253
joins it onto candidates). Here the graph, the iteration, and the info
table are all built inside Spark.

Graph over transcripts (SURVEY.md §1.3): within-conversation forward
edges turn_i -> turn_{i+1} plus a "return to root" edge turn_i -> turn_0
for i > 0. Every turn therefore has out-degree >= 1 except a
single-turn conversation's root (the only possible dangling node).

Iteration: classic damped power method as a join-agg loop,
    rank'(v) = (1-d)/N + d * sum over in-edges (rank(u) / out_deg(u))
with optional dangling-mass redistribution. Lineage is cut with
localCheckpoint every ``checkpoint_every`` iterations — without it the
plan doubles per iteration and Catalyst analysis time explodes.

Scale notes (10^12 turns):
- ranks and edges shuffle on the node key each iteration; pre-partition
  both on ``node``/``src`` once (``repartition(node)``) so the join is
  co-partitioned and only the groupBy(dst) reshuffles.
- out_deg is computed once and cached with the edge list.
- the conversation-local edge structure means contributions are heavily
  local; a real deployment would bucket by conv_id so most contribution
  traffic never crosses executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 10


def transcript_edges(transcripts_with_id: DataFrame) -> DataFrame:
    """(src, dst) string doc_id edges from a transcript table that already
    carries ``doc_id`` (sources.transcripts.with_doc_identity)."""
    t = transcripts_with_id.select("conv_id", "turn_idx", "doc_id")
    nxt = t.select(
        F.col("conv_id"),
        (F.col("turn_idx") - 1).alias("turn_idx"),
        F.col("doc_id").alias("dst"),
    )
    forward = t.join(nxt, ["conv_id", "turn_idx"]).select(
        F.col("doc_id").alias("src"), "dst"
    )
    first = t.groupBy("conv_id").agg(F.min("turn_idx").alias("turn_idx"))
    root = t.join(first.withColumnRenamed("turn_idx", "first_idx"), "conv_id").where(
        F.col("turn_idx") != F.col("first_idx")
    )
    root_ids = t.join(first, ["conv_id", "turn_idx"]).select(
        "conv_id", F.col("doc_id").alias("dst")
    )
    to_root = root.join(root_ids, "conv_id").select(F.col("doc_id").alias("src"), "dst")
    return forward.unionByName(to_root)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    redistribute_dangling: bool = False,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, pagerank) after ``iterations`` damped power-method steps.

    ``nodes``: one column ``node``; ``edges``: (src, dst). With
    ``redistribute_dangling`` the rank mass of out-degree-0 nodes is
    spread uniformly each step (true PageRank); off, their mass leaks —
    kept as the default because the oracle-checkable recursive-SQL twin
    uses the same convention and our transcript graph has no dangling
    nodes by construction."""
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank"))
    # co-partitioning: pin nodes on ``node`` and the degree-annotated edge
    # list on ``src`` ONCE, with the same explicit partition count. Each
    # iteration's ranks then inherit hashpartitioning(node, npart) from the
    # previous step's join, so the ranks ⋈ edges join and the nodes ⋈
    # contribs join are both exchange-free — the only per-iteration shuffle
    # is the groupBy(dst) contribution aggregation. AQE is suspended for
    # the loop (restored after): its runtime coalescing re-plans every
    # query's partition count independently, which silently re-introduces
    # an exchange per join; a fixed-topology iterative loop is the one
    # place static planning beats adaptive. (Skew backstop lost thereby is
    # bounded here: conversation-local edges cap in-degree by conv length.)
    spark = nodes.sparkSession
    npart = int(
        spark.conf.get("spark.sql.shuffle.partitions")
        or spark.sparkContext.defaultParallelism
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_loop(
            spark, nodes, edges, n, npart, damping, iterations,
            redistribute_dangling, checkpoint_every,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)


def _pagerank_loop(
    spark,
    nodes: DataFrame,
    edges: DataFrame,
    n: int,
    npart: int,
    damping: float,
    iterations: int,
    redistribute_dangling: bool,
    checkpoint_every: int,
) -> DataFrame:
    """``nodes`` may carry optional ``_base`` (per-node teleport mass added
    each step) and ``_init`` (starting rank) columns — the seam that makes
    the same exchange-free loop serve both uniform PageRank (base =
    (1-d)/n, init = 1/n everywhere) and personalized PageRank (mass
    concentrated on a source set). Defaults preserve uniform semantics
    bit-for-bit: F.lit((1-d)/n) is the same literal the base column holds."""
    if "_base" not in nodes.columns:
        nodes = nodes.withColumn("_base", F.lit((1.0 - damping) / n))
    if "_init" not in nodes.columns:
        nodes = nodes.withColumn("_init", F.lit(1.0 / n))
    nodes = nodes.repartition(npart, "node").persist()
    # optional edge weights: an edges relation carrying a ``weight`` column
    # distributes each node's rank proportionally (out_deg becomes the
    # weight sum). Without one, the expressions below are EXACTLY the
    # unweighted originals — bit-for-bit, so the recursive-CTE oracles and
    # parity tests for uniform/personalized PageRank are untouched.
    weighted = "weight" in edges.columns
    if weighted:
        deg = edges.groupBy("src").agg(F.sum("weight").alias("out_deg"))
    else:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edeg = edges.join(deg, "src").repartition(npart, "src").persist()
    edeg.count()

    ranks = nodes.select("node", F.col("_init").alias("rank"))
    for i in range(iterations):
        mass = (
            F.col("rank") * F.col("weight") / F.col("out_deg")
            if weighted
            else F.col("rank") / F.col("out_deg")
        )
        contribs = (
            ranks.join(edeg, ranks.node == edeg.src)
            .select(F.col("dst").alias("node"), mass.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        new = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.col("_base") + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
        )
        if redistribute_dangling:
            # dangling mass stays IN the plan (1-row broadcast) instead of
            # a driver collect per iteration
            dangling = (
                ranks.join(deg, ranks.node == deg.src, "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
            new = new.crossJoin(F.broadcast(dangling)).select(
                "node",
                (F.col("rank") + F.lit(damping) * F.col("_dm") / F.lit(float(n))).alias("rank"),
            )
        ranks = new
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.col("rank").alias("pagerank")).localCheckpoint(
        eager=True
    )
    edeg.unpersist()
    nodes.unpersist()
    return out


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    sources: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Topic-sensitive (personalized) PageRank: the teleport vector is
    uniform over ``sources`` (one column ``node``) instead of over all
    nodes, so rank mass localizes around the source set — "importance
    relative to these conversations/documents" (Haveliwala 2002), the
    standard seed-expansion primitive for related-content discovery.

    Same exchange-free iteration as :func:`pagerank` (co-partitioned
    nodes/edges, one shuffle per step — the contribution aggregation);
    the only difference is the per-node teleport column:
    init = base = concentrated on S. Dangling mass is not redistributed
    (matches the uniform variant's oracle-checkable convention).
    Returns (node, pagerank)."""
    n = nodes.count()
    n_src = sources.count()
    if n == 0 or n_src == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank"))
    spark = nodes.sparkSession
    src = sources.select("node").withColumn("_is_src", F.lit(True))
    annotated = (
        nodes.join(F.broadcast(src), "node", "left")
        .select(
            "node",
            F.when(F.col("_is_src"), F.lit((1.0 - damping) / n_src))
            .otherwise(F.lit(0.0))
            .alias("_base"),
            F.when(F.col("_is_src"), F.lit(1.0 / n_src))
            .otherwise(F.lit(0.0))
            .alias("_init"),
        )
    )
    npart = int(
        spark.conf.get("spark.sql.shuffle.partitions")
        or spark.sparkContext.defaultParallelism
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _pagerank_loop(
            spark, annotated, edges, n, npart, damping, iterations,
            False, checkpoint_every,
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)


def link_info(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(node, inlinks, outlinks) — the PageRankInfo counts
    (reference types.go:108-112)."""
    ins = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("int").alias("inlinks")
    )
    outs = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("int").alias("outlinks")
    )
    return (
        nodes.join(ins, "node", "left")
        .join(outs, "node", "left")
        .select(
            "node",
            F.coalesce("inlinks", F.lit(0)).alias("inlinks"),
            F.coalesce("outlinks", F.lit(0)).alias("outlinks"),
        )
    )


def pagerank_table(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(node, pagerank, inlinks, outlinks) — the full S5-equivalent table
    candidates join against (J3)."""
    pr = pagerank(nodes, edges, damping, iterations, redistribute_dangling)
    return pr.join(link_info(nodes, edges), "node")


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, authority, hub) — Kleinberg's HITS (JACM 1999) by the same
    co-partitioned join-agg loop as pagerank: per iteration,
        auth'(v) = sum over in-edges of hub(u), then L1-normalize;
        hub'(u)  = sum over out-edges of auth(v), then L1-normalize.
    L1 (sum) normalization instead of the paper's L2 keeps every step a
    plain aggregate both engines evaluate identically (the eigenvector
    direction is the same; only the scale convention differs), and the
    normalizer stays IN the plan as a 1-row broadcast — no driver collect
    per iteration.

    Scale shape mirrors pagerank's loop: TWO pinned edge copies — one
    hash-partitioned on src (the auth pass joins hub on node==src
    exchange-free), one on dst (the hub pass joins auth on node==dst) —
    so each half-step pays exactly one shuffle, the contribution groupBy.
    AQE is suspended for the loop for the same fixed-topology reason as
    pagerank; lineage is cut with localCheckpoint."""
    spark = nodes.sparkSession
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("authority"), F.lit(0.0).alias("hub")
        )
    npart = int(
        spark.conf.get("spark.sql.shuffle.partitions")
        or spark.sparkContext.defaultParallelism
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _hits_loop(nodes, edges, npart, iterations, checkpoint_every)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)


def salsa(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 4,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(node, authority, hub) — SALSA (Lempel & Moran, WWW 2000): HITS
    with degree-normalized propagation, i.e. a random walk on the
    bipartite hub/authority graph instead of mutual reinforcement:
        auth'(v) = sum over in-edges (u,v) of hub(u) / outdeg(u)
        hub'(u)  = sum over out-edges (u,v) of auth(v) / indeg(v)
    Degree normalization makes SALSA robust to the tightly-knit-community
    effect that inflates HITS scores. The stochastic updates preserve L1
    mass exactly only on graphs with no dangling ends; the shared loop's
    per-half-step L1 normalizer (a 1-row in-plan broadcast) restores the
    convention on arbitrary graphs, so scores are comparable to hits().

    Same scale shape as hits(): the degree relations are edge-keyed
    aggregates computed ONCE and attached to the two pinned edge copies
    as a per-edge weight column before the loop, so each half-step is
    still exactly one shuffle (the contribution groupBy)."""
    spark = nodes.sparkSession
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("authority"), F.lit(0.0).alias("hub")
        )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("_id"))
    e_w = (
        edges.join(outdeg, "src")
        .join(indeg, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("_od")).alias("w_auth"),
            (F.lit(1.0) / F.col("_id")).alias("w_hub"),
        )
    )
    npart = int(
        spark.conf.get("spark.sql.shuffle.partitions")
        or spark.sparkContext.defaultParallelism
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _hits_loop(
            nodes, e_w, npart, iterations, checkpoint_every, weighted=True
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)


def _hits_loop(
    nodes: DataFrame,
    edges: DataFrame,
    npart: int,
    iterations: int,
    checkpoint_every: int,
    weighted: bool = False,
) -> DataFrame:
    # weighted=True (salsa): edges carry w_auth/w_hub multipliers; the
    # unweighted hits() path multiplies by a literal 1.0 so both variants
    # share one loop body bit-for-bit.
    if not weighted:
        edges = edges.select(
            "src", "dst",
            F.lit(1.0).alias("w_auth"), F.lit(1.0).alias("w_hub"),
        )
    nodes_p = nodes.repartition(npart, "node").persist()
    e_src = edges.repartition(npart, "src").persist()
    e_dst = edges.repartition(npart, "dst").persist()
    e_src.count(), e_dst.count()

    def _normalized(raw: DataFrame, out_col: str) -> DataFrame:
        # raw: (node, v) sparse — missing nodes are implicit zeros, so the
        # L1 normalizer over raw equals the normalizer over the dense frame
        total = raw.agg(F.coalesce(F.sum("v"), F.lit(0.0)).alias("_tot"))
        return (
            nodes_p.join(raw, "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.when(
                    F.col("_tot") > 0,
                    F.coalesce(F.col("v"), F.lit(0.0)) / F.col("_tot"),
                ).otherwise(F.lit(0.0)).alias(out_col),
            )
        )

    hub = nodes_p.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for i in range(iterations):
        auth_raw = (
            hub.join(e_src, hub.node == e_src.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("hub") * F.col("w_auth")).alias("v"))
        )
        auth = _normalized(auth_raw, "authority")
        hub_raw = (
            auth.join(e_dst, auth.node == e_dst.dst)
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("authority") * F.col("w_hub")).alias("v"))
        )
        hub = _normalized(hub_raw, "hub")
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            auth = auth.localCheckpoint(eager=True)
            hub = hub.localCheckpoint(eager=True)
    out = auth.join(hub, "node").localCheckpoint(eager=True)
    nodes_p.unpersist()
    e_src.unpersist()
    e_dst.unpersist()
    return out
