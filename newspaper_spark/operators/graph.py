"""Link-graph analytics — integer-exact PageRank over an edge
relation.

Web-scale corpus pipelines rank hosts/pages by link authority
constantly: crawl frontier prioritization (OPIC/PageRank-ordered
fetch), domain-quality priors for filtering (Common Crawl publishes
host-level harmonic-centrality/PageRank ranks for exactly this), and
seed selection. The reference engine (per-article newspaper3k) has no
graph analog; this is a beyond-reference operator completing the
iterative-algorithm family next to dedup.connected_components.

Exactness design (the repo's oracle discipline): classic damped
PageRank is float arithmetic whose cross-engine sum ORDER matters —
unreproducible relationally. This operator instead runs the SCALED
INTEGER form:

    r_0(v)     = scale
    r_{k+1}(v) = (15·scale) div 100
               + Σ_{u→v} ( (r_k(u) div outdeg(u)) · 85 ) div 100

All quantities are BIGINTs; integer division is truncating on
non-negative values in BOTH engines (Spark ``DIV``, DuckDB ``//``),
and the per-target sum is order-free because integer addition is
associative — so ranks are bit-deterministic and the DuckDB oracle
replays every iteration exactly. The truncation loses < 1 scale-unit
per edge per round (pick ``scale`` big enough that ranking order is
unaffected); dangling mass is NOT redistributed (nodes without
out-edges leak their rank, the common simplification — documented so
the oracle and any consumer agree).

Scale shape: each iteration is one equi-join of the edge relation
with the O(nodes) rank relation (narrow (node, long) rows — never
adjacency lists) plus a map-side-combined groupBy(dst). Hot in-degree
nodes are AQE-skew-split. Rank relations are localCheckpoint'd per
round: like connected_components (r3 lesson), chaining k join plans
without cutting lineage nests every previous round's plan and blows
up the optimizer well before the data does.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_int", "triangle_count"]


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = 1_000_000,
    weight_col: "str | None" = None,
    checkpoint_interval: int = 4,
) -> DataFrame:
    """``(src, dst[, weight])`` edge relation → ``(node, out_degree,
    rank)`` after ``iterations`` rounds of integer-exact damped
    PageRank.

    Nodes are the union of both endpoint sets (any equality-comparable
    type — longs for page graphs, strings for host graphs);
    ``out_degree`` is 0 for sink nodes (their rank decays to the base
    term, the standard no-redistribution simplification). Without
    ``weight_col`` duplicate edges count once; with it, duplicate
    (src, dst) rows sum their weights and each edge carries rank mass
    proportional to ``w / out_weight(src)`` — the weighted host-rank
    form (Common Crawl's host-level ranks weight by link
    multiplicity). The weighted recurrence is

        c(u→v) = (((r_k(u) DIV out_w(u)) * w) * 85) DIV 100

    — ``r DIV out_w`` FIRST, then the weight multiply, so every
    intermediate stays ≤ r·85 and can't overflow BIGINT even when
    rank mass concentrates (``(r*w) DIV out_w`` would overflow at
    web-scale hub weights); the extra truncation (< out_w scale-units
    per edge per round vs the rational form) is deterministic and
    replayed verbatim by the oracle. With weights all 1 this reduces
    EXACTLY to the unweighted formula, so one code path serves both.
    """
    from newspaper_spark import cache

    w = (
        F.coalesce(F.col(weight_col), F.lit(0)).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # persist is load-bearing when `edges` is itself a join/aggregation
    # pipeline (the host_rank case): e feeds nodes, outdeg, AND every
    # iteration's join — without it the whole upstream plan re-runs
    # per consumer per round (caught by the round-6 job-count audit:
    # 57 jobs for 3 iterations over a 7-node host graph)
    e = cache.track(
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            w.alias("w"),
        )
        .groupBy("src", "dst")
        .agg(
            (
                F.sum("w") if weight_col else F.lit(1)
            ).cast("long").alias("w")
        )
        .persist()
    )
    nodes = cache.track(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = cache.track(
        e.groupBy("src")
        .agg(
            F.count("*").cast("long").alias("od"),
            F.sum("w").cast("long").alias("ow"),
        )
        .persist()
    )
    # One prepared edge relation carrying the source's out-weight: each
    # iteration then needs a SINGLE equi-join with the rank relation
    # instead of (edges ⋈ ranks) ⋈ outdeg — one shuffle/broadcast fewer
    # per round, and the ow > 0 sink guard (a source whose weights sum
    # to 0 carries no rank mass and must act as a sink — without this
    # guard `rank DIV ow` raises DIVIDE_BY_ZERO under the session's
    # ANSI mode, ADVICE r6; trivially true on the unweighted path) is
    # applied ONCE here instead of once per iteration.
    ew = cache.track(
        e.join(outdeg.select("src", "ow"), "src")
        .filter(F.col("ow") > 0)
        .select("src", "dst", "w", "ow")
        .persist()
    )
    base = (15 * scale) // 100
    r = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    for i in range(iterations):
        contrib = (
            ew.join(r, ew.src == r.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(((rank DIV ow) * w) * 85) DIV 100").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        r = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce("inflow", F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        # PERIODIC lineage cut (GraphX-Pregel-style checkpointInterval),
        # not per-round: a shallow run keeps one end-to-end plan (the
        # leaves are the persisted nodes/ew relations, so nesting depth
        # = rounds-since-cut, bounded by the interval), while long runs
        # still cut lineage before the optimizer blows up (the r3
        # connected-components lesson at ~8 nested rounds).
        if (i + 1) % checkpoint_interval == 0 and (i + 1) < iterations:
            r = r.localCheckpoint(eager=False)
    return r.join(
        outdeg.select(F.col("src").alias("node"), "od"), "node", "left"
    ).select(
        "node",
        F.coalesce("od", F.lit(0)).cast("long").alias("out_degree"),
        "rank",
    )


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED graph induced by
    an edge relation — the cohesion/community primitive (local
    clustering structure, spam-farm detection in link graphs, graph
    feature generation) next to pagerank_int's authority ranking.

    Algorithm: degree-ordered edge orientation (the classic
    MapReduce-scale formulation — Suri & Vassilvitskii 2011, Cohen
    2009): canonicalize to distinct undirected edges, orient every
    edge from its lower-(degree, node) endpoint to the higher, and
    self-join oriented edges on their source to enumerate wedges.
    Every triangle is then counted EXACTLY ONCE — at its minimum-rank
    vertex, whose two triangle edges are both outgoing — and the
    wedge fan-out per vertex is bounded by oriented out-degree =
    O(sqrt(|E|)), so the hot high-degree hubs that would explode a
    naive neighbor join become wedge DESTINATIONS, not sources (the
    100x-scale argument; residual source skew is AQE-split, and every
    shuffle carries bare (node, node) pairs).

    Self-loops are dropped, duplicate/reverse edges collapse. Returns
    ``(node, degree, n_triangles)`` for every node of the canonical
    edge set — all exact BIGINT integers (no floats anywhere; a
    clustering-coefficient consumer divides 2T by deg(deg-1) itself).
    """
    a = F.least(F.col(src_col), F.col(dst_col)).alias("a")
    b = F.greatest(F.col(src_col), F.col(dst_col)).alias("b")
    und = (
        edges.filter(F.col(src_col) != F.col(dst_col))
        .select(a, b)
        .distinct()
    )
    from newspaper_spark import cache

    und = cache.track(und.persist())
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    deg = cache.track(deg.persist())
    # orient by (degree, node) total order: src = lower-rank endpoint
    keyed = (
        und.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
    )
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = cache.track(
        keyed.select(
            F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
        ).persist()
    )
    o1 = oriented.select(F.col("u"), F.col("v").alias("v1"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("v2"))
    wedges = o1.join(o2, "u").filter(F.col("v1") < F.col("v2"))
    closing = und.select(
        F.least("a", "b").alias("ca"), F.greatest("a", "b").alias("cb")
    )
    tris = wedges.join(
        closing,
        (F.least("v1", "v2") == F.col("ca"))
        & (F.greatest("v1", "v2") == F.col("cb")),
    ).select("u", "v1", "v2")
    per_node = (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )
