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

__all__ = ["pagerank_int"]


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """``(src, dst)`` edge relation → ``(node, out_degree, rank)``
    after ``iterations`` rounds of integer-exact damped PageRank.

    Nodes are the union of both endpoint sets; ``out_degree`` is 0
    for sink nodes (their rank decays to the base term, the standard
    no-redistribution simplification). Duplicate edges count once —
    callers wanting weights should pre-expand them deliberately.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("od"))
    base = (15 * scale) // 100
    r = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(r, e.src == r.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("((rank DIV od) * 85) DIV 100").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("inflow", F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return r.join(
        outdeg.select(F.col("src").alias("node"), "od"), "node", "left"
    ).select(
        "node",
        F.coalesce("od", F.lit(0)).cast("long").alias("out_degree"),
        "rank",
    )
