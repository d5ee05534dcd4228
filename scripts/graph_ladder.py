"""Graph-family data ladder: triangle_count + pagerank_int at x4 vs
x16 replica scale — per-edge cost flat, outputs exactly linear.

Design: the base graph is q_pagerank's deterministic 3-outlink
relation over the sf documents plus q_triangle_count's planted
clique; rung k replicates it as k DISJOINT components (node id =
base_node * k + r), so edge count, triangle count, and rank mass all
scale exactly linearly BY CONSTRUCTION — no cross-replica edges can
exist, and the components are interchangeable. This measures the
ENGINE's scaling on the orientation join / iteration joins, not an
accidentally super-linear input (the pipeline_ladder lesson).

Outputs verified per rung: triangle total = k x base total, node
count = k x base nodes (the disjointness witness).

Protocol: as pipeline_ladder.py — one discarded warm-up, rungs
interleaved per epoch, medians; each run in cache.tracking_scope().

Usage: python scripts/graph_ladder.py [reps=3] [k_low=4] [k_high=16]
"""
from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def base_edges(spark):
    from pyspark.sql import functions as F

    from newspaper_spark.sources.transcripts import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id")
    nn = d.agg(F.count("*").cast("long").alias("n"))
    e = (
        d.crossJoin(F.broadcast(nn))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.array(
                    (F.col("doc_id") * 2 + 1) % F.col("n"),
                    (F.col("doc_id") * 3 + 2) % F.col("n"),
                    (F.col("doc_id") * 7 + 5) % F.col("n"),
                )
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    cl = (
        d.crossJoin(F.broadcast(nn))
        .filter(F.col("doc_id") % F.expr("n div 6") == 3)
        .select(F.col("doc_id").alias("v"))
    )
    clique = (
        cl.select(F.col("v").alias("src"))
        .crossJoin(F.broadcast(cl.select(F.col("v").alias("dst"))))
        .filter(F.col("src") < F.col("dst"))
    )
    return e.unionAll(clique)


def run_rung(spark, k: int) -> dict:
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.graph import pagerank_int, triangle_count

    p = spark.sparkContext.defaultParallelism
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("r")
    e = base_edges(spark).select("src", "dst", reps).select(
        (F.col("src") * k + F.col("r")).alias("src"),
        (F.col("dst") * k + F.col("r")).alias("dst"),
    )
    edges = e.repartition(p).persist()
    n_edges = edges.count()  # materialize input OUTSIDE the timed section
    try:
        t0 = time.time()
        with cache.tracking_scope():
            tri = triangle_count(edges)
            tri.write.format("noop").mode("overwrite").save()
            n_tri = tri.agg(F.sum("n_triangles")).collect()[0][0] // 3
        tri_wall = time.time() - t0
        t0 = time.time()
        with cache.tracking_scope():
            pr = pagerank_int(edges, iterations=3)
            pr.write.format("noop").mode("overwrite").save()
            n_nodes = pr.count()
        pr_wall = time.time() - t0
    finally:
        edges.unpersist()
    return {
        "k": k,
        "n_edges": n_edges,
        "tri_wall": round(tri_wall, 2),
        "pr_wall": round(pr_wall, 2),
        "tri_us_per_edge": round(tri_wall / n_edges * 1e6, 2),
        "pr_us_per_edge": round(pr_wall / n_edges * 1e6, 2),
        "n_triangles": n_tri,
        "n_nodes": n_nodes,
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="graph-ladder")
    try:
        run_rung(spark, k_low)  # discarded warm-up
        samples: dict[int, list[dict]] = {k_low: [], k_high: []}
        for i in range(reps):
            for rung in (k_low, k_high):
                d = run_rung(spark, rung)
                samples[rung].append(d)
                print(f"[epoch {i}] {d}", file=sys.stderr)
        out = {}
        for rung in (k_low, k_high):
            out[f"x{rung}"] = {
                "n_edges": samples[rung][0]["n_edges"],
                "n_triangles": samples[rung][0]["n_triangles"],
                "n_nodes": samples[rung][0]["n_nodes"],
                "tri_us_per_edge_median": round(
                    statistics.median(
                        s["tri_us_per_edge"] for s in samples[rung]
                    ),
                    2,
                ),
                "pr_us_per_edge_median": round(
                    statistics.median(
                        s["pr_us_per_edge"] for s in samples[rung]
                    ),
                    2,
                ),
            }
        lo, hi = out[f"x{k_low}"], out[f"x{k_high}"]
        out["tri_per_edge_ratio"] = round(
            hi["tri_us_per_edge_median"] / lo["tri_us_per_edge_median"], 3
        )
        out["pr_per_edge_ratio"] = round(
            hi["pr_us_per_edge_median"] / lo["pr_us_per_edge_median"], 3
        )
        out["outputs_linear"] = (
            hi["n_triangles"] * k_low == lo["n_triangles"] * k_high
            and hi["n_nodes"] * k_low == lo["n_nodes"] * k_high
        )
        print(json.dumps(out, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
