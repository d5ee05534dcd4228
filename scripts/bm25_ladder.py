"""bm25_topk data-ladder: per-row cost flat at 4× data under max_df.

Design: the corpus is pipeline_ladder.replicated_docs (every token
suffixed by replica id → replicas are token-disjoint, so cross-replica
postings can't alias and workload scales linearly BY CONSTRUCTION).
The planted rare token is drawn mod 97·k — NOT mod 97 — so its
document frequency stays ~n_base/97 at every rung; this mirrors a real
growing corpus, where the vocabulary grows (Heaps) and the df of
informative terms stays bounded relative to a query's domain while
``max_df`` removes the stopword tail. Queries are every doc_id%17==5
document's first 6 tokens + its rare token (q_bm25_topk's recipe), so
the query count grows with the corpus and total candidate volume is
(#queries · bounded-df) = linear.

Claim made measurable: postings build, df side-table, candidate join,
and per-query top-k window all compose at 100× — per-corpus-row cost
flat (or falling) at 4× data.

Protocol: as pipeline_ladder.py — one discarded warm-up, rungs
interleaved per epoch, medians; each run in cache.tracking_scope().

Usage: python scripts/bm25_ladder.py [reps=3] [k_low=4] [k_high=16]
"""
from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_rung(spark, k: int) -> dict:
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.bm25 import _toks, bm25_topk
    from pipeline_ladder import replicated_docs

    p = spark.sparkContext.defaultParallelism
    d = replicated_docs(spark, k).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" tok"),
            (F.col("doc_id") % (97 * k)).cast("string"),
        ).alias("text"),
    )
    docs = d.repartition(p).persist()
    n_rows = docs.count()  # materialize input OUTSIDE the timed section
    try:
        q = docs.filter(
            (F.col("doc_id") % 17 == 5) & (F.length(F.trim("text")) > 0)
        ).select(
            F.col("doc_id").alias("query_id"),
            F.concat(
                F.array_join(F.slice(_toks(F.col("text")), 1, 6), " "),
                F.lit(" tok"),
                (F.col("doc_id") % (97 * k)).cast("string"),
            ).alias("query_text"),
        )
        t0 = time.time()
        with cache.tracking_scope():
            top = bm25_topk(docs, q, k=5, max_df=200)
            top.write.format("noop").mode("overwrite").save()
            n_out = top.count()
        wall = time.time() - t0
    finally:
        docs.unpersist()
    return {
        "k": k,
        "n_rows": n_rows,
        "wall": round(wall, 2),
        "us_per_row": round(wall / n_rows * 1e6, 1),
        "n_results": n_out,
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="bm25-ladder")
    try:
        run_rung(spark, k_low)  # discarded warm-up (cold plans/workers)
        samples: dict[int, list[dict]] = {k_low: [], k_high: []}
        for i in range(reps):
            for rung in (k_low, k_high):
                d = run_rung(spark, rung)
                samples[rung].append(d)
                print(f"[epoch {i}] {d}", file=sys.stderr)
        out = {}
        for rung in (k_low, k_high):
            out[f"x{rung}"] = {
                "n_rows": samples[rung][0]["n_rows"],
                "wall_median_s": round(
                    statistics.median(s["wall"] for s in samples[rung]), 2
                ),
                "us_per_row_median": round(
                    statistics.median(s["us_per_row"] for s in samples[rung]),
                    1,
                ),
                "walls": [s["wall"] for s in samples[rung]],
                "n_results": samples[rung][0]["n_results"],
            }
        out[f"per_row_ratio_x{k_high}_over_x{k_low}"] = round(
            out[f"x{k_high}"]["us_per_row_median"]
            / out[f"x{k_low}"]["us_per_row_median"],
            3,
        )
        print(json.dumps(out, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
