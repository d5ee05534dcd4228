"""sparse_dot_pairs data-ladder: pair volume linear, per-row cost
flat at 4x data under the df cutoff.

Design: the corpus is pipeline_ladder.replicated_docs (every base
token suffixed by replica id -> replicas are token-disjoint, so the
base text can never create cross-replica candidate pairs) with the
query's planted tokens re-planted on the NEW doc_id basis:
'rare{id div 2}' (df=2 at every rung) and 'extra{id div 4}' (df=4 at
every rung). Candidate volume per term is therefore CONSTANT and the
number of informative terms grows linearly with the corpus -> total
pair volume is linear BY CONSTRUCTION (the pipeline_ladder lesson:
measure the engine, not an accidentally quadratic input). Meanwhile
the replica-suffixed base vocabulary has df ~ n_base >> max_df at
every rung, so the Bayardo frequency cutoff stays active and its
victim set grows with the vocabulary — the real-corpus shape (Heaps
growth + stopword cut).

Claim made measurable: tf/df build, cutoff, term self-join, and pair
aggregation compose at 100x — per-corpus-row cost flat (or falling)
at 4x data, output count exactly linear.

Protocol: as pipeline_ladder.py — one discarded warm-up, rungs
interleaved per epoch, medians; each run in cache.tracking_scope().

Usage: python scripts/sparse_ladder.py [reps=3] [k_low=4] [k_high=16]
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
    from newspaper_spark.operators.index import sparse_dot_pairs
    from pipeline_ladder import replicated_docs

    p = spark.sparkContext.defaultParallelism
    d = replicated_docs(spark, k).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" rare"),
            F.expr("cast(doc_id div 2 as string)"),
            F.lit(" extra"),
            F.expr("cast(doc_id div 4 as string)"),
        ).alias("text"),
    )
    docs = d.repartition(p).persist()
    n_rows = docs.count()  # materialize input OUTSIDE the timed section
    try:
        t0 = time.time()
        with cache.tracking_scope():
            pairs = sparse_dot_pairs(docs, max_df=50, min_dot=1)
            pairs.write.format("noop").mode("overwrite").save()
            n_out = pairs.count()
        wall = time.time() - t0
    finally:
        docs.unpersist()
    return {
        "k": k,
        "n_rows": n_rows,
        "wall": round(wall, 2),
        "us_per_row": round(wall / n_rows * 1e6, 1),
        "n_pairs": n_out,
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="sparse-ladder")
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
                "n_pairs": samples[rung][0]["n_pairs"],
            }
        out[f"per_row_ratio_x{k_high}_over_x{k_low}"] = round(
            out[f"x{k_high}"]["us_per_row_median"]
            / out[f"x{k_low}"]["us_per_row_median"],
            3,
        )
        out["pairs_linear"] = (
            out[f"x{k_high}"]["n_pairs"] * k_low
            == out[f"x{k_low}"]["n_pairs"] * k_high
        )
        print(json.dumps(out, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
