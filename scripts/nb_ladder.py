"""quality_classifier data-ladder (VERDICT r5 item 5 done-criterion:
"a ladder showing per-row cost flat at 4× data").

Design: the TRAINING set is held fixed (the base corpus's
deterministic labeled split, exactly q_quality_classifier's) — the
model is O(n_buckets) state regardless of corpus size — while the
SCORE set is the ×k replicated corpus (pipeline_ladder.replicated_docs:
every token suffixed by replica id, so hashed-feature work per row is
scale-invariant and replicas can't alias). Scoring is the corpus-sized
stage (explode → codegen hash → map-side-combined groupBy → broadcast
model join → one groupBy(doc) sum), so per-row cost flat at 4× is the
claim "this plan composes at 100×" made measurable.

Protocol: as pipeline_ladder.py — one discarded warm-up, rungs
interleaved per epoch, medians; each run in cache.tracking_scope().

Usage: python scripts/nb_ladder.py [reps=3] [k_low=4] [k_high=16]
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
    from newspaper_spark.operators.quality_nb import nb_quality_scores
    from newspaper_spark.sources.transcripts import load_table
    from pipeline_ladder import replicated_docs

    p = spark.sparkContext.defaultParallelism
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    labeled = base.filter(F.col("doc_id") % 2 == 0).withColumn(
        "is_pos", F.col("doc_id") % 10 == 0
    )
    docs = replicated_docs(spark, k).repartition(p).persist()
    n_rows = docs.count()  # materialize input OUTSIDE the timed section
    try:
        t0 = time.time()
        with cache.tracking_scope():
            scored = nb_quality_scores(docs, labeled, n_buckets=1024)
            scored.write.format("noop").mode("overwrite").save()
            n_hq = scored.filter("pred_hq").count()
        wall = time.time() - t0
    finally:
        docs.unpersist()
    return {
        "k": k,
        "n_rows": n_rows,
        "wall": round(wall, 2),
        "us_per_row": round(wall / n_rows * 1e6, 1),
        "n_pred_hq": n_hq,
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="nb-ladder")
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
                "n_pred_hq": samples[rung][0]["n_pred_hq"],
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
