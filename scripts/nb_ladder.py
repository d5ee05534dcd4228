"""quality_classifier data-ladder (VERDICT r5 item 5 done-criterion):
train + score the hashed n-gram Naive Bayes at two data rungs (sf0.1
×4 and ×16) and show per-row cost stays flat.

Input: pipeline_ladder.replicated_docs — every token suffixed with its
replica id, so the DISTINCT-token vocabulary grows linearly with the
rung while the hashed model stays O(n_buckets). That is exactly the
scale property the operator claims: junk-vocabulary growth cannot grow
the model or the broadcast (contrast bpe_train, which must CAP its
vocabulary collect). Labeled split and scoring universe both scale
with the rung (train = doc_id%2==0, pos = doc_id%10==0 — the
q_quality_classifier construction).

Protocol: same as pipeline_ladder — discarded warm-up, interleaved
rungs per epoch, medians; each run inside cache.tracking_scope().

Usage: python scripts/nb_ladder.py [reps=3] [k_low=4] [k_high=16]
"""
from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from pipeline_ladder import replicated_docs  # noqa: E402


def run_rung(spark, k: int) -> dict:
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.quality_nb import nb_quality_scores

    p = spark.sparkContext.defaultParallelism
    docs = replicated_docs(spark, k).repartition(p).persist()
    n_rows = docs.count()  # materialize input OUTSIDE the timed section
    try:
        t0 = time.time()
        with cache.tracking_scope():
            labeled = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
                "is_pos", F.col("doc_id") % 10 == 0
            )
            scored = nb_quality_scores(docs, labeled, n_buckets=1024)
            scored.write.format("noop").mode("overwrite").save()
            n_pos = scored.filter("pred_hq").agg(F.count("*")).first()[0]
        wall = time.time() - t0
    finally:
        docs.unpersist()
    return {
        "k": k,
        "n_rows": n_rows,
        "wall": round(wall, 2),
        "us_per_row": round(wall / n_rows * 1e6, 1),
        "n_pred_pos": n_pos,
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="nb-ladder")
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
                "n_rows": samples[rung][0]["n_rows"],
                "wall_median_s": round(
                    statistics.median(s["wall"] for s in samples[rung]), 2
                ),
                "us_per_row_median": round(
                    statistics.median(s["us_per_row"] for s in samples[rung]), 1
                ),
                "walls": [s["wall"] for s in samples[rung]],
                "n_pred_pos": samples[rung][0]["n_pred_pos"],
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
