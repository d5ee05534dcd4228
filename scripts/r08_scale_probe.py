"""Round-8 scale-hold probe: the driver's round-end measurement may run
at a larger driver-generated SF, so every operator CHANGED this round
is timed at x1 and x10 disk-backed inputs (the prep_ladder pattern:
per-token replica suffix keeps within-replica workload shape identical
to the base corpus while cross-replica n-grams never collide; inputs
written to parquet so the rungs run real scan -> shuffle stages, not a
cached input).

Pass shape (CLAUDE.md ladder invariant): per-row cost at x10 at or
below x1 — per-row FALLING with scale = fixed per-job overhead
amortizing; per-row RISING would mean one of this round's changes
introduced super-linear work.

Operators probed: exact_substring_dedup + span_dedup (persisted span
table / 16-byte hash keys), dsir_scores (map-only lookahead bigrams +
slice target), bigram_backoff_logprob (map-only bigrams both passes),
pagerank_int (one-join iterations, periodic checkpoint), shard_assign
(scale-adaptive range width through the conf+AQE-decided
_global_offsets path — also covers pack_offsets, which shares it).

Usage: python scripts/r08_scale_probe.py [reps=3]
Writes artifacts/r08_scale_probe.json.
"""
from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

sys.path.insert(0, str(REPO / "scripts"))
from prep_ladder import build_input  # noqa: E402  (the r7 ladder's
# disk-backed replicated-input builder; cached under .ladder_cache/)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="r08-scale-probe")

    paths = {k: build_input(spark, k) for k in (1, 10)}
    rows = {k: spark.read.parquet(p).count() for k, p in paths.items()}

    def docs(k):
        return spark.read.parquet(paths[k])

    def run_exact_substr(k):
        from newspaper_spark.operators.span_dedup import exact_substring_dedup

        return exact_substring_dedup(docs(k), k=8)

    def run_span_dedup(k):
        from newspaper_spark.operators.span_dedup import span_dedup

        return span_dedup(docs(k))

    def run_dsir(k):
        from newspaper_spark.operators.dsir import dsir_scores

        return dsir_scores(docs(k), F.col("doc_id") % 10 == 0, n_buckets=1024)

    def run_backoff(k):
        from newspaper_spark.operators.textstats import bigram_backoff_logprob

        d = docs(k)
        return bigram_backoff_logprob(d, d.filter(F.col("doc_id") % 2 == 0))

    def run_pagerank(k):
        from newspaper_spark.operators.graph import pagerank_int

        d = docs(k).select("doc_id")
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
        return pagerank_int(e, iterations=3)

    def run_shard_assign(k):
        from newspaper_spark.operators.packing import shard_assign

        counted = docs(k).select(
            "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
        )
        return shard_assign(counted, shard_tokens=4096, seed="shard")

    ops = {
        "exact_substr": run_exact_substr,
        "span_dedup": run_span_dedup,
        "dsir": run_dsir,
        "stupid_backoff": run_backoff,
        "pagerank": run_pagerank,
        "shard_assign": run_shard_assign,
    }

    # warm-up (cold-session outlier, CLAUDE.md): one full x1 pass
    for fn in ops.values():
        with cache.tracking_scope():
            fn(1).write.format("noop").mode("overwrite").save()

    result = {"rows": rows, "reps": reps, "ops": {}}
    for name, fn in ops.items():
        per_k = {}
        for k in (1, 10):
            samples = []
            for _ in range(reps):
                t0 = time.time()
                with cache.tracking_scope():
                    fn(k).write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            med = statistics.median(samples)
            per_k[k] = {
                "wall_med_s": med,
                "samples": samples,
                "us_per_row": round(med / rows[k] * 1e6, 1),
            }
        ratio = per_k[10]["us_per_row"] / per_k[1]["us_per_row"]
        result["ops"][name] = {
            "x1": per_k[1],
            "x10": per_k[10],
            "per_row_ratio_x10_over_x1": round(ratio, 3),
        }
        print(name, json.dumps(result["ops"][name]), flush=True)
    spark.stop()

    out = REPO / "artifacts" / "r08_scale_probe.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
