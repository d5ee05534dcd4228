"""End-to-end pipeline data-ladder (VERDICT r4 item 5): compose the
real corpus-prep chain once —

    documents → dedup_exact → paragraph_dedup →
    minhash_lsh_pairs(max_group_size=64)  [side audit branch]
    → line_filters (RefinedWeb line-wise, round 5) →
    gopher word-count gate → token counts → pack_offsets

— and run the IDENTICAL composition at two data rungs (sf0.1 ×4 and
×16: 20k vs 80k docs) to show per-row cost stays flat, i.e. the claim
"these plans compose at 100×" made measurable on this host.

Input design (what the ladder must hold fixed to isolate the engine):
the ×k rung replicates the documents table k× with EVERY whitespace
token suffixed by the replica index. Within a replica the duplicate
structure (repeated paragraphs, shingle collisions) is EXACTLY the
base corpus's, so per-row dedup/LSH work is scale-invariant; across
replicas no 3-word shingle and no paragraph can ever collide, so pair
volume grows LINEARLY in k (a plain salted-suffix design instead
produced near-identical replicas and quadratic cross-replica pair
growth — that measures the input's duplicate rate, not the engine).
The replicated input is persisted and counted BEFORE the timed
section, like bench.py's harness input. The gopher gate uses the
word_count_ok rule (55% selective on this corpus); the full `keep`
conjunction is degenerate here because the synthetic corpus has <2
distinct Gopher stopwords per doc (stopword_ok=0 for all rows).

Protocol (host noise ±15%, CLAUDE.md): one discarded warm-up at ×4,
then rungs interleave A,B per epoch; medians reported. Each timed run
sits in cache.tracking_scope() so operator persists are rebuilt per
run and freed between runs.

Usage: python scripts/pipeline_ladder.py [reps=3] [k_low=4] [k_high=16]
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


def replicated_docs(spark, k: int):
    from pyspark.sql import functions as F

    from newspaper_spark.sources.transcripts import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("r")
    d = d.select("doc_id", "text", reps)
    # '$1~rK': suffix EVERY token with the replica id (see module doc)
    repl = F.concat(F.lit(r"$1~r"), F.col("r").cast("string"))
    return d.select(
        (F.col("doc_id") * k + F.col("r")).alias("doc_id"),
        F.regexp_replace(
            F.coalesce("text", F.lit("")), r"(\S+)", repl
        ).alias("text"),
    )


def run_rung(spark, k: int) -> dict:
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.dedup import dedup_exact, minhash_lsh_pairs
    from newspaper_spark.operators.filters import gopher_filters, line_filters
    from newspaper_spark.operators.packing import pack_offsets
    from newspaper_spark.operators.span_dedup import paragraph_dedup
    from newspaper_spark.operators.textstats import token_count_col

    p = spark.sparkContext.defaultParallelism
    docs = replicated_docs(spark, k).repartition(p).persist()
    n_rows = docs.count()  # materialize input OUTSIDE the timed section
    try:
        t0 = time.time()
        with cache.tracking_scope():
            reps = dedup_exact(docs).select("doc_id")
            kept = docs.join(reps, "doc_id")
            para = paragraph_dedup(kept).select(
                "doc_id", F.col("cleaned_text").alias("text")
            )
            n_pairs = minhash_lsh_pairs(para, max_group_size=64).count()
            lined = line_filters(para).select(
                "doc_id", F.col("cleaned_text").alias("text")
            )
            passing = gopher_filters(lined).filter("word_count_ok").select(
                "doc_id"
            )
            gated = lined.join(passing, "doc_id").select(
                "doc_id", token_count_col(F.col("text")).alias("n_tokens")
            )
            packed = pack_offsets(gated, seq_len=2048)
            packed.write.format("noop").mode("overwrite").save()
            n_packed = packed.agg(F.count("*")).first()[0]
        wall = time.time() - t0
    finally:
        docs.unpersist()
    return {
        "k": k,
        "n_rows": n_rows,
        "wall": round(wall, 2),
        "us_per_row": round(wall / n_rows * 1e6, 1),
        "lsh_pairs": n_pairs,
        "n_packed": n_packed,
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="pipeline-ladder")
    try:
        run_rung(spark, k_low)  # discarded warm-up (cold plans/UDF workers)
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
                "lsh_pairs": samples[rung][0]["lsh_pairs"],
                "n_packed": samples[rung][0]["n_packed"],
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
