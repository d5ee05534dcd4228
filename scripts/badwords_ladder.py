"""badwords_filter data ladder (round 7): show the gate's cost is
driven by CANDIDATE volume, not corpus size, and scales linearly.

Rungs ×4/×16 replicate the sf0.1 documents table with the standard
per-token replica suffix (cross-replica tokens never collide). Two
blocklist variants per rung:

* ``rare``     — entries match ONLY replica-0 tokens
  ('slow~r0', 'fast~r0 table~r0'): candidate volume stays CONSTANT as
  the corpus grows — the per-row cost must fall (fixed work amortizes
  over more rows), demonstrating that the bigram probe is bounded by
  blocklist-term frequency, not corpus bigram count.
* ``frequent`` — one entry per replica ('slow~rI', 'fast~rI table~rI'
  for every I < k): candidate and hit volume grow LINEARLY with the
  corpus — per-row cost should stay ~flat (linear total work), the
  documented pathological direction with its documented cost shape.

Hit counts are exact invariants: rare hits are constant across rungs,
frequent hits scale exactly ×(k_high/k_low). Protocol: discarded
warm-up, rungs/variants interleaved per epoch, medians over reps.

Usage: python scripts/badwords_ladder.py [reps=3] [k_low=4] [k_high=16]
Writes artifacts/badwords_ladder.json.
"""
from __future__ import annotations

import json
import pathlib
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_docs(spark, k: int):
    from pyspark.sql import functions as F

    from newspaper_spark.sources.transcripts import load_table

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("r")
    d = d.select("doc_id", "text", reps)
    repl = F.concat(F.lit(r"$1~r"), F.col("r").cast("string"))
    return d.select(
        (F.col("doc_id") * k + F.col("r")).alias("doc_id"),
        F.regexp_replace(
            F.coalesce("text", F.lit("")), r"(\S+)", repl
        ).alias("text"),
    )


def blocklist(variant: str, k: int) -> list[str]:
    if variant == "rare":
        return ["slow~r0", "fast~r0 table~r0"]
    return [w for i in range(k) for w in (f"slow~r{i}", f"fast~r{i} table~r{i}")]


def run_rung(spark, docs, n_rows: int, variant: str, k: int) -> dict:
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.filters import badwords_filter

    t0 = time.time()
    with cache.tracking_scope():
        out = badwords_filter(docs, blocklist(variant, k))
        agg = out.agg(
            F.sum("n_badword_hits").alias("hits"),
            F.sum(F.when(~F.col("badwords_ok"), 1).otherwise(0)).alias(
                "flagged"
            ),
        ).first()
    wall = time.time() - t0
    return {
        "k": k,
        "variant": variant,
        "wall": round(wall, 2),
        "us_per_row": round(wall / n_rows * 1e6, 1),
        "hits": int(agg.hits),
        "flagged_docs": int(agg.flagged),
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    from newspaper_spark.plans.session import get_spark

    spark = get_spark(app_name="badwords-ladder")
    try:
        p = spark.sparkContext.defaultParallelism
        inputs = {}
        for k in (k_low, k_high):
            d = replicated_docs(spark, k).repartition(p).persist()
            inputs[k] = (d, d.count())  # materialize OUTSIDE timing
        run_rung(spark, *inputs[k_low], "rare", k_low)  # warm-up
        samples = {
            (v, k): []
            for v in ("rare", "frequent")
            for k in (k_low, k_high)
        }
        for i in range(reps):
            for v in ("rare", "frequent"):
                for k in (k_low, k_high):
                    d = run_rung(spark, *inputs[k], v, k)
                    samples[(v, k)].append(d)
                    print(f"[epoch {i}] {d}", file=sys.stderr)
        out = {"sf_dir": SF_DIR, "reps": reps, "n_rows": {
            str(k): inputs[k][1] for k in (k_low, k_high)}}
        for v in ("rare", "frequent"):
            vo = {}
            for k in (k_low, k_high):
                s = samples[(v, k)]
                vo[f"x{k}"] = {
                    "us_per_row_median": round(
                        statistics.median(x["us_per_row"] for x in s), 1
                    ),
                    "walls": [x["wall"] for x in s],
                    "hits": s[0]["hits"],
                    "flagged_docs": s[0]["flagged_docs"],
                }
            vo[f"per_row_ratio_x{k_high}_over_x{k_low}"] = round(
                vo[f"x{k_high}"]["us_per_row_median"]
                / vo[f"x{k_low}"]["us_per_row_median"],
                3,
            )
            out[v] = vo
        # invariants: rare hits constant; frequent hits exactly linear
        out["rare_hits_constant"] = (
            out["rare"][f"x{k_low}"]["hits"]
            == out["rare"][f"x{k_high}"]["hits"]
        )
        out["frequent_hits_exactly_linear"] = (
            out["frequent"][f"x{k_high}"]["hits"] * k_low
            == out["frequent"][f"x{k_low}"]["hits"] * k_high
        )
        print(json.dumps(out, indent=2))
        with open(REPO / "artifacts" / "badwords_ladder.json", "w") as f:
            json.dump(out, f, indent=2)
    finally:
        for d, _ in inputs.values():
            d.unpersist()
        spark.stop()


if __name__ == "__main__":
    main()
