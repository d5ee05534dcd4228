"""Disk-backed scale probe for the HEADLINE extraction stage
(round 7): the bench's throughput number has only ever been measured
on the sf0.1 in-memory harness input — this probe writes ×1 and ×10
transcript tables to parquet (×10 ≈ 200k turns ≈ sf1 page volume,
~2 GB of HTML) and measures extraction turns/s over the on-disk
tables, the same real scan → rebalance → Arrow-UDF path a production
run takes.

Pass shape: per-turn cost at ×10 at-or-below ×1 (throughput holds or
rises as fixed per-job overhead amortizes — the same criterion as
every ladder). Protocol: discarded warm-up, rungs interleaved,
medians over reps; quiet host required (CLAUDE.md bench hazard).

Usage: python scripts/extract_scale_probe.py [reps=3]
Writes artifacts/extract_scale_probe.json.
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = REPO / ".ladder_cache"


def build_input(spark, replication: int) -> str:
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    path = str(CACHE / f"transcripts_x{replication}.parquet")
    if not os.path.exists(path):
        t = synthetic_transcripts(spark, SF_DIR, replication=replication)
        t.repartition(spark.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_rung(spark, path: str) -> dict:
    from pyspark.sql import functions as F

    from newspaper_spark.operators.extract import extract_articles

    p = spark.sparkContext.defaultParallelism
    t0 = time.time()
    df = spark.read.parquet(path).repartition(p * 4)
    out = extract_articles(df)
    n_ok = out.filter("status = 'ok'").count()
    wall = time.time() - t0
    return {"n_ok": n_ok, "wall": round(wall, 2),
            "turns_per_sec": round(n_ok / wall, 1)}


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from newspaper_spark.plans.session import get_spark

    CACHE.mkdir(exist_ok=True)
    spark = get_spark(app_name="extract-scale-probe")
    try:
        paths = {k: build_input(spark, k) for k in (1, 10)}
        run_rung(spark, paths[1])  # discarded warm-up
        samples = {1: [], 10: []}
        for i in range(reps):
            for k in (1, 10):
                d = run_rung(spark, paths[k])
                samples[k].append(d)
                print(f"[epoch {i}] x{k}: {d}", file=sys.stderr)
        out = {"sf_dir": SF_DIR, "disk_backed": True, "reps": reps}
        for k in (1, 10):
            out[f"x{k}"] = {
                "n_ok": samples[k][0]["n_ok"],
                "walls": [s["wall"] for s in samples[k]],
                "turns_per_sec_median": round(
                    statistics.median(s["turns_per_sec"] for s in samples[k]), 1
                ),
            }
        out["throughput_ratio_x10_over_x1"] = round(
            out["x10"]["turns_per_sec_median"]
            / out["x1"]["turns_per_sec_median"],
            3,
        )
        out["rows_exactly_linear"] = (
            out["x10"]["n_ok"] == 10 * out["x1"]["n_ok"]
        )
        print(json.dumps(out, indent=2))
        with open(REPO / "artifacts" / "extract_scale_probe.json", "w") as f:
            json.dump(out, f, indent=2)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
