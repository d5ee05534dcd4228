"""Disk-backed sf1-scale ladder for the two slowest prep compositions
(VERDICT r6 item 6): dclm_prep (gopher → exact-dedup → trained NB
gate) and ccnet_prep (lang-ID → per-language LM → tercile buckets).

Every earlier ladder (pipeline/nb/bm25/sparse/graph) ran its rungs on
an in-memory persisted input at ≤ sf0.1×16; this one closes the last
evidence gap — the linearity argument PAST the in-memory regime —
by WRITING each rung's replicated input to parquet first and timing
the composition over the on-disk table (real scan → shuffle → Arrow
stages, no cached input):

    ×2  ≈ sf0.2  (2 × the sf0.1 documents table)
    ×10 ≈ sf1    (10 ×, ~200k docs / ~600 MB of text)

Input design follows pipeline_ladder.py: the ×k rung suffixes EVERY
whitespace token with the replica index, so within a replica the
duplicate/gate structure is exactly the base corpus's and per-row work
is scale-invariant, while cross-replica n-grams never collide (vocab
grows linearly — the point for ccnet's per-language LM join). On top
of the replicated text the dclm rung applies q_dclm_prep's exact input
enrichment (doc_id%11 shared dup page — its dedup group grows ×k and
is absorbed by the partial-aggregate groupBy; %3 raw; else stopword
suffix) so all three gates keep discriminating at every rung.

Protocol (CLAUDE.md): quiet host, one discarded warm-up, rungs
interleaved per epoch, medians over reps. Per-row cost at ×10 staying
at-or-below ×2 is the pass shape (per-row FALLING with scale = fixed
per-job overhead amortizing, the same shape as the other ladders).

Usage: python scripts/prep_ladder.py [reps=3] [k_low=2] [k_high=10]
Writes artifacts/prep_ladder.json.
"""
from __future__ import annotations

import json
import os
import pathlib
import shutil
import statistics
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = REPO / ".ladder_cache"


def build_input(spark, k: int) -> str:
    """Replicate documents ×k (per-token replica suffix) and write to
    parquet; returns the path. Cached across runs of this script."""
    from pyspark.sql import functions as F

    from newspaper_spark.sources.transcripts import load_table

    path = str(CACHE / f"docs_x{k}.parquet")
    if os.path.exists(path):
        return path
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    reps = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("r")
    d = d.select("doc_id", "text", reps)
    repl = F.concat(F.lit(r"$1~r"), F.col("r").cast("string"))
    out = d.select(
        (F.col("doc_id") * k + F.col("r")).alias("doc_id"),
        F.regexp_replace(
            F.coalesce("text", F.lit("")), r"(\S+)", repl
        ).alias("text"),
    )
    out.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def run_dclm(spark, path: str) -> tuple[float, int, int]:
    """q_dclm_prep's composition over the on-disk table; returns
    (wall, n_rows, n_kept)."""
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.dedup import dedup_exact
    from newspaper_spark.operators.filters import gopher_filters
    from newspaper_spark.operators.quality_nb import nb_quality_scores

    t0 = time.time()
    with cache.tracking_scope():
        raw = spark.read.parquet(path)
        dup_page = F.repeat(
            F.lit("the quick brown fox and the lazy dog have a nap "), 6
        )
        d = raw.select(
            "doc_id",
            F.when(F.col("doc_id") % 11 == 0, dup_page)
            .when(F.col("doc_id") % 3 == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" the of and with have that to be")
                )
            )
            .alias("text"),
        )
        g = gopher_filters(d).select(
            "doc_id", F.col("keep").alias("gopher_keep")
        )
        survivors = d.join(
            g.filter(F.col("gopher_keep")).select("doc_id"), "doc_id"
        )
        reps_df = dedup_exact(survivors).select("doc_id")
        labeled = d.filter(F.col("doc_id") % 2 == 0).withColumn(
            "is_pos", F.col("doc_id") % 10 == 0
        )
        scored = nb_quality_scores(
            survivors.join(reps_df, "doc_id"), labeled, n_buckets=1024
        )
        n_rows = raw.count()
        n_kept = scored.filter("pred_hq").count()
    return time.time() - t0, n_rows, n_kept


def run_ccnet(spark, path: str) -> tuple[float, int, int]:
    """q_ccnet_prep's composition over the on-disk table; returns
    (wall, n_rows, n_head)."""
    from pyspark.sql import functions as F

    from newspaper_spark import cache
    from newspaper_spark.operators.textstats import (
        lang_id_col,
        quality_buckets,
        unigram_logprob,
    )

    t0 = time.time()
    with cache.tracking_scope():
        raw = spark.read.parquet(path)
        d = raw.select(
            "doc_id", "text", lang_id_col(F.col("text")).alias("lang_id")
        )
        scores = unigram_logprob(d, group_col="lang_id")
        out = quality_buckets(
            scores,
            score_col="mean_logprob",
            id_col="doc_id",
            group_col="lang_id",
        )
        n_rows = raw.count()
        n_head = out.filter("bucket = 'head'").count()
    return time.time() - t0, n_rows, n_head


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    k_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    k_high = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from newspaper_spark.plans.session import get_spark

    CACHE.mkdir(exist_ok=True)
    spark = get_spark(app_name="prep-ladder")
    try:
        paths = {k: build_input(spark, k) for k in (k_low, k_high)}
        run_dclm(spark, paths[k_low])  # discarded warm-up
        samples = {
            (q, k): []
            for q in ("dclm", "ccnet")
            for k in (k_low, k_high)
        }
        checks = {}
        for i in range(reps):
            for q, fn in (("dclm", run_dclm), ("ccnet", run_ccnet)):
                for k in (k_low, k_high):
                    wall, n_rows, n_out = fn(spark, paths[k])
                    samples[(q, k)].append((wall, n_rows))
                    checks[(q, k)] = (n_rows, n_out)
                    print(
                        f"[epoch {i}] {q} x{k}: {wall:.2f}s over {n_rows} rows"
                        f" ({wall / n_rows * 1e6:.1f} us/row, out={n_out})",
                        file=sys.stderr,
                    )
        out = {"sf_dir": SF_DIR, "disk_backed": True, "reps": reps}
        for q in ("dclm", "ccnet"):
            qo = {}
            for k in (k_low, k_high):
                walls = [w for w, _ in samples[(q, k)]]
                n_rows = samples[(q, k)][0][1]
                qo[f"x{k}"] = {
                    "n_rows": n_rows,
                    "wall_median_s": round(statistics.median(walls), 2),
                    "us_per_row_median": round(
                        statistics.median(walls) / n_rows * 1e6, 1
                    ),
                    "walls": [round(w, 2) for w in walls],
                    "n_out": checks[(q, k)][1],
                }
            qo[f"per_row_ratio_x{k_high}_over_x{k_low}"] = round(
                qo[f"x{k_high}"]["us_per_row_median"]
                / qo[f"x{k_low}"]["us_per_row_median"],
                3,
            )
            # output-volume scaling (informational: exact k-linearity is
            # not guaranteed — NB feature buckets and LM totals shift
            # with the replica suffixes — but the ratio should sit
            # near k_high/k_low; a super-linear blow-up would mean the
            # workload, not the engine, changed shape across rungs)
            lo_out, hi_out = qo[f"x{k_low}"]["n_out"], qo[f"x{k_high}"]["n_out"]
            qo["out_ratio"] = round(hi_out / lo_out, 3) if lo_out else None
            out[q] = qo
        print(json.dumps(out, indent=2))
        with open(REPO / "artifacts" / "prep_ladder.json", "w") as f:
            json.dump(out, f, indent=2)
    finally:
        spark.stop()


def clean_cache():
    shutil.rmtree(CACHE, ignore_errors=True)


if __name__ == "__main__":
    main()
