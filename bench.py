"""Benchmark harness.

Runs the headline pipeline (transcripts → vectorized extraction) plus
representative operator queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), on local[$SPARK_GRAFT_CPUS] (default 32), and prints ONE JSON
line:

  {"metric": "extraction_throughput", "value": <turns/sec at full
   cores>, "unit": "sec", "queries": {...per-query seconds...},
   "sf": ..., "scaling": {...}}

Scaling efficiency (north rule, sandbox proxy): the same extraction
job runs at N=8 and 4N=32 local cores in separate *subprocesses*, each
pinned with sched_setaffinity to exactly that many CPUs — so the
"8-core executor" cannot borrow the other 24 cores for JVM work, just
like a real cluster executor. efficiency = throughput(32) /
(4 × throughput(8)). Residual gap vs a real cluster: a single host
clocks 8 busy cores higher than 32 busy cores (turbo), which separate
executor machines would not see.

Set SPARK_GRAFT_BENCH_SCALING=0 to skip the second run (driver smoke).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
_TARGET_TURNS = 40000  # enough work to amortize per-task overhead


def _replication() -> int:
    env = os.environ.get("SPARK_GRAFT_BENCH_REPLICATION")
    if env:
        return int(env)
    import duckdb

    n_docs = duckdb.sql(
        f"select count(*) from '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    return max(1, -(-_TARGET_TURNS // max(n_docs, 1)))


REPLICATION = _replication()


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def extraction_run(cores: int) -> tuple[float, int]:
    """Returns (seconds, n_turns) for the full extraction pipeline at
    the given parallelism, in a fresh SparkSession pinned to ``cores``
    CPUs (executor-equivalent resource envelope)."""
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass
    from newspaper_spark.operators.extract import extract_articles
    from newspaper_spark.plans.session import get_spark
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    spark = get_spark(app_name=f"bench-extract-{cores}", cores=cores)
    try:
        t = synthetic_transcripts(spark, SF_DIR, replication=REPLICATION)
        t = t.repartition(cores * 4).cache()  # 4×cores: load balance
        n = t.count()  # materialize input before timing the extraction
        # warm-up: spin up + import-load every Python UDF worker so the
        # timed section measures steady-state throughput (what a long
        # cluster job sees), not one-time worker fork/import cost
        warm = t.limit(cores * 8).repartition(cores)
        extract_articles(warm).filter("status = 'ok'").count()
        t0 = time.time()
        out = extract_articles(t)
        # count(status=ok) forces full extraction of every row while
        # avoiding a driver-side collect of the texts
        n_ok = out.filter("status = 'ok'").count()
        dt = time.time() - t0
        assert n_ok > 0
        return dt, n
    finally:
        spark.stop()


def query_timings(cores: int) -> dict:
    import __spark_entry__ as E
    from newspaper_spark.plans.session import get_spark

    headline = [
        "extract_fulltext",
        "dedup_exact",
        "minhash_pairs",
        "simhash_near_dups",
        "ann_topk",
        "lang_id",
        "quality",
        "keywords_topk",
        "sessionize",
        "events_hourly",
    ]
    qs = E.queries()
    spark = get_spark(app_name="bench-queries", cores=cores)
    times = {}
    try:
        for name in headline:
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return times


def _run_pinned(cores: int) -> tuple[float, int]:
    """Run extraction_run in a subprocess (affinity + fresh JVM)."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--extract-run", str(cores)],
        capture_output=True,
        text=True,
        check=True,
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["seconds"], out["n"]


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--extract-run":
        dt, n = extraction_run(int(sys.argv[2]))
        print(json.dumps({"seconds": dt, "n": n}))
        return

    do_scaling = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))

    # sustained all-core load triggers frequency throttling on this
    # host, so single measurements are noisy: interleave high/low runs
    # and take medians
    import statistics

    highs, lows = [], []
    n_turns = None
    low_cores = max(CPUS // 4, 1)
    for _ in range(reps if do_scaling else 1):
        dt, n_turns = _run_pinned(CPUS)
        highs.append(n_turns / dt)
        if do_scaling:
            dt_low, _ = _run_pinned(low_cores)
            lows.append(n_turns / dt_low)
    thr_full = statistics.median(highs)
    dt_full = n_turns / thr_full

    scaling = {}
    if do_scaling:
        thr_low = statistics.median(lows)
        efficiency = thr_full / (4.0 * thr_low)
        scaling = {
            "cores_low": low_cores,
            "cores_high": CPUS,
            "turns_per_sec_low": round(thr_low, 2),
            "turns_per_sec_high": round(thr_full, 2),
            "efficiency_nx4": round(efficiency, 3),
            "samples_high": [round(x, 1) for x in highs],
            "samples_low": [round(x, 1) for x in lows],
        }

    queries = query_timings(CPUS)

    result = {
        "metric": "extraction_throughput_turns_per_sec",
        "value": round(dt_full, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "n_turns": n_turns,
        "turns_per_sec": round(thr_full, 2),
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
