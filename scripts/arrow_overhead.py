"""Isolate the Arrow handoff's share of the N→4N scaling gap.

The event-log decomposition (scripts/profile_scaling.py) shows the gap
is dominated by UNIFORM per-task 'Executor Run Time' inflation at 32
cores — time spent blocked on Python workers, since JVM CPU is ~1.5%
of it. Two candidate causes with different fixes:

  (a) the extraction kernel's own Python execution slows down more
      under Spark workers than under bare multiprocessing (memory
      pressure from 32 pandas processes), or
  (b) the Arrow encode/decode + socket handoff each batch pays is
      memory-bandwidth-bound and scales worse than compute — a cost
      the no-framework ceiling doesn't pay at all.

This measures (b) directly: the SAME replicated transcript input, a
TRIVIAL pandas UDF (`s.str.len()` — all cost is Arrow transfer of the
HTML payloads into Python and back), pinned subprocesses at 8 and 32
cores, interleaved reps. If the no-op UDF's N→4N efficiency tracks the
extraction job's busy-time ratio (~0.66) rather than the ceiling
(~0.77), the non-scaling component is the handoff, not the kernel.

Usage: python scripts/arrow_overhead.py [reps=3]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop_run(cores: int) -> tuple[float, int]:
    try:
        os.sched_setaffinity(0, set(range(cores)))
    except (AttributeError, OSError):
        pass
    from pyspark.sql import functions as F

    from newspaper_spark.plans.session import get_spark
    from newspaper_spark.sources.transcripts import synthetic_transcripts

    import bench  # reuse the bench harness's replication choice

    spark = get_spark(
        app_name=f"arrow-noop-{cores}",
        cores=cores,
        extra_conf={"spark.sql.inMemoryColumnarStorage.compressed": "false"},
    )
    try:
        t = synthetic_transcripts(spark, SF_DIR, replication=bench.REPLICATION)
        t = t.repartition(cores * 4).cache()
        n = t.count()
        udf = F.pandas_udf(lambda s: s.str.len(), "long")
        # warm-up: fork + import the Python workers
        t.limit(cores * 8).repartition(cores).select(
            F.sum(udf(F.col("text")))
        ).collect()
        t0 = time.time()
        t.select(F.sum(udf(F.col("text"))).alias("s")).collect()
        dt = time.time() - t0
        return dt, n
    finally:
        spark.stop()


def _run_sub(cores: int) -> tuple[float, int]:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run", str(cores)],
        capture_output=True,
        text=True,
        check=True,
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["seconds"], out["n"]


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--run":
        dt, n = noop_run(int(sys.argv[2]))
        print(json.dumps({"seconds": dt, "n": n}))
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    high = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    low = high // 4
    _run_sub(high)  # discarded cold-session warm-up
    effs = []
    rows = []
    for i in range(reps):
        dt_h, n = _run_sub(high)
        dt_l, _ = _run_sub(low)
        eff = (n / dt_h) / (4.0 * (n / dt_l))
        effs.append(eff)
        rows.append(
            {
                "rep": i,
                "rows_per_sec_high": round(n / dt_h, 1),
                "rows_per_sec_low": round(n / dt_l, 1),
                "eff": round(eff, 3),
            }
        )
        print(rows[-1], file=sys.stderr)
    print(
        json.dumps(
            {
                "udf": "noop pandas_udf str.len over HTML payloads",
                "cores": {"high": high, "low": low},
                "reps": rows,
                "efficiency_nx4_median": round(statistics.median(effs), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
