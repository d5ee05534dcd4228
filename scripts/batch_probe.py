"""Single-session per-query job/stage/CPU probe (round-8 evidence).

Runs each named query once (noop sink) inside its own job group, then
attributes jobs/stages/tasks and executor run/CPU time to queries via
the UI REST API. CPU sums are the noise-free A/B metric on this host
(wall medians swing ±2x under hypervisor steal).

Usage: python scripts/batch_probe.py [--out FILE] [--sf-dir DIR] [q ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from newspaper_spark import cache  # noqa: E402
from newspaper_spark.plans.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--conf", action="append", default=[],
                    help="extra k=v spark conf (repeatable)")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed reps per query (wall = median)")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    extra = {"spark.ui.enabled": "true"}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v
    qs = E.queries()
    spark = get_spark(app_name="batch-probe", cores=args.cores,
                      extra_conf=extra)
    sc = spark.sparkContext
    results = {}
    try:
        from newspaper_spark.operators.extract import extract_articles
        from newspaper_spark.sources.transcripts import synthetic_transcripts

        warm = synthetic_transcripts(spark, args.sf_dir) \
            .limit(args.cores * 4).repartition(args.cores)
        extract_articles(warm).filter("status = 'ok'").count()

        import statistics
        import time

        walls = {}
        for name in args.queries:
            sc.setJobGroup(f"probe:{name}", name)
            ws = []
            for _ in range(args.reps):
                t0 = time.time()
                with cache.tracking_scope():
                    df = qs[name](spark, args.sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                ws.append(round(time.time() - t0, 3))
            walls[name] = round(statistics.median(ws), 3)
            sc.setJobGroup("", "")

        ui = sc.uiWebUrl
        app_id = sc.applicationId
        jobs = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
        ) + json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=failed"))
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages"))
        st_by_id = {}
        for s in stages:
            st_by_id.setdefault(s["stageId"], s)
        for name in args.queries:
            grp = [j for j in jobs if j.get("jobGroup") == f"probe:{name}"]
            sids = sorted({sid for j in grp for sid in j.get("stageIds", [])})
            sts = [st_by_id[sid] for sid in sids if sid in st_by_id]
            results[name] = {
                "wall_med_s": walls[name],
                "jobs": len(grp) // args.reps,
                "stages": len(sts) // args.reps,
                "tasks": sum(s.get("numCompleteTasks", 0)
                             for s in sts) // args.reps,
                "run_ms": sum(s.get("executorRunTime", 0)
                              for s in sts) // args.reps,
                "cpu_ms": sum(s.get("executorCpuTime", 0)
                              for s in sts) // 1_000_000 // args.reps,
                "shuffle_write_b": sum(s.get("shuffleWriteBytes", 0)
                                       for s in sts) // args.reps,
            }
            print(name, json.dumps(results[name]), flush=True)
    finally:
        spark.stop()
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf_dir": args.sf_dir, "cores": args.cores,
                       "queries": results}, f, indent=1)


if __name__ == "__main__":
    main()
