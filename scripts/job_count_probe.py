"""Count Spark jobs executed by one queries() entry — noise-free
evidence for recompute-elimination fixes (persisting a relation that
feeds multiple broadcast consumers removes whole jobs, which this
probe shows deterministically where wall-time A/Bs drown in host
noise). Usage: python scripts/job_count_probe.py QUERY [SF_DIR]."""
import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from newspaper_spark import cache  # noqa: E402
from newspaper_spark.plans.session import get_spark  # noqa: E402


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="job-count-probe",
        cores=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    try:
        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with cache.tracking_scope():
            df = E.queries()[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        jobs = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
        )
        st = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
        )
        run_ms = sum(s.get("executorRunTime", 0) for s in st)
        cpu_ms = sum(s.get("executorCpuTime", 0) for s in st) // 1_000_000
        tasks = sum(j.get("numCompletedTasks", 0) for j in jobs)
        print(json.dumps({"query": name, "sf_dir": sf_dir, "jobs": len(jobs),
                          "stages": len(st), "tasks": tasks,
                          "executor_run_ms": run_ms,
                          "executor_cpu_ms": cpu_ms}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
