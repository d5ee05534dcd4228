"""Attribute the raw N→4N scaling gap with per-stage event-log evidence
(VERDICT r4 item 3).

Runs the SAME pinned extraction job bench.py measures at 8 and 32
cores — in the same subprocess harness (`bench.py --extract-run`) with
`spark.eventLog.enabled` injected through SPARK_GRAFT_EXTRA_CONF — then
parses the Spark event logs and decomposes the TIMED job's
wall × cores capacity at each level into:

    compute     Σ Executor Run Time   (incl. blocking on Python workers)
    jvm_cpu     Σ Executor CPU Time   (JVM-side on-CPU portion of run)
    gc          Σ JVM GC Time
    deser       Σ Executor Deserialize Time
    result_ser  Σ Result Serialization Time
    sched_delay Σ (finish−launch − run − deser − result_ser − getting)
    idle        capacity − Σ task occupancy  (stage tails + gaps)

If per-task compute summed over tasks were level-invariant and
everything else were zero, N→4N efficiency would be 1.0; whatever the
machine itself loses at 32 busy cores (turbo/memory bandwidth) shows up
as compute-sum inflation — the same inflation the no-framework ceiling
measures — while Spark-specific losses show up in gc / sched_delay /
idle / compute-minus-cpu growth. The table this prints is the
attribution BENCH.md cites.

Usage: python scripts/profile_scaling.py [reps]   (default 3; epoch-
paired like bench.py — high and low alternate so host drift cancels)
"""
from __future__ import annotations

import json
import os
import pathlib
import statistics
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
LOGBASE = pathlib.Path("/tmp/nsp-eventlogs")


def run_level(cores: int, tag: str) -> tuple[float, pathlib.Path]:
    """One pinned extraction run with event logging; returns (timed
    seconds, event-log file)."""
    logdir = LOGBASE / tag
    logdir.mkdir(parents=True, exist_ok=True)
    before = set(logdir.iterdir())
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps(
        {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir.as_uri(),
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--extract-run", str(cores)],
        capture_output=True,
        text=True,
        check=True,
        env=env,
        cwd=str(REPO),
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    new = [p for p in logdir.iterdir() if p not in before and not p.name.startswith(".")]
    assert len(new) == 1, f"expected one new event log, got {new}"
    return out["seconds"], new[0]


def parse_timed_job(log: pathlib.Path) -> dict:
    """Task-metric decomposition of the LAST SQL execution in the event
    log (the timed extraction count; earlier executions are input build
    + warm-up). AQE splits one query into several jobs, so jobs are
    grouped by their `spark.sql.execution.id` property — taking "the
    last job" would catch only AQE's tiny finishing job."""
    job_stages: dict[int, list[int]] = {}
    job_exec: dict[int, int] = {}
    exec_span: dict[int, list[int]] = {}
    tasks_by_stage: dict[int, list[dict]] = {}

    def lines():
        if log.is_dir():  # rolling layout: events_<n>_<appid> files
            parts = sorted(
                (p for p in log.iterdir() if p.name.startswith("events_")),
                key=lambda p: int(p.name.split("_")[1]),
            )
            for p in parts:
                with p.open() as f:
                    yield from f
        else:
            with log.open() as f:
                yield from f

    for line in lines():
            ev = json.loads(line)
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                job_stages[ev["Job ID"]] = [
                    s["Stage ID"] for s in ev["Stage Infos"]
                ]
                eid = (ev.get("Properties") or {}).get(
                    "spark.sql.execution.id"
                )
                if eid is not None:
                    job_exec[ev["Job ID"]] = int(eid)
            elif et.endswith("SparkListenerSQLExecutionStart"):
                exec_span[ev["executionId"]] = [ev["time"], 0]
            elif et.endswith("SparkListenerSQLExecutionEnd"):
                if ev["executionId"] in exec_span:
                    exec_span[ev["executionId"]][1] = ev["time"]
            elif et == "SparkListenerTaskEnd":
                info, m = ev["Task Info"], ev.get("Task Metrics") or {}
                tasks_by_stage.setdefault(ev["Stage ID"], []).append(
                    {
                        "launch": info["Launch Time"],
                        "finish": info["Finish Time"],
                        "getting": info.get("Getting Result Time", 0),
                        "run": m.get("Executor Run Time", 0),
                        "cpu_ns": m.get("Executor CPU Time", 0),
                        "gc": m.get("JVM GC Time", 0),
                        "deser": m.get("Executor Deserialize Time", 0),
                        "rser": m.get("Result Serialization Time", 0),
                    }
                )
    last_exec = max(exec_span)
    jobs = [j for j, e in job_exec.items() if e == last_exec]
    tasks = [
        t
        for j in jobs
        for s in job_stages[j]
        for t in tasks_by_stage.get(s, [])
    ]
    assert tasks, f"no tasks for execution {last_exec} in {log}"
    sub, comp = exec_span[last_exec]
    wall = (comp - sub) / 1000.0
    s = lambda k: sum(t[k] for t in tasks) / 1000.0  # noqa: E731
    sched = (
        sum(
            (t["finish"] - t["launch"])
            - t["run"] - t["deser"] - t["rser"] - t["getting"]
            for t in tasks
        )
        / 1000.0
    )
    occupancy = s("run") + s("deser") + s("rser") + sched
    runs = sorted(t["run"] / 1000.0 for t in tasks)

    def pct(p):
        return runs[min(int(len(runs) * p), len(runs) - 1)]

    return {
        "wall": wall,
        "n_tasks": len(tasks),
        "compute": s("run"),
        "jvm_cpu": sum(t["cpu_ns"] for t in tasks) / 1e9,
        "gc": s("gc"),
        "deser": s("deser"),
        "result_ser": s("rser"),
        "sched_delay": max(sched, 0.0),
        "occupancy": occupancy,
        # per-task run-time distribution: uniform inflation (machine-
        # wide clock/membw loss) shifts p50 and p95 together; straggler
        # contention widens p95/p50
        "task_p50": round(pct(0.50), 3),
        "task_p95": round(pct(0.95), 3),
        "task_max": round(runs[-1], 3),
    }


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    high = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    low = high // 4
    run_level(high, "warmup")  # discarded cold-session outlier
    samples: dict[int, list[dict]] = {high: [], low: []}
    for r in range(reps):
        for cores in (high, low):  # paired within epoch
            secs, log = run_level(cores, f"c{cores}")
            d = parse_timed_job(log)
            d["timed_secs"] = secs
            d["idle"] = max(d["wall"] * cores - d["occupancy"], 0.0)
            samples[cores].append(d)
            print(
                f"[rep {r}] cores={cores} wall={d['wall']:.2f}s "
                f"tasks={d['n_tasks']} compute={d['compute']:.1f}s "
                f"gc={d['gc']:.1f}s sched={d['sched_delay']:.1f}s "
                f"idle={d['idle']:.1f}s",
                file=sys.stderr,
            )

    def med(cores, k):
        return statistics.median(x[k] for x in samples[cores])

    keys = [
        "wall", "compute", "jvm_cpu", "gc", "deser", "result_ser",
        "sched_delay", "idle", "n_tasks",
    ]
    table = {
        k: {str(high): round(med(high, k), 2), str(low): round(med(low, k), 2)}
        for k in keys
    }
    eff = (med(low, "wall") / med(high, "wall")) / 4.0
    # python+blocking share of run time (run − jvm_cpu); how it scales
    py_high = med(high, "compute") - med(high, "jvm_cpu")
    py_low = med(low, "compute") - med(low, "jvm_cpu")
    result = {
        "cores": {"high": high, "low": low},
        "reps": reps,
        "efficiency_nx4_from_walls": round(eff, 3),
        "sums_seconds_median_over_reps": table,
        "compute_minus_jvmcpu": {
            str(high): round(py_high, 2),
            str(low): round(py_low, 2),
        },
        "capacity_seconds": {
            str(high): round(med(high, "wall") * high, 2),
            str(low): round(med(low, "wall") * low, 2),
        },
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
