"""Interleaved A/B of extraction throughput under different Spark confs.

Usage: python scripts/ab_extract.py '<json-conf-A>' '<json-conf-B>' [reps] [cores]

Runs A and B alternately (same subprocess protocol bench.py uses, pinned
affinity), prints per-rep throughput and medians. Interleaving cancels
the host's slow noise drift.
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(conf: str, cores: int) -> float:
    env = dict(os.environ, SPARK_GRAFT_EXTRA_CONF=conf)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--extract-run", str(cores)],
        capture_output=True, text=True, check=True, env=env,
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["n"] / out["seconds"]


def main():
    conf_a = sys.argv[1] if len(sys.argv) > 1 else "{}"
    conf_b = sys.argv[2] if len(sys.argv) > 2 else "{}"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    run(conf_a, cores)  # discarded warm-up
    a, b = [], []
    for i in range(reps):
        a.append(run(conf_a, cores))
        b.append(run(conf_b, cores))
        print(f"rep {i}: A={a[-1]:.0f} B={b[-1]:.0f}", flush=True)
    print(f"A median {statistics.median(a):.0f}  samples {[round(x) for x in a]}")
    print(f"B median {statistics.median(b):.0f}  samples {[round(x) for x in b]}")


if __name__ == "__main__":
    main()
