"""Round-6 Arrow-handoff mitigation experiment (VERDICT r5 item 4).

Round-5 attribution (BENCH.md): the JVM→Python Arrow handoff moves
raw 30 KB HTML rows at ~1 GB/s REGARDLESS of core count and is the
dominant non-scaling term at local[N]. The one untried lever: shrink
the bytes. This experiment runs the extraction bench job in both
modes — normal (raw string HTML across Arrow) and packed (zlib binary
across Arrow, per-worker decompress; SPARK_GRAFT_BENCH_PACKED=1) — at
N=8 and 4N=32 pinned cores, in PAIRED EPOCHS (all four runs
back-to-back so common host drift cancels in the within-epoch
ratios), one discarded warm-up first, medians + trimmed means over
epochs reported with every raw sample attached.

Success bar (pre-registered from the verdict): packed raw N→4N
efficiency ≥ 0.72 with output byte-equality (the equality is pytest-
proven: test_packed_extraction_byte_equal). Otherwise this records
the negative with measured bytes and rows/s at both core counts.

Run ALONE on a quiet host (CLAUDE.md bench hazard).

Usage: python scripts/arrow_packed_experiment.py [epochs]
"""
from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _run(packed: bool, cores: int) -> float:
    os.environ["SPARK_GRAFT_BENCH_PACKED"] = "1" if packed else "0"
    dt, n = bench._run_pinned(cores)
    return n / dt


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    high, low = bench.CPUS, max(bench.CPUS // 4, 1)

    _run(False, high)  # discarded warm-up (cold-session outlier)
    eps = []
    for i in range(epochs):
        ep = {
            "normal_high": _run(False, high),
            "normal_low": _run(False, low),
            "packed_high": _run(True, high),
            "packed_low": _run(True, low),
        }
        ep["eff_normal"] = ep["normal_high"] / (4.0 * ep["normal_low"])
        ep["eff_packed"] = ep["packed_high"] / (4.0 * ep["packed_low"])
        ep["speedup_high"] = ep["packed_high"] / ep["normal_high"]
        eps.append(ep)
        print(f"epoch {i}: " + json.dumps(
            {k: round(v, 3) for k, v in ep.items()}), file=sys.stderr)

    def med(k):
        return round(statistics.median(e[k] for e in eps), 3)

    def trimmed(k):
        vals = sorted(e[k] for e in eps)
        vals = vals[1:-1] if len(vals) >= 3 else vals
        return round(sum(vals) / len(vals), 3)

    out = {
        "protocol": (
            f"{epochs} paired epochs (normal@{high}, normal@{low}, "
            f"packed@{high}, packed@{low} back-to-back; pinned "
            "affinity; 1 discarded warm-up; within-epoch ratios "
            "cancel common host drift; trimmed mean + median reported)"
        ),
        "cores": [low, high],
        "normal": {
            "turns_per_sec_high": med("normal_high"),
            "turns_per_sec_low": med("normal_low"),
            "efficiency_nx4_median": med("eff_normal"),
            "efficiency_nx4_trimmed": trimmed("eff_normal"),
        },
        "packed": {
            "turns_per_sec_high": med("packed_high"),
            "turns_per_sec_low": med("packed_low"),
            "efficiency_nx4_median": med("eff_packed"),
            "efficiency_nx4_trimmed": trimmed("eff_packed"),
        },
        "packed_vs_normal_speedup_at_high": trimmed("speedup_high"),
        "epochs": [
            {k: round(v, 3) for k, v in e.items()} for e in eps
        ],
    }
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "arrow_packed_experiment.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
