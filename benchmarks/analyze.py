"""Result aggregation: tables + shifted geometric mean.

Equivalent of the reference analysis layer (`scripts/bench-lp/analyze.py`,
`scripts/bench-qcp/calculate_SGM.m:3`): load per-instance JSON records,
print a solved/failed table, and report SGM-10 of solve time

    SGM = exp(mean(log(max(1, t + shift)))) - shift,   shift = 10 s.

Usage::

    python -m benchmarks.analyze results/ [more-result-dirs ...]
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os


def sgm(times, shift=10.0):
    """Shifted geometric mean (`calculate_SGM.m:3`)."""
    if not times:
        return float("nan")
    logs = [math.log(max(1.0, t + shift)) for t in times]
    return math.exp(sum(logs) / len(logs)) - shift


def load(dirs):
    recs = []
    for d in dirs:
        for path in sorted(glob.glob(os.path.join(d, "*.json"))):
            with open(path) as f:
                recs.append(json.load(f))
    return recs


def summarize(recs, timeout_penalty=3600.0):
    solved = [r for r in recs if str(r.get("status", "")).startswith("Solved")]
    failed = [r for r in recs if not str(r.get("status", "")).startswith("Solved")]
    times = [r["time"] for r in solved] + [timeout_penalty for _ in failed]
    return {
        "instances": len(recs),
        "solved": len(solved),
        "failed": len(failed),
        "sgm10_time": sgm(times),
        "total_admm_iters": sum(int(r.get("admm_iter", 0)) for r in solved),
        "total_time": sum(r["time"] for r in recs if "time" in r),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--timeout-penalty", type=float, default=3600.0)
    args = ap.parse_args(argv)

    recs = load(args.dirs)
    if not recs:
        raise SystemExit("no result JSONs found")

    hdr = f"{'name':<20s} {'status':<22s} {'ipm':>5s} {'admm':>8s} {'gap':>10s} {'time':>9s}"
    print(hdr)
    print("-" * len(hdr))
    for r in recs:
        print(
            f"{r.get('name', '?'):<20s} {str(r.get('status', '?')):<22.22s} "
            f"{r.get('ipm_iter', 0):>5} {r.get('admm_iter', 0):>8} "
            f"{r.get('gap', float('nan')):>10.2e} {r.get('time', float('nan')):>9.3f}"
        )
    s = summarize(recs, args.timeout_penalty)
    print("-" * len(hdr))
    print(
        f"solved {s['solved']}/{s['instances']}  SGM-10 {s['sgm10_time']:.3f}s  "
        f"total admm {s['total_admm_iters']}  total time {s['total_time']:.2f}s"
    )
    return s


if __name__ == "__main__":
    main()
