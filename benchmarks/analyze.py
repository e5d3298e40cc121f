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


def compare(dirs, timeout_penalty=3600.0):
    """Side-by-side comparison of runs (the reference `analyze.py:20-47`
    method-registry table): each dir is one method; instances matched by
    name; reports per-method SGM-10 and pairwise time ratios."""
    methods = {d.rstrip("/").split("/")[-1] or d: {r["name"]: r for r in load([d])}
               for d in dirs}
    names = sorted(set().union(*[set(m) for m in methods.values()]))
    hdr = f"{'name':<18s}" + "".join(f"{k:>14.14s}" for k in methods)
    print(hdr)
    print("-" * len(hdr))
    for nm in names:
        row = f"{nm:<18.18s}"
        for recs in methods.values():
            r = recs.get(nm)
            if r is None:
                row += f"{'--':>14s}"
            elif not str(r.get("status", "")).startswith("Solved"):
                row += f"{'fail':>14s}"
            else:
                row += f"{r['time']:>13.3f}s"
        print(row)
    print("-" * len(hdr))
    sgms = {}
    for k, recs in methods.items():
        times = [r["time"] if str(r.get("status", "")).startswith("Solved")
                 else timeout_penalty for r in recs.values()]
        sgms[k] = sgm(times)
    print("SGM-10: " + "  ".join(f"{k}={v:.3f}s" for k, v in sgms.items()))
    # per-method success rate (the `analyze_stats.py` bool_success role)
    print("solved: " + "  ".join(
        f"{k}={sum(str(r.get('status', '')).startswith('Solved') for r in recs.values())}"
        f"/{len(recs)}" for k, recs in methods.items()))
    ks = list(sgms)
    for i in range(1, len(ks)):
        base, other = sgms[ks[0]], sgms[ks[i]]
        if other > 0:
            print(f"# {ks[0]} vs {ks[i]}: {other / max(base, 1e-12):.2f}x")
    return sgms


def stats(recs):
    """Distribution table over solved instances (the `analyze_stats.py`
    role): p50/p90/max of time and ADMM iterations."""
    solved = [r for r in recs
              if str(r.get("status", "")).startswith("Solved")]
    if not solved:
        print("no solved instances")
        return {}

    def pct(vals, q):
        vals = sorted(vals)
        return vals[min(len(vals) - 1, int(q * (len(vals) - 1) + 0.5))]

    out = {}
    for key, label in (("time", "time [s]"), ("admm_iter", "admm iters")):
        vals = [r[key] for r in solved if key in r]
        if not vals:
            continue
        out[key] = {"p50": pct(vals, 0.5), "p90": pct(vals, 0.9),
                    "max": max(vals),
                    "mean": sum(vals) / len(vals)}
        print(f"{label:<12s} p50 {out[key]['p50']:>10.3f}  "
              f"p90 {out[key]['p90']:>10.3f}  max {out[key]['max']:>10.3f}  "
              f"mean {out[key]['mean']:>10.3f}")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--timeout-penalty", type=float, default=3600.0)
    ap.add_argument("--compare", action="store_true",
                    help="treat each dir as one method; print side-by-side")
    ap.add_argument("--stats", action="store_true",
                    help="print p50/p90/max distribution over solved runs")
    ap.add_argument("--csv", metavar="PATH",
                    help="also write the records to a CSV file "
                         "(`write2csv.m` role)")
    args = ap.parse_args(argv)

    if args.csv:
        import csv

        recs_all = load(args.dirs)
        keys = sorted({k for r in recs_all for k in r})
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(recs_all)

    if args.compare:
        return compare(args.dirs, args.timeout_penalty)
    if args.stats:
        return stats(load(args.dirs))

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
