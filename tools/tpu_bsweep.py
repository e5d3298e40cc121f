"""Honest B-scaling sweep of the sprint2 LP engine on real TPU.

Round-2/3 B-scaling conclusions (B=32 "regresses", B=64 "faults") were
measured with `block_until_ready`, which is a NO-OP on the axon remote
backend (see `abip_tpu/utils/timing.py`) -- dispatch-only walls, not
solve walls.  This sweep re-measures with value-read syncs:

  rtt      tunnel round-trip microprobe: tiny jitted op, dispatch+read
  bN       solve_lp_batch(engine=sprint2) at B=N, bench-default knobs,
           1 warm-up + `--rounds` timed rounds on fresh salted draws

Each mode runs in a FRESH subprocess (a device fault cannot poison the
parent or later modes); compiles persist via ABIP_COMPILE_CACHE.

Usage:  python tools/tpu_bsweep.py                 # rtt + B in 16..64
        python tools/tpu_bsweep.py --B 16,32,64,128 --rounds 2
        python tools/tpu_bsweep.py --child b32     # one probe (child)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

OUT = os.path.join(_REPO, "benchmarks", "results", "r04_bsweep.json")


def _sync(tree):
    from abip_tpu.utils.timing import sync

    return sync(tree)


def _salt() -> int:
    return int(os.environ.get("ABIP_PROBE_SALT", str(int(time.time()))))


def probe_rtt():
    """Tunnel round-trip latency: tiny jitted op, timed dispatch+read."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.asarray(np.random.rand(8).astype(np.float32))
    _sync(f(x))  # compile
    walls = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(f(x))
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return {"ok": True, "rtt_median_ms": round(1e3 * walls[5], 2),
            "rtt_min_ms": round(1e3 * walls[0], 2),
            "rtt_max_ms": round(1e3 * walls[-1], 2)}


def probe_b(B: int, rounds: int):
    import numpy as np

    from abip_tpu.parallel.batched import solve_lp_batch
    from bench import reference_smoke_lp

    seed0 = _salt() % 1_000_000_000
    kw = dict(eps=1e-6, precision="mixed", solver="inverse",
              qres_period=int(os.environ.get("ABIP_SWEEP_QRES", "768")),
              avg_period=20, engine="sprint2",
              sprint_T=int(os.environ.get("ABIP_SWEEP_T", "32")),
              sprint_mu_switch=float(
                  os.environ.get("ABIP_SWEEP_SWITCH", "1e-4")))
    cp = os.environ.get("ABIP_SWEEP_COMPACT")
    if cp:
        kw["compact_period"] = int(cp)
    eg = os.environ.get("ABIP_SWEEP_ENDGAME")
    if eg:
        kw["endgame"] = eg
    en = os.environ.get("ABIP_SWEEP_ENGINE")
    if en:
        # single-phase engine override (e.g. "delta": whole solve in
        # anchored-delta chunks, no sprint phase, no twophase driver)
        kw["engine"] = en
        for k in ("sprint_T", "sprint_mu_switch", "endgame"):
            kw.pop(k, None)

    def batch(s0):
        import jax.numpy as jnp

        data = [reference_smoke_lp(seed=s0 + i) for i in range(B)]
        out = tuple(jnp.asarray(np.stack(z)) for z in zip(*data))
        # stage the upload BEFORE any clock (tunnel uploads ~8 MB/s;
        # 51 MB at B=64 would otherwise dominate the timed wall)
        _sync(sum(jnp.sum(a) for a in out))
        return out

    t0 = time.perf_counter()
    _sync(solve_lp_batch(*batch(seed0), **kw))
    first = time.perf_counter() - t0
    recs = []
    for r in range(rounds):
        data = batch(seed0 + (r + 1) * B)
        t0 = time.perf_counter()
        res = solve_lp_batch(*data, **kw)
        res = _sync(res)
        dt = time.perf_counter() - t0
        it = np.asarray(res.admm_iters)
        recs.append({
            "wall_sec": round(dt, 3),
            "solved": int((np.asarray(res.status) == 1).sum()),
            "total_iters": int(it.sum()),
            "max_iters": int(it.max()),
            "iters_per_sec": round(float(it.sum()) / dt, 1),
            "instances_per_sec": round(B / dt, 2),
        })
    return {"ok": True, "B": B, "first_call_sec": round(first, 2),
            "knobs": {k: v for k, v in kw.items()
                      if k in ("qres_period", "sprint_T",
                               "sprint_mu_switch", "compact_period",
                               "endgame")},
            "rounds": recs}


def run_child(mode: str, rounds: int):
    if mode == "rtt":
        rec = probe_rtt()
    else:
        rec = probe_b(int(mode[1:]), rounds)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", default="16,32,64")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--child", default=None)
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--skip-rtt", action="store_true")
    args = ap.parse_args()
    if args.child:
        run_child(args.child, args.rounds)
        return
    results = {"purpose": "honest sprint2 B-scaling (value-read sync)",
               "salt": _salt()}
    env = {**os.environ, "ABIP_PROBE_SALT": str(results["salt"])}
    env.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_bench_cache")
    modes = ([] if args.skip_rtt else ["rtt"]) + \
        [f"b{b.strip()}" for b in args.B.split(",")]
    for mode in modes:
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, __file__, "--child", mode,
             "--rounds", str(args.rounds)],
            env=env, capture_output=True, text=True, timeout=2400)
        try:
            rec = json.loads(p.stdout.strip().splitlines()[-1])
        except Exception:  # noqa: BLE001 -- the probe records faults
            rec = {"ok": False, "exit": p.returncode,
                   "stderr_tail": p.stderr[-800:]}
        rec["probe_wall_sec"] = round(time.perf_counter() - t0, 1)
        results[mode] = rec
        print(f"[{mode}] {json.dumps(rec)[:300]}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
