"""B=64 fault isolation probe (VERDICT r2 item 3).

Round-2 observed: B=16 fine, B=32 regressed, B=64 raised
``UNAVAILABLE: TPU device error`` (``r03_tpu_bladder.json``).  This tool
isolates WHERE the fault lives by running each candidate config in a
FRESH subprocess (a device fault cannot poison the next probe or the
parent) and recording outcome + first-call (compile) wall + steady wall:

  steps64    solve_lp_batch B=64 engine=steps   (no Pallas kernel)
  kern64     vmapped fused_admm_sprint_stop B=64, T=768 (kernel alone)
  sprint48   solve_lp_batch B=48 engine=sprint2 (threshold search)
  sprint64   solve_lp_batch B=64 engine=sprint2 (the faulting config)

Usage:  python tools/tpu_b64_probe.py            # orchestrate all
        python tools/tpu_b64_probe.py <mode>     # one probe (child)

Timing hygiene: instances are salted with the parent's wall clock
(fresh draws per run) so remote replay caching cannot contaminate the
walls (docs/results.md "Hardware caveats").
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _bsync(tree):
    """Value-read sync: jax.block_until_ready is a NO-OP on the
    axon remote backend (abip_tpu.utils.timing.sync)."""
    from abip_tpu.utils.timing import sync as _s

    return _s(tree)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

OUT = os.path.join(_REPO, "benchmarks", "results", "r03_b64_probe.json")


def _salt() -> int:
    return int(os.environ.get("ABIP_PROBE_SALT", str(int(time.time()))))


def _probe_solve(B: int, engine: str):
    import jax
    import numpy as np

    from abip_tpu.parallel.batched import solve_lp_batch
    from bench import reference_smoke_lp

    seed0 = _salt() % 1_000_000_000
    As, bs, cs = [], [], []
    for i in range(B):
        A, b, c = reference_smoke_lp(seed=seed0 + i)
        As.append(A), bs.append(b), cs.append(c)
    batch = tuple(map(np.stack, (As, bs, cs)))
    kw = dict(eps=1e-6, precision="mixed", solver="inverse",
              qres_period=768, avg_period=20)
    if engine == "sprint2":
        kw.update(engine="sprint2", sprint_T=32, sprint_mu_switch=1e-4)
    t0 = time.perf_counter()
    res = solve_lp_batch(*batch, **kw)
    _bsync(res)
    first = time.perf_counter() - t0
    # fresh draws for the steady-state wall (replay hygiene)
    As, bs, cs = [], [], []
    for i in range(B):
        A, b, c = reference_smoke_lp(seed=seed0 + B + i)
        As.append(A), bs.append(b), cs.append(c)
    batch = tuple(map(np.stack, (As, bs, cs)))
    t0 = time.perf_counter()
    res = solve_lp_batch(*batch, **kw)
    _bsync(res)
    steady = time.perf_counter() - t0
    st = np.asarray(res.status)
    it = np.asarray(res.admm_iters)
    return {"ok": True, "first_call_sec": round(first, 2),
            "steady_wall_sec": round(steady, 3),
            "solved": int((st == 1).sum()), "B": B,
            "mean_iters": float(it.mean()),
            "instances_per_sec": round(B / steady, 2)}


def _probe_kernel(B: int):
    """The stopping-sprint Pallas kernel alone at batch B (natural
    shapes; `fused_admm_sprint_stop` pads internally and its custom
    vmap rule launches the grid-over-instances variant the driver
    uses)."""
    import jax
    import numpy as np

    from abip_tpu.ops.admm_pallas import fused_admm_sprint_stop

    rng = np.random.default_rng(_salt() % 2**31)
    m, n = 50, 2000
    l = m + n + 1
    A = (rng.standard_normal((B, m, n)) / n**0.5).astype(np.float32)
    Ninv = np.broadcast_to(np.eye(m, dtype=np.float32), (B, m, m)).copy()
    h = rng.standard_normal((B, l - 1)).astype(np.float32)
    g = rng.standard_normal((B, l - 1)).astype(np.float32)
    u0 = np.abs(rng.standard_normal((B, l))).astype(np.float32)
    v0 = np.abs(rng.standard_normal((B, l))).astype(np.float32)

    def one(A, Ninv, h, g, u, v):
        return fused_admm_sprint_stop(A, Ninv, h, g, 1.0, 1.0, 1e-3,
                                      1.8, 1e-9, u, v, T=768, probe=8)

    t0 = time.perf_counter()
    outs = jax.vmap(one)(A, Ninv, h, g, u0, v0)
    _bsync(outs)
    first = time.perf_counter() - t0
    return {"ok": True, "first_call_sec": round(first, 2), "B": B,
            "note": "kernel-only vmapped grid launch"}


MODES = {
    "steps64": lambda: _probe_solve(64, "steps"),
    "kern64": lambda: _probe_kernel(64),
    "sprint48": lambda: _probe_solve(48, "sprint2"),
    "sprint64": lambda: _probe_solve(64, "sprint2"),
}


def main():
    if len(sys.argv) > 1:
        mode = sys.argv[1]
        try:
            rec = MODES[mode]()
        except Exception as e:  # noqa: BLE001 -- the probe records faults
            rec = {"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}
        print(json.dumps(rec), flush=True)
        return
    results = {"purpose": "B=64 fault isolation", "salt": _salt()}
    env = {**os.environ, "ABIP_PROBE_SALT": str(results["salt"])}
    for mode in MODES:
        t0 = time.perf_counter()
        p = subprocess.run([sys.executable, __file__, mode], env=env,
                           capture_output=True, text=True, timeout=1200)
        try:
            rec = json.loads(p.stdout.strip().splitlines()[-1])
        except Exception:  # noqa: BLE001
            rec = {"ok": False, "exit": p.returncode,
                   "stderr_tail": p.stderr[-800:]}
        rec["probe_wall_sec"] = round(time.perf_counter() - t0, 1)
        results[mode] = rec
        print(f"[{mode}] {json.dumps(rec)[:200]}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
