"""Offline replay of dumped straggler batches (CPU, deterministic).

Round-3 verdict item 1: ~25% of fresh sprint2 batches have one lane
taking 20-60x the host-parity ADMM count in the anchored phase-2
endgame.  This tool replays a dumped batch's straggler lane through the
solver variants that bracket the failure:

  f64        pure-f64 steps engine, whole solve  (host-parity trajectory)
  mixed      anchored-mixed steps engine, whole solve
  sprint2    the production two-phase driver (phase-1 f32 sprint ->
             9-tuple resume into anchored steps)
  sprint2-6t phase-1 sprint -> LEGACY 6-tuple resume (zeroed stage-average
             accumulators; the pre-650080d hand-off)

If f64/mixed are cheap but sprint2 blows up, the corruption is in the
f32 sprint phase or its hand-off; if mixed blows up too, the anchored
mixed-precision endgame itself diverges on this lane.

Usage::

    python tools/straggler_replay.py benchmarks/results/straggler_dumps/straggler_195532128.npz [lane]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _bsync(tree):
    """Value-read sync: jax.block_until_ready is a NO-OP on the
    axon remote backend (abip_tpu.utils.timing.sync)."""
    from abip_tpu.utils.timing import sync as _s

    return _s(tree)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("ABIP_COMPILE_CACHE"):
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["ABIP_COMPILE_CACHE"])
    import jax.numpy as jnp

    from abip_tpu.parallel.batched import device_solve_lp, solve_lp_batch

    dump = args[0]
    lanes = [int(a) for a in args[1:]] or None
    d = np.load(dump)
    As, bs, cs = d["As"], d["bs"], d["cs"]
    B = As.shape[0]
    if lanes is None:
        lanes = list(range(B))

    kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000,
              solver="inverse", qres_period=768, avg_period=20,
              probe_period=8, cadence="chunk")
    switch = 1e-4

    def run(tag, fn):
        t0 = time.perf_counter()
        r = fn()
        _bsync(r)
        dt = time.perf_counter() - t0
        out = {"tag": tag, "status": int(np.asarray(r.status).reshape(-1)[0]),
               "admm": int(np.asarray(r.admm_iters).reshape(-1)[0]),
               "ipm": int(np.asarray(r.ipm_iters).reshape(-1)[0]),
               "rel_gap": float(np.asarray(r.rel_gap).reshape(-1)[0]),
               "wall": round(dt, 2)}
        print(json.dumps(out), flush=True)
        return out

    if "--batch" in sys.argv:
        # vmapped B=16 phase-split replay -- the EXACT conditions of the
        # r03 straggler capture (the un-vmapped B=1 replay does NOT
        # reproduce the blowup; the pathology is vmap-specific)
        kwb = dict(kw)
        As_j = jnp.asarray(As)
        bs_j = jnp.asarray(bs)
        cs_j = jnp.asarray(cs)
        r1 = solve_lp_batch(As_j, bs_j, cs_j, precision="mixed",
                            engine="sprint", sprint_mu_switch=switch,
                            mu_stop=switch, **kwb)
        _bsync(r1)
        it1 = np.asarray(r1.admm_iters)
        print(json.dumps({"phase1_iters": it1.astype(int).tolist(),
                          "mu": [float(f"{x:.3e}")
                                 for x in np.asarray(r1.mu)]}), flush=True)
        for tag, extra in (("9t", (r1.u_sum_raw, r1.v_sum_raw, r1.sj)),
                           ("6t", ())):
            fn2 = jax.vmap(lambda A, b, c, *st: device_solve_lp(
                A, b, c, init_state=st, precision="mixed",
                engine="steps", **kwb))
            t0 = time.perf_counter()
            r2 = fn2(As_j, bs_j, cs_j, r1.u_raw, r1.v_raw, r1.mu,
                     r1.admm_iters, r1.ipm_iters, r1.status, *extra)
            _bsync(r2)
            dt = time.perf_counter() - t0
            it2 = np.asarray(r2.admm_iters) - it1
            print(json.dumps({
                "tag": f"batch-{tag}", "wall_p2": round(dt, 2),
                "p2_extra": it2.astype(int).tolist(),
                "status": np.asarray(r2.status).astype(int).tolist(),
                "max_p2": int(it2.max()), "mean_p2": float(it2.mean()),
            }), flush=True)
        return 0

    variants = os.environ.get(
        "ABIP_REPLAY_VARIANTS", "f64,mixed,sprint2,sprint_9t,sprint_6t"
    ).split(",")
    results = {}
    for lane in lanes:
        A = jnp.asarray(As[lane])
        b = jnp.asarray(bs[lane])
        c = jnp.asarray(cs[lane])
        A1 = A[None]
        b1 = b[None]
        c1 = c[None]
        print(f"--- lane {lane} ---", flush=True)
        rec = {}
        if "f64" in variants:
            rec["f64"] = run("f64", lambda: device_solve_lp(
                A, b, c, precision="f64", engine="steps", **kw))
        if "mixed" in variants:
            rec["mixed"] = run("mixed", lambda: device_solve_lp(
                A, b, c, precision="mixed", engine="steps", **kw))
        if "sprint2" in variants:
            rec["sprint2"] = run("sprint2", lambda: solve_lp_batch(
                A1, b1, c1, precision="mixed", engine="sprint2",
                sprint_mu_switch=switch, **kw))

        if "sprint_9t" in variants or "sprint_6t" in variants:
            # manual phase split for the hand-off variants
            r1 = device_solve_lp(A, b, c, precision="mixed", engine="sprint",
                                 sprint_mu_switch=switch, mu_stop=switch,
                                 **kw)
            _bsync(r1)
            rec["p1_iters"] = int(r1.admm_iters)
            rec["p1_mu"] = float(r1.mu)
        if "sprint_9t" in variants:
            rec["sprint_9t"] = run("sprint->9t", lambda: device_solve_lp(
                A, b, c, precision="mixed", engine="steps",
                init_state=(r1.u_raw, r1.v_raw, r1.mu, r1.admm_iters,
                            r1.ipm_iters, r1.status, r1.u_sum_raw,
                            r1.v_sum_raw, r1.sj), **kw))
        if "sprint_6t" in variants:
            rec["sprint_6t"] = run("sprint->6t", lambda: device_solve_lp(
                A, b, c, precision="mixed", engine="steps",
                init_state=(r1.u_raw, r1.v_raw, r1.mu, r1.admm_iters,
                            r1.ipm_iters, r1.status), **kw))
        results[lane] = rec
    out = os.environ.get("ABIP_REPLAY_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({"dump": dump, "lanes": results}, f, indent=1,
                      default=str)
    return 0


if __name__ == "__main__":
    sys.exit(main())
