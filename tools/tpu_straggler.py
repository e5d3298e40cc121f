"""Straggler hunt for the sprint2 TPU headline: per-phase iteration split.

Round-2/3 sweeps showed rare batches where the B=16 sprint2 mean ADMM
count jumps from ~4k to ~17k with one lane unsolved (30 s wall instead
of ~1.7 s).  This tool runs many FRESH batches, records phase-1 (f32
stopping-sprint) vs phase-2 (anchored-f64 steps) per-lane iteration
counts, and dumps any pathological batch's raw instances to .npz for
offline reproduction.

Usage::

    timeout 3000 python tools/tpu_straggler.py      # never kill mid-compile
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

OUT = os.environ.get("ABIP_STRAGGLER_OUT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "results", "r03_tpu_straggler.json")
DUMPDIR = os.path.join(os.path.dirname(OUT), "straggler_dumps")


def main():
    os.environ.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_bench_cache")
    import jax

    if "--allow-cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["ABIP_COMPILE_CACHE"])
    import jax.numpy as jnp

    from abip_tpu.parallel.batched import solve_lp_batch
    from bench import reference_smoke_lp

    B = int(os.environ.get("ABIP_STRAGGLER_B", "16"))
    nbatch = int(os.environ.get("ABIP_STRAGGLER_N", "10"))
    switch = float(os.environ.get("ABIP_STRAGGLER_SWITCH", "1e-4"))
    kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000, precision="mixed",
              solver="inverse", qres_period=768, avg_period=20,
              probe_period=8, cadence="chunk")

    def batch(s0):
        d = [reference_smoke_lp(seed=s0 + i) for i in range(B)]
        return (jnp.asarray(np.stack([x[0] for x in d])),
                jnp.asarray(np.stack([x[1] for x in d])),
                jnp.asarray(np.stack([x[2] for x in d])))

    results = {"purpose": "sprint2 phase-split straggler hunt",
               "backend": jax.default_backend(), "B": B,
               "switch": switch, "batches": []}

    def save():
        results["updated"] = time.strftime("%Y-%m-%d %H:%M:%S UTC",
                                           time.gmtime())
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    seed = 200_000 + (int(time.time()) % 1_000_000) * 1_000
    # warm-up compile on a throwaway batch (both phases)
    r = solve_lp_batch(*batch(seed), engine="sprint2",
                       sprint_mu_switch=switch, **kw)
    _bsync(r)
    seed += B

    for bi in range(nbatch):
        As, bs, cs = batch(seed)
        t0 = time.perf_counter()
        # phase 1 manually (mirrors _solve_lp_batch_twophase) so the
        # per-phase counts are observable
        r1 = solve_lp_batch(As, bs, cs, engine="sprint",
                            sprint_mu_switch=switch, mu_stop=switch, **kw)
        _bsync(r1)
        t1 = time.perf_counter()
        it1 = np.asarray(r1.admm_iters).copy()
        st1 = np.asarray(r1.status).copy()
        mu1 = np.asarray(r1.mu).copy()
        from abip_tpu.parallel.batched import device_solve_lp
        # 9-tuple resume: carry the stage-average accumulators exactly as
        # the production _solve_lp_batch_twophase does -- the legacy
        # 6-tuple hand-off zeroed them and measured the pre-650080d
        # behavior (advisor finding, round 3)
        init = (r1.u_raw, r1.v_raw, r1.mu, r1.admm_iters, r1.ipm_iters,
                r1.status, r1.u_sum_raw, r1.v_sum_raw, r1.sj)
        fn2 = jax.vmap(
            lambda A, b, c, u0, v0, mu0, k0, i0, st0, us0, vs0, sj0:
            device_solve_lp(A, b, c,
                            init_state=(u0, v0, mu0, k0, i0, st0,
                                        us0, vs0, sj0),
                            engine="steps", **kw))
        r2 = fn2(As, bs, cs, *init)
        _bsync(r2)
        t2 = time.perf_counter()
        it2 = np.asarray(r2.admm_iters)
        st2 = np.asarray(r2.status)
        gap2 = np.asarray(r2.rel_gap)
        total = np.where(st1 != 0, it1, it2)
        stat = np.where(st1 != 0, st1, st2)
        rec = {
            "seed0": seed,
            "wall_p1": round(t1 - t0, 3),
            "wall_p2": round(t2 - t1, 3),
            "solved": int((stat == 1).sum()),
            "mean_total": round(float(total.mean()), 1),
            "max_total": int(total.max()),
            "p1_iters": it1.astype(int).tolist(),
            "p2_extra": (np.where(st1 != 0, 0, it2 - it1)).astype(int).tolist(),
            "p1_status": st1.astype(int).tolist(),
            "final_status": stat.astype(int).tolist(),
            "mu_at_switch": [float(f"{x:.3e}") for x in mu1],
            "rel_gap_max": float(np.nanmax(np.where(stat == 1, gap2, 0.0))),
        }
        bad = (stat != 1).any() or total.mean() > 8000
        if bad:
            os.makedirs(DUMPDIR, exist_ok=True)
            dump = os.path.join(DUMPDIR, f"straggler_{seed}.npz")
            np.savez_compressed(dump, As=np.asarray(As), bs=np.asarray(bs),
                                cs=np.asarray(cs))
            rec["dump"] = dump
        results["batches"].append(rec)
        print(f"[{bi}] wall {rec['wall_p1']}+{rec['wall_p2']}s "
              f"mean {rec['mean_total']} solved {rec['solved']}/{B}"
              + (" DUMPED" if bad else ""), flush=True)
        save()
        seed += B

    walls = [b["wall_p1"] + b["wall_p2"] for b in results["batches"]]
    results["inst_per_sec_median"] = round(B / float(np.median(walls)), 2)
    results["inst_per_sec_worst"] = round(B / float(np.max(walls)), 2)
    save()
    print(json.dumps({k: v for k, v in results.items() if k != "batches"},
                     indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
