"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: aggregate ADMM iterations/second over a B=16 batch of
reference-smoke-shape LPs (`/root/reference/test/test_abip_install.m:7-21`:
m=50, n=2000, density=0.3), solved to eps=1e-6 with the anchored
mixed-precision mode -- the TPU design point (suite throughput on one
chip).  `vs_baseline` divides by the measured single-thread reference C
solver rate (BASELINE_MEASURED.json, tools/reference_baseline_driver.c).

The timed batch uses DIFFERENT instances from the warm-up batch so remote
execution caches cannot contaminate the measurement.

Env knobs: ABIP_BENCH_CPU=1 (CPU backend), ABIP_BENCH_B (batch size),
ABIP_BENCH_SINGLE=1 (legacy single-instance f64 metric),
ABIP_BENCH_POOL=auto|N (host thread-pool suite mode -- the CPU-fallback
default: aggregate over N workers x fresh instances, the in-process
analogue of the reference's xargs batch runners),
ABIP_BENCH_ENGINE=sprint (+ ABIP_BENCH_SPRINT_T) for the fused-sprint
engine.
"""
import json
import sys
import os
import time

import numpy as np


def _bsync(tree):
    """Value-read sync in ONE transfer: jax.block_until_ready is a
    NO-OP on the axon remote backend, and per-leaf device_get pays
    ~35-60 ms tunnel latency PER LEAF (abip_tpu.utils.timing
    docstrings)."""
    from abip_tpu.utils.timing import sync_packed as _s

    return _s(tree)


def reference_smoke_lp(m=50, n_rand=1950, density=0.3, seed=0):
    """Random degenerate-free LP, the shape of `test_abip_install.m:7-21`:
    A = [sprand(m, n_rand, density), I_m], b = A x0, c = A' y0 + s0."""
    rng = np.random.default_rng(seed)
    Ar = rng.standard_normal((m, n_rand)) * (rng.random((m, n_rand)) < density)
    A = np.concatenate([Ar, np.eye(m)], axis=1)
    n = n_rand + m
    x0 = rng.random(n) + 0.5
    y0 = rng.standard_normal(m)
    s0 = rng.random(n) + 0.5
    b = A @ x0
    c = A.T @ y0 + s0
    return A, b, c


def _load_baseline():
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f).get("admm_iters_per_sec_reference")
    return None


def _reference_binary():
    """Path to the reference parity binary (file-driven abip-lp direct
    solve), building it from /root/reference on first use.

    The solved-instance draws vary ~4x in difficulty (per-lane q=1
    counts 2k-9k on the smoke shape), so dividing our instance rate by
    the reference's rate on its OWN fixed draw (1993 admm iters) is
    apples-to-oranges.  The honest ratio times the reference binary on
    the SAME instances the TPU batch solved.  Returns None when the
    reference tree or a C compiler is unavailable (the ratio is then
    simply omitted)."""
    if os.environ.get("ABIP_BENCH_NO_REF"):
        return None
    # cache under the repo, not a fixed world-writable /tmp path: a
    # pre-planted /tmp/refbench/refparity would otherwise be executed
    # as-is (advisor finding, round 3)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".refbench")
    binpath = os.path.join(cache_dir, "refparity")
    if os.path.exists(binpath):
        return binpath
    R = "/root/reference/src/abip-lp"
    drv = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tools", "reference_baseline_driver.c")
    if not (os.path.isdir(R) and os.path.exists(drv)):
        return None
    import glob
    import subprocess

    os.makedirs(cache_dir, exist_ok=True)
    srcs = [drv] + [
        f"{R}/src/{s}.c" for s in
        ("abip", "adaptive", "cs", "ctrlc", "linalg", "normalize", "util")
    ] + [f"{R}/linsys/common.c", f"{R}/linsys/direct.c"] + \
        glob.glob(f"{R}/external/amd/*.c") + [
        f"{R}/external/ldl/ldl.c", f"{R}/external/SuiteSparse_config.c"]
    cmd = ["gcc", "-O3", "-march=native", "-DNDEBUG", "-DPARITY_MAIN",
           "-o", binpath] + srcs + [
        f"-I{R}/include", f"-I{R}/linsys", f"-I{R}/external",
        f"-I{R}/external/amd", f"-I{R}/external/ldl", "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except Exception:  # noqa: BLE001 -- ratio is optional context
        return None
    return binpath if os.path.exists(binpath) else None


def _reference_same_instances(seed0, B, eps=1e-6):
    """Serial reference wall on the SAME instances as _batch(seed0, B).

    Returns {"wall_sec", "mean_admm", "solved"} or None if the binary is
    unavailable or any run fails."""
    import struct
    import subprocess
    import tempfile

    binpath = _reference_binary()
    if binpath is None:
        return None
    import scipy.sparse as sp

    wall, iters, solved = 0.0, 0, 0
    for i in range(B):
        A, b, c = reference_smoke_lp(seed=seed0 + i)
        Asp = sp.csc_matrix(A)
        fd, path = tempfile.mkstemp(suffix=".bin")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(struct.pack("<3q", *Asp.shape, Asp.nnz))
                f.write(np.asarray(Asp.indptr, "<i8").tobytes())
                f.write(np.asarray(Asp.indices, "<i8").tobytes())
                f.write(np.asarray(Asp.data, "<f8").tobytes())
                f.write(np.asarray(b, "<f8").tobytes())
                f.write(np.asarray(c, "<f8").tobytes())
            out = subprocess.run([binpath, path, f"{eps:g}"],
                                 capture_output=True, text=True,
                                 timeout=600)
            rec = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception:  # noqa: BLE001 -- ratio is optional context
            return None
        finally:
            os.unlink(path)
        wall += rec["time_sec"]
        iters += rec["admm"]
        solved += rec["status"] == "Solved"
    return {"wall_sec": round(wall, 3), "mean_admm": round(iters / B, 1),
            "solved": solved}


def _load_baseline_instances_per_sec():
    """Reference solved-instance rate on the smoke shape: 1 instance per
    median solve wall (0.4387 s single-thread direct backend) -- the
    metric a user feels; `vs_baseline_instances` divides by it."""
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            t = json.load(f).get("reference_time_sec_median")
        if t:
            return 1.0 / t
    return None


def _batch(seed0, B):
    import jax.numpy as jnp

    data = [reference_smoke_lp(seed=seed0 + i) for i in range(B)]
    return (jnp.asarray(np.stack([d[0] for d in data])),
            jnp.asarray(np.stack([d[1] for d in data])),
            jnp.asarray(np.stack([d[2] for d in data])))


# Remote-execution replay guard: the axon tunnel caches (program, inputs)
# across PROCESSES, so re-running the bench with the same seeds can return
# instantly with the cached result (the r02 sweep recorded a physically
# impossible 1.26M it/s 45 ms "solve" this way).  Every timed round
# therefore draws instances from a wall-clock-salted seed range no prior
# run can have used; identical-shape programs still hit the compile cache.
_SEED_SALT = (int(time.time()) % 1_000_000) * 10_000


def _plausible(rate, ceiling):
    """A measured rate above the roofline ceiling is a replay artifact,
    not a measurement (the model is generous: launch overheads are not
    in it)."""
    return ceiling is None or rate <= ceiling


def _median_pick(cands, rate_of, valid_of):
    """Median-of-valid-rounds selection (round-3 verdict: "best" is not
    what a user gets -- the driver's independent sample landed 6x below
    the best-of-3 number).  Returns (chosen_cand, rounds_detail):
    the chosen round is the median-rate round among VALID rounds (all
    lanes solved); if no round is fully valid, the median among all
    surviving rounds (its solved count then exposes the failure).  With
    an even count the LOWER middle is reported -- conservative.  Every
    round's rate/wall/validity is recorded in rounds_detail so the
    spread is visible in the artifact."""
    detail = [{"rate": round(rate_of(c), 1),
               "wall_sec": round(c[1], 4),
               "valid": bool(valid_of(c))} for c in cands]
    pool = [c for c in cands if valid_of(c)] or cands
    pool = sorted(pool, key=rate_of)
    chosen = pool[(len(pool) - 1) // 2]
    return chosen, detail


def _drop_replay_outliers(rounds, rate_of):
    """Median-based replay cut: the bandwidth-model ceiling is far too
    generous for small shapes (14M it/s at B=16 smoke), and the r02
    pass-4/5 sweeps recorded 1.7-3.1M it/s ~50 ms "solves" WITH fresh
    salted seeds that sailed under it.  A replayed round is 20-60x the
    honest rate, so any round above 2.5x the anchor is an artifact,
    never a measurement.

    The anchor is the LOWER middle of the sorted rates: replays are
    always faster than honest rounds, so with 2 rounds (or a replay
    majority) the upper middle IS a replay and would keep itself --
    anchoring low can only over-cut, and an over-cut drops a fast honest
    round rather than reporting a fake one.  The anchor round always
    survives its own cut, so the result is never empty."""
    if len(rounds) < 2:
        return rounds
    rates = sorted(rate_of(r) for r in rounds)
    med = rates[(len(rates) - 1) // 2]
    return [r for r in rounds if rate_of(r) <= 2.5 * med]


def main():
    # Watchdog wrapper: the TPU tunnel in this environment can wedge and
    # block jax calls indefinitely.  The outer process re-runs itself with
    # ABIP_BENCH_INNER=1 under a timeout and falls back to the CPU backend
    # if the device run hangs or fails, so a benchmark line is always
    # produced.
    if not os.environ.get("ABIP_BENCH_INNER"):
        import subprocess

        # CPU fallback config: XLA-CPU serializes vmapped lanes AND the
        # B=1 vmap wrapper itself costs ~45% there, so on host the fast
        # configuration is direct (un-vmapped) anchored-mixed solves, one
        # per pool thread -- suite-level parallelism over host cores, the
        # in-process analogue of the reference's xargs batch runners
        # (measured ~2.5x the serial rate on the 4-core bench host);
        # vmap batching pays only on TPU.
        cpu_cfg = ({"ABIP_BENCH_CPU": "1", "ABIP_BENCH_POOL": "auto"}, 900)
        user_b = os.environ.get("ABIP_BENCH_B")
        user_single = os.environ.get("ABIP_BENCH_SINGLE")
        if os.environ.get("ABIP_BENCH_CPU"):
            # caller forced CPU: never probe the accelerator; honor an
            # explicit batch size or single mode (the pool default would
            # shadow ABIP_BENCH_SINGLE), else the CPU-optimal pool config
            attempts = [({"ABIP_BENCH_CPU": "1"}, 900)] \
                if (user_b or user_single) else [cpu_cfg]
        elif not _device_alive():
            # wedged/absent accelerator tunnel: don't burn the device
            # watchdog budgets, fall straight back to CPU
            attempts = [cpu_cfg]
        elif user_b:
            # caller pinned the batch size: one device attempt with it
            attempts = [({}, 1800), cpu_cfg]
        else:
            # device ladder: MEASURED-best config first (the ladder stops
            # at the first success, so a working-but-slower rung would
            # shadow a better one).  Round-2 TPU sweeps: B=16/q=768
            # 16-17.6x, B=8/q=512 11.7x; B=32 regresses (nonlinear cost
            # growth) and B=32/q=256 faulted the device outright.
            # Each rung is a FRESH subprocess, so one rung's device fault
            # cannot poison the next.
            attempts = [
                ({"ABIP_BENCH_B": "16"}, 1200),
                ({"ABIP_BENCH_B": "8"}, 1200),
                cpu_cfg,
            ]
        for extra_env, timeout_s in attempts:
            env = dict(os.environ, ABIP_BENCH_INNER="1", **extra_env)
            # persistent compile cache across attempts: if a device
            # attempt times out DURING its (many-minute, B=64) compile,
            # the next attempt reuses the finished pieces instead of
            # starting over
            env.setdefault("ABIP_COMPILE_CACHE", "/tmp/abip_bench_cache")
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True,
                    timeout=timeout_s,
                )
                lines = [ln for ln in proc.stdout.splitlines()
                         if ln.startswith("{")]
                if proc.returncode == 0 and lines:
                    print(lines[-1])
                    return
            except subprocess.TimeoutExpired:
                pass
        print(json.dumps({
            "metric": "admm_iters_per_sec", "value": 0.0, "unit": "iter/s",
            "vs_baseline": None,
            "detail": {"error": "both TPU and CPU benchmark runs failed/hung"},
        }))
        return

    _bench_inner()


def _device_alive():
    """Probe the accelerator in two subprocess stages.

    The axon TPU tunnel in this image can wedge remote-side, making any
    jax op block indefinitely; a probe under a timeout distinguishes a
    live device from a wedged tunnel without spending the full benchmark
    watchdog budget.  Killing a client MID-REMOTE-COMPILE can wedge the
    tunnel further, so the probe is split: stage 1 only enumerates
    devices (no compilation in flight -- safe to kill on timeout); the
    stage-2 compile probe runs only after enumeration succeeded, with a
    timeout far above the normal 20-40 s first-compile latency, so a
    mid-compile kill is a last resort, not the common path.  Returns
    False when the default backend is CPU-only as well -- the CPU
    fallback config is then strictly better than the "device" configs.
    """
    import subprocess

    enum_code = (
        "import jax\n"
        "assert jax.default_backend() != 'cpu'\n"
        "assert len(jax.devices()) > 0\n"
        "print('ENUM_OK')\n"
    )
    compile_code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "assert jax.default_backend() != 'cpu'\n"
        "x = jnp.asarray(np.random.rand(128, 128).astype(np.float32))\n"
        "jax.jit(lambda a: a @ a)(x).block_until_ready()\n"
        "print('DEVICE_OK')\n"
    )
    # NOTE: killing the stage-2 child at its timeout CAN be a mid-compile
    # kill on a degraded tunnel -- but skipping the probe only moves that
    # same kill to the full benchmark subprocess at its (longer) watchdog
    # timeout; the probe strictly reduces exposure.  Timeout overridable
    # via ABIP_BENCH_PROBE_S for slower environments.
    probe_s = int(os.environ.get("ABIP_BENCH_PROBE_S", "540"))
    for code, token, timeout_s in ((enum_code, "ENUM_OK", 120),
                                   (compile_code, "DEVICE_OK", probe_s)):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=timeout_s,
            )
            if token not in proc.stdout:
                return False
        except subprocess.TimeoutExpired:
            return False
    return True


def _emit(out):
    """Print the bench line, attaching recorded cross-suite context.

    The driver records ONE line; the conic and at-scale head-to-heads
    live as committed artifacts -- surface their headline ratios here so
    the single line carries the round's full measured picture."""
    recorded = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for key, path, field in (
        ("conic_dim1020_ladder_vs_ref",
         "benchmarks/results/r05_conic_dim1020_ladder.json",
         ("batched_sprint2", "wall_speedup_vs_ref_same")),
        ("lp_m500_n5000_tpu_wall_vs_ref",
         "benchmarks/results/r05_lp_m500_tpu.json",
         (None, "wall_speedup_vs_ref_same")),
        ("lp_m1000_n10000_tpu_wall_vs_ref",
         "benchmarks/results/r05_lp_m1000_tpu.json",
         (None, "wall_speedup_vs_ref_same")),
        ("lasso_paper_sgm10_speedup",
         "benchmarks/results/r04_ml_lasso_paper_table.json",
         (None, "sgm10_speedup")),
        ("lasso_m2000_n5000_tpu_sec",
         "benchmarks/results/r05_ml_lasso_paper_tpu/lasso_m2000_n5000.json",
         (None, "time")),
        ("pagerank_n1e4_batch_vs_host",
         "benchmarks/results/r05_pagerank_batch_n1e4.json",
         (None, "wall_speedup_vs_host")),
        ("svm_m50k_qp_vs_ref",
         "benchmarks/results/r05_ml_svm_scale/svmscale_m50000_n123_C1.json",
         (None, "qp_speedup_vs_ref")),
        ("qp_fullQ_dim612_device_pool_vs_ref",
         "benchmarks/results/r02_qp_throughput_dim612.json",
         ("device_pool", "vs_reference")),
    ):
        try:
            with open(os.path.join(here, path)) as f:
                d = json.load(f)
            recorded[key] = (d[field[1]] if field[0] is None
                             else d[field[0]][field[1]])
        except Exception:  # noqa: BLE001 -- context only, never fail bench
            pass
    if recorded:
        out.setdefault("detail", {})["recorded_artifacts"] = recorded
    print(json.dumps(out))


def _speed_of_light(shape, kw, B):
    """Roofline ceiling for the current config: measured/ceiling fraction
    is the reference-style per-iteration cost report
    (`direct.c:15-26` analogue; see `abip_tpu/utils/roofline.py`)."""
    import jax

    from abip_tpu.utils.roofline import lp_iteration_cost

    chip = "cpu" if jax.default_backend() == "cpu" else "tpu_v5e"
    c = lp_iteration_cost(shape[0], shape[1],
                          precision=kw.get("precision", "mixed"),
                          qres_period=kw.get("qres_period", 1),
                          avg_period=kw.get("avg_period", 10), chip=chip)
    return {
        "sol_iters_per_sec": round(B * c.ceiling_iters_per_sec, 1),
        "sol_chip_model": chip,
        "iter_bytes": int(c.bytes_moved),
    }


def _bench_inner():
    import jax

    if os.environ.get("ABIP_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import abip_tpu  # noqa: F401  (enables x64)
    from abip_tpu.parallel.batched import device_solve_lp, solve_lp_batch

    base = _load_baseline()
    kw = dict(eps=1e-6, max_ipm=200, max_admm=200_000)
    # measured-fastest solve options (identical/equivalent trajectories,
    # solutions oracle-checked vs scipy at 1e-6): explicit-inverse f32
    # KKT apply + inner-criterion checks every 8th iteration
    # measured on this host (oracle-checked, wall-time-optimal — see
    # /tmp sweep in session log): criterion every 16th, average candidate
    # every 20th iteration
    kw["solver"] = os.environ.get("ABIP_BENCH_SOLVER", "inverse")
    # criterion cadence: host-measured optimum is 16; on TPU each chunk
    # exit pays the f64 residual check + (delta engine) anchor rebuild,
    # so larger chunks win: honest delta-engine rounds at B=16 measured
    # q=768 67-74k it/s, q=1536 81-88k / 20-24 inst/s, q=3072 96-116k
    # it/s but with iteration inflation and a weaker instance rate --
    # 1536 is the balanced default (r04 probes, /tmp/bsweep_q*.json
    # summarized in docs/performance.md)
    default_qres = "16" if jax.default_backend() == "cpu" else "1536"
    kw["qres_period"] = int(os.environ.get("ABIP_BENCH_QRES", default_qres))
    kw["avg_period"] = int(os.environ.get("ABIP_BENCH_AVG", "20"))

    pool_env = os.environ.get("ABIP_BENCH_POOL")
    if pool_env:
        import jax.numpy as jnp

        from abip_tpu.parallel.host_pool import pool_map

        W = (os.cpu_count() or 1) if pool_env == "auto" else int(pool_env)
        # 8 instances per worker amortizes the convergence-tail imbalance
        # (measured: B=4W 7.2x -> B=8W 8.3x on the 4-core host)
        B = int(os.environ.get("ABIP_BENCH_B", str(8 * W)))
        kw["precision"] = os.environ.get("ABIP_BENCH_PRECISION", "mixed")

        def solve(seed):
            A, b, c = reference_smoke_lp(seed=seed)
            r = device_solve_lp(jnp.asarray(A), jnp.asarray(b),
                                jnp.asarray(c), **kw)
            _bsync(r)
            return r

        solve(10_000)  # compile warm-up on a non-timed instance
        # Median-of-N rounds over DISJOINT fresh seed ranges: this host
        # has invisible CPU steal that can halve a single measurement.
        # Only rounds whose instances ALL solved to tolerance count as
        # valid (an unconverged round can have a deceptively high
        # iters/s); the median valid round is reported, with every
        # round's rate recorded (round-3 verdict: drop "best").
        rounds = int(os.environ.get("ABIP_BENCH_ROUNDS", "3"))
        cands = []
        for r_i in range(rounds):
            t0 = time.perf_counter()
            res = pool_map(solve, range(r_i * B, (r_i + 1) * B), W)
            dt = time.perf_counter() - t0
            iters = sum(int(r.admm_iters) for r in res)
            valid = (all(int(r.status) == 1 for r in res)
                     and max(float(np.asarray(r.rel_gap)) for r in res)
                     <= 1.05e-6)
            cands.append((iters, dt, res, valid))
        chosen, rounds_detail = _median_pick(
            cands, rate_of=lambda c: c[0] / c[1], valid_of=lambda c: c[3])
        iters, dt, res, _ = chosen
        solved = sum(int(r.status) == 1 for r in res)
        # host ceiling (B=1): pool instances SHARE the host roofline; the
        # model is DRAM-bandwidth-based, so a cache-resident A can push
        # the measured aggregate above it
        sol = _speed_of_light((50, 2000), kw, 1)
        out = {
            "metric": "admm_iters_per_sec",
            "value": round(iters / dt, 1),
            "unit": "iter/s",
            "vs_baseline": round(iters / dt / base, 3) if base else None,
            "detail": {
                "mode": f"host pool W={W} x {B} instances "
                        f"{kw['precision']} (aggregate, median of "
                        f"{rounds})",
                "problem": "smoke_lp m=50 n=2000 density=0.3",
                "rounds": rounds_detail,
                "eps": 1e-6, "solved": solved, "total_admm_iters": iters,
                "wall_sec": round(dt, 4),
                "instances_per_sec": round(B / dt, 2),
                "baseline": "reference abip-lp direct, 1 thread "
                            "(BASELINE_MEASURED.json)",
                "backend": jax.default_backend(),
                "host_cores": os.cpu_count(),
                "rel_gap_max": max(float(np.asarray(r.rel_gap))
                                   for r in res),
                "sol_note": "host DRAM roofline; cache-resident A can "
                            "exceed it",
                **sol,
            },
        }
        _emit(out)
        return

    if os.environ.get("ABIP_BENCH_STREAM"):
        from abip_tpu.parallel.segmented import solve_lp_stream

        B = int(os.environ.get("ABIP_BENCH_B", "8"))
        N = int(os.environ.get("ABIP_BENCH_N", str(6 * B)))
        seg = int(os.environ.get("ABIP_BENCH_SEG", "32"))
        skw = dict(eps=1e-6, max_ipm=200, max_admm=200_000,
                   qres_period=kw["qres_period"])

        def suite(seed0):
            return [reference_smoke_lp(seed=seed0 + i) for i in range(N)]

        solve_lp_stream(suite(10_000)[:B], B=B, seg_chunks=seg, **skw)
        rounds = int(os.environ.get("ABIP_BENCH_ROUNDS", "3"))
        cands = []
        for r_i in range(rounds):
            t0 = time.perf_counter()
            res, info = solve_lp_stream(suite(_SEED_SALT + r_i * N), B=B,
                                        seg_chunks=seg, **skw)
            dt = time.perf_counter() - t0
            cands.append((info["total_admm_iters"], dt, res, info))
        chosen, rounds_detail = _median_pick(
            cands, rate_of=lambda c: c[0] / c[1],
            valid_of=lambda c: c[3]["solved"] == N)
        its, dt, res, info = chosen
        out = {
            "metric": "admm_iters_per_sec",
            "value": round(its / dt, 1),
            "unit": "iter/s",
            "vs_baseline": round(its / dt / base, 3) if base else None,
            "detail": {
                "mode": f"stream N={N} B={B} seg={seg} "
                        f"q={kw['qres_period']} (lane-swap pipeline, "
                        f"median of {rounds})",
                "rounds": rounds_detail,
                "problem": "smoke_lp m=50 n=2000 density=0.3",
                "eps": 1e-6, "solved": info["solved"],
                "total_admm_iters": its,
                "wall_sec": round(dt, 4),
                "instances_per_sec": round(N / dt, 2),
                "segments": info["segments"],
                "baseline": "reference abip-lp direct, 1 thread "
                            "(BASELINE_MEASURED.json)",
                "backend": jax.default_backend(),
                "rel_gap_max": max(r["rel_gap"] for r in res),
            },
        }
        _emit(out)
        return

    if os.environ.get("ABIP_BENCH_SINGLE"):
        import jax.numpy as jnp

        # anchored mixed precision beats f64 ~10% even on CPU (identical
        # trajectory, cheaper matvecs); override with ABIP_BENCH_PRECISION
        kw["precision"] = os.environ.get("ABIP_BENCH_PRECISION", "mixed")
        A, b, c = reference_smoke_lp()
        res = device_solve_lp(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), **kw)
        _bsync(res)
        A2, b2, c2 = reference_smoke_lp(seed=_SEED_SALT + 123)
        t0 = time.perf_counter()
        res = device_solve_lp(jnp.asarray(A2), jnp.asarray(b2),
                              jnp.asarray(c2), **kw)
        _bsync(res)
        dt = time.perf_counter() - t0
        iters = int(res.admm_iters)
        sol = _speed_of_light(A2.shape, kw, 1)
        out = {
            "metric": "admm_iters_per_sec",
            "value": round(iters / dt, 1),
            "unit": "iter/s",
            "vs_baseline": round(iters / dt / base, 3) if base else None,
            "detail": {
                "mode": f"single {kw['precision']} "
                        "(direct device_solve_lp, no vmap)",
                "problem": "smoke_lp m=50 n=2000 density=0.3",
                "eps": 1e-6, "status": int(res.status),
                "admm_iters": iters, "solve_sec": round(dt, 4),
                "baseline": "reference abip-lp direct, 1 thread "
                            "(BASELINE_MEASURED.json)",
                "backend": jax.default_backend(),
                "rel_gap": float(np.asarray(res.rel_gap)),
                **sol,
            },
        }
        _emit(out)
        return

    import jax.numpy as jnp

    B = int(os.environ.get("ABIP_BENCH_B", "16"))
    precision = os.environ.get("ABIP_BENCH_PRECISION", "mixed")
    # TPU default engine is the single-phase anchored-delta kernel
    # (ops/admm_delta.py): every ADMM iteration runs as an f32 delta
    # from a per-chunk f64 anchor inside one Pallas kernel, with
    # per-lane in-kernel stopping.  Honest value-read-synced rounds at
    # B=16: 68-71k it/s / 15-20 inst/s vs 44-55k (sprint2+delta) and
    # 11k (sprint2+steps) -- r04_bsweep_delta1p.json.  CPU keeps steps
    # (no Pallas there).
    default_engine = "steps" if jax.default_backend() == "cpu" else "delta"
    engine = os.environ.get("ABIP_BENCH_ENGINE", default_engine)
    if engine in ("sprint", "sprint2"):
        kw.update(engine=engine,
                  sprint_T=int(os.environ.get("ABIP_BENCH_SPRINT_T", "32")),
                  sprint_mu_switch=float(
                      os.environ.get("ABIP_BENCH_SPRINT_SWITCH", "1e-4")))
        if engine == "sprint2":
            eg = os.environ.get("ABIP_BENCH_ENDGAME")
            if eg:
                kw.update(endgame=eg)
    elif engine == "delta":
        kw.update(engine="delta")
    warm = _batch(10_000, B)
    res = solve_lp_batch(*warm, precision=precision, **kw)
    _bsync(res)

    # median-of-N fresh-data rounds (5 by default: the round-3 verdict's
    # reproducibility bar is max/min spread < 2x across 5 rounds; every
    # round's rate is recorded in detail.rounds)
    rounds = int(os.environ.get("ABIP_BENCH_ROUNDS", "5"))
    sol = _speed_of_light((50, 2000), {**kw, "precision": precision}, B)
    # CPU exempt: a cache-resident A legitimately beats the DRAM-roofline
    # model there (see the pool-mode sol_note); replay is a remote-tunnel
    # phenomenon anyway
    ceiling = (sol["sol_iters_per_sec"]
               if jax.default_backend() != "cpu" else None)
    cands = []
    for r_i in range(rounds):
        seed0 = _SEED_SALT + r_i * B
        timed = _batch(seed0, B)
        # force the (fresh) upload to COMPLETE before the clock:
        # jnp.asarray only dispatches it, and the tunnel uploads at
        # ~8 MB/s (r5 measurement; the reference column's walls are
        # solver-internal, so staging keeps the comparison symmetric)
        _bsync(jnp.sum(timed[0]) + jnp.sum(timed[1]) + jnp.sum(timed[2]))
        t0 = time.perf_counter()
        res = solve_lp_batch(*timed, precision=precision, **kw)
        _bsync(res)
        dt = time.perf_counter() - t0
        cand = (np.asarray(res.admm_iters), dt, res, seed0)
        rate = float(cand[0].sum()) / dt
        if not _plausible(rate, ceiling):
            continue  # replay artifact; never report it
        cands.append(cand)
    cands = _drop_replay_outliers(
        cands, lambda c: float(c[0].sum()) / c[1])
    if not cands:
        print(json.dumps({
            "metric": "admm_iters_per_sec", "value": 0.0, "unit": "iter/s",
            "vs_baseline": None,
            "detail": {"error": "all rounds exceeded the roofline ceiling "
                                "(remote replay artifacts)"}}))
        return
    chosen, rounds_detail = _median_pick(
        cands,
        rate_of=lambda c: float(c[0].sum()) / c[1],
        valid_of=lambda c: bool((np.asarray(c[2].status) == 1).all()))
    its, dt, res, best_seed0 = chosen
    st = np.asarray(res.status)
    agg = float(its.sum()) / dt
    inst_base = _load_baseline_instances_per_sec()
    # honest solved-instance ratio: time the reference binary on the SAME
    # instances the winning round solved (instance difficulty varies ~4x
    # across draws, so the fixed-draw rate under/over-states the ratio)
    ref_same = _reference_same_instances(best_seed0, B)
    out = {
        "metric": "admm_iters_per_sec",
        "value": round(agg, 1),
        "unit": "iter/s",
        "vs_baseline": round(agg / base, 3) if base else None,
        "detail": {
            "mode": f"batched B={B} {precision} engine={engine} "
                    f"(aggregate, median of {len(rounds_detail)} rounds)",
            "problem": "smoke_lp m=50 n=2000 density=0.3",
            "rounds": rounds_detail,
            "eps": 1e-6,
            "solved": int((st == 1).sum()),
            "total_admm_iters": int(its.sum()),
            "mean_admm_iters": float(its.mean()),
            "batch_wall_sec": round(dt, 4),
            "instances_per_sec": round(B / dt, 2),
            "vs_baseline_instances": (round((B / dt) / inst_base, 3)
                                      if inst_base else None),
            **({"ref_same_instances_wall_sec": ref_same["wall_sec"],
                "ref_same_instances_mean_admm": ref_same["mean_admm"],
                "ref_same_instances_solved": ref_same["solved"],
                "vs_reference_same_instances":
                    round(ref_same["wall_sec"] / dt, 2)}
               if ref_same else {}),
            "baseline": "reference abip-lp direct, 1 thread "
                        "(BASELINE_MEASURED.json)",
            "backend": jax.default_backend(),
            "rel_gap_max": float(np.asarray(res.rel_gap).max()),
            **sol,
        },
    }
    _emit(out)


if __name__ == "__main__":
    main()
