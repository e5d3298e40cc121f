"""Head-to-head parity: reference C solver vs abip_tpu on IDENTICAL LPs.

Exports generated instances in the binary format read by
tools/reference_baseline_driver.c (compiled with -DPARITY_MAIN), runs
both solvers at the same tolerance, and compares status / objective /
iteration counts.

Usage::

    # build the reference binary first (see reference_baseline_driver.c)
    python tools/parity_run.py --ref-bin /tmp/refbench/refparity --eps 1e-6
"""
from __future__ import annotations

import argparse
import json
import struct
import subprocess
import sys
import tempfile

import numpy as np
import scipy.sparse as sp


def export_instance(path, A, b, c):
    A = sp.csc_matrix(A)
    m, n = A.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<3q", m, n, A.nnz))
        f.write(np.asarray(A.indptr, "<i8").tobytes())
        f.write(np.asarray(A.indices, "<i8").tobytes())
        f.write(np.asarray(A.data, "<f8").tobytes())
        f.write(np.asarray(b, "<f8").tobytes())
        f.write(np.asarray(c, "<f8").tobytes())


def _mps_instances(mps_dir):
    """Presolved standard forms of every .mps file in a directory -- the
    round-2 Netlib comparison path."""
    import glob
    import os

    from abip_tpu.io.mps import read_mps
    from abip_tpu.io.presolve import presolve_to_standard

    for path in sorted(glob.glob(os.path.join(mps_dir, "*.mps"))):
        std = presolve_to_standard(read_mps(path))
        name = os.path.splitext(os.path.basename(path))[0]
        yield name, std.A.toarray(), std.b, std.c


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref-bin", required=True)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--count", type=int, default=5)
    ap.add_argument("--m", type=int, default=50)
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--mps", help="directory of .mps files instead of generated")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    import abip_tpu
    from benchmarks.generate import smoke_lp

    if args.mps:
        gen = _mps_instances(args.mps)
    else:
        gen = ((str(seed), *smoke_lp(m=args.m, n_rand=args.n - args.m,
                                     density=0.3, seed=seed))
               for seed in range(args.count))

    rows = []
    for seed, A, b, c in gen:
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            export_instance(f.name, A, b, c)
            path = f.name
        ref = json.loads(subprocess.run(
            [args.ref_bin, path, str(args.eps)],
            capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1])
        ours = abip_tpu.solve_lp(A, b, c, eps=args.eps)
        row = {
            "seed": seed,
            "ref_status": ref["status"], "our_status": ours.status_name,
            "ref_pobj": ref["pobj"], "our_pobj": ours.pobj,
            "pobj_rel_diff": abs(ref["pobj"] - ours.pobj) / (1 + abs(ref["pobj"])),
            "ref_admm": ref["admm"], "our_admm": ours.admm_iters,
            "admm_ratio": ours.admm_iters / max(1, ref["admm"]),
            "ref_ipm": ref["ipm"], "our_ipm": ours.ipm_iters,
        }
        rows.append(row)
        print(json.dumps(row))

    ratios = [r["admm_ratio"] for r in rows]
    diffs = [r["pobj_rel_diff"] for r in rows]
    print(f"# admm-iteration ratio (ours/ref): min {min(ratios):.2f} "
          f"median {sorted(ratios)[len(ratios)//2]:.2f} max {max(ratios):.2f}")
    print(f"# max pobj rel diff: {max(diffs):.2e}")
    return rows


if __name__ == "__main__":
    main()
