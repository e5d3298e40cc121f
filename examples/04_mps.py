"""Solve an MPS file end-to-end (general form -> standard form -> solve)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import sys

from abip_tpu.io.presolve import solve_mps

path = sys.argv[1] if len(sys.argv) > 1 else None
if path is None:
    raise SystemExit("usage: python examples/04_mps.py problem.mps")
sol, std = solve_mps(path, eps=1e-6)
print(f"{sol.status_name}: objective {sol.pobj:.8f} "
      f"({sol.ipm_iters} IPM / {sol.admm_iters} ADMM iterations)")
