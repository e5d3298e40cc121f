#!/bin/bash
# Reproduce every committed benchmark artifact under benchmarks/results/.
#
# Prereqs:
#  * reference binaries (outside the repo; they link reference sources):
#      /tmp/refbench/refparity   -- tools/reference_baseline_driver.c,
#                                   -DPARITY_MAIN (see file header)
#      /tmp/qcpbench/qcpref      -- tools/reference_qcp_driver_notes.md
#      /tmp/qcpbench/qcpref_q    -- same notes, Q-aware build
#  * suites generated once:
#      python -m benchmarks.netlib_mini   && python -m benchmarks.conic_mini
#      python -m benchmarks.cblib_mini    (all committed already)
#
# Sections are independent; comment out what you don't need.  Total
# runtime on the 4-core CPU host: ~45-60 min.
set -euo pipefail
cd "$(dirname "$0")/.."
R=benchmarks/results

# ---- LP throughput ----------------------------------------------------
ABIP_BENCH_CPU=1 python bench.py                 # headline JSON line
python tools/lp_scale_bench.py --m 500 --n 5000 --count 4 \
    -o $R/r02_lp_throughput_m500.json

# ---- conic / QP throughput vs the reference binary ---------------------
python tools/conic_bench.py --n 16 -o $R/r02_conic_throughput.json
python tools/conic_bench.py --n 8 --scale 5 --no-batched \
    -o $R/r02_conic_throughput_dim1020.json
python tools/conic_bench.py --n 4 --scale 10 --no-batched \
    -o $R/r02_conic_throughput_dim2040.json
python tools/conic_bench.py --ref-bin /tmp/qcpbench/qcpref_q --qp \
    --n 8 --scale 3 --no-batched -o $R/r02_qp_throughput_dim612.json
python tools/conic_bench.py --ref-bin /tmp/qcpbench/qcpref_q --qp \
    --n 4 --scale 6 --no-batched --repeats 2 \
    -o $R/r02_qp_throughput_dim1224.json

# ---- suites (host + device routes + competitor columns) ----------------
python -m benchmarks.run_suite --mps benchmarks/suites/netlib_mini \
    --cpu -o $R/r02_netlib_mini
python -m benchmarks.run_suite --mps benchmarks/suites/netlib_mini \
    --cpu --method device -o $R/r02_netlib_mini_device
python -m benchmarks.run_suite --mps benchmarks/suites/netlib_mini \
    --cpu --method highs -o $R/r02_netlib_mini_highs
python -m benchmarks.run_suite --mps benchmarks/suites/netlib_mini \
    --cpu --method pdhg -o $R/r02_netlib_mini_pdhg
python -m benchmarks.run_suite --sedumi benchmarks/suites/conic_mini \
    --cpu -o $R/r02_conic_mini
python -m benchmarks.run_suite --cbf benchmarks/suites/cblib_mini \
    --cpu -o $R/r02_cblib_mini
python -m benchmarks.run_suite --cbf benchmarks/suites/cblib_mini \
    --cpu --method pdhg -o $R/r02_cblib_mini_pdhg
python -m benchmarks.run_suite --generated pagerank@1000000:1 --cpu \
    -o $R/r02_pagerank

# ---- parity (identical instances, reference binaries) ------------------
python tools/parity_run.py --ref-bin /tmp/refbench/refparity \
    --classes --count 20 --eps 1e-6 --cpu > $R/r02_parity_classes_1e6.jsonl
python tools/parity_run.py --ref-bin /tmp/refbench/refparity \
    --classes --count 10 --eps 1e-8 --cpu > $R/r02_parity_classes_1e8.jsonl
python tools/parity_qcp.py --ref-bin /tmp/qcpbench/qcpref --eps 1e-4 --cpu
python tools/parity_qcp.py --ref-bin /tmp/qcpbench/qcpref_q --qp \
    --count 5 --eps 1e-4 --cpu > $R/r02_parity_qp.jsonl

# ---- fuzz (randomized KKT/oracle contracts) -----------------------------
python tools/fuzz_scipy.py --per-class 34 -o $R/r02_scipy_fuzz.jsonl
python tools/fuzz_conic.py --per-class 8 --eps 1e-6 \
    -o $R/r02_conic_fuzz_qp.jsonl
python tools/fuzz_conic.py --per-class 6 --eps 1e-6 --batched \
    -o $R/r02_conic_fuzz_qp_batched.jsonl
python tools/fuzz_conic.py --per-class 12 --eps 1e-6 --method pdhg \
    -o $R/r02_conic_fuzz_pdhg.jsonl

# ---- ML sweeps + scaling ------------------------------------------------
python -m benchmarks.ml_sweep --kind lasso --scale 0.1 --cpu \
    -o $R/r02_ml_lasso
python -m benchmarks.ml_sweep --kind lasso --method pdhg --scale 0.1 \
    --cpu -o $R/r02_ml_lasso_pdhg
python -m benchmarks.ml_sweep --kind svm --scale 0.1 --cpu -o $R/r02_ml_svm
python -m benchmarks.scaling_bench --per-device 2 --devices 1 2 4 8 \
    --cpu > $R/r02_weak_scaling_virtual.txt  # JSON rows on stdout

echo "all artifacts reproduced under $R"
