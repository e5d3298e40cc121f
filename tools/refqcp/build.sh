#!/bin/sh
# Build the stub-MKL reference ABIP-QCP parity driver (QDLDL backend).
# Output: $OUT/qcpref_q (Q-aware; also handles Q=NULL instances, so the
# same binary serves the conic-only tools) and a qcpref symlink for the
# tools that default to that name.  See reference_qcp_driver_notes.md.
set -e
R=${R:-/root/reference/src/abip-qcp}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-/tmp/qcpbench}
mkdir -p "$OUT"
gcc -O3 -march=native -DNDEBUG -o "$OUT/qcpref_q" \
    "$HERE/qcp_driver_q.c" "$HERE/pardiso_stub.c" \
    "$R"/source/*.c "$R"/qdldl/src/qdldl.c "$R"/amd/amd_*.c \
    "$R"/amd/SuiteSparse_config.c "$R"/csparse/Source/*.c \
    -I"$HERE/stubs" -I"$HERE" -I"$R/include" -I"$R/amd" \
    -I"$R/qdldl/include" -I"$R/csparse/Include" -lm
ln -sf "$OUT/qcpref_q" "$OUT/qcpref"
echo "built $OUT/qcpref_q (+qcpref symlink)"
