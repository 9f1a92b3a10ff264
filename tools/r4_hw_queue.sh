#!/bin/bash
# One-shot hardware measurement batch for the round-4 in-flight kernels.
# Run when the axon tunnel is reachable; each stage appends to the log so a
# mid-run tunnel drop loses at most one stage.
set -x
LOG=${1:-/tmp/r4_hw_queue.log}
cd /root/repo

echo "== stage 1: hardware parity for the new kernels ==" >> "$LOG"
DIVERGEN_TEST_TPU=1 timeout 3000 python -m pytest tests/tpu/test_kernels_tpu.py \
  -k "ln_matmul or packed_hardware or relpos" -q >> "$LOG" 2>&1

echo "== stage 2: ln_gemm end-to-end A/B (baseline b4=419.09) ==" >> "$LOG"
timeout 3000 python tools/r2_perf_sweep.py --only ln_gemm_geglu >> "$LOG" 2>&1
timeout 3000 python tools/r2_perf_sweep.py --only ln_gemm >> "$LOG" 2>&1

echo "== stage 3: swin packed window attention step ==" >> "$LOG"
timeout 3000 python tools/r2_perf_sweep.py --only swin_fused >> "$LOG" 2>&1

echo "== stage 4: SAM ln_gemm / rel-pos flash A/B ==" >> "$LOG"
timeout 3000 python tools/r2_perf_sweep.py --only sam >> "$LOG" 2>&1
timeout 3000 python tools/r2_perf_sweep.py --only sam_ln_gemm >> "$LOG" 2>&1
timeout 3000 python tools/r2_perf_sweep.py --only sam_flash >> "$LOG" 2>&1
timeout 3000 python tools/r2_perf_sweep.py --only sam_full >> "$LOG" 2>&1

echo "== stage 5: GN dot-stats A/B ==" >> "$LOG"
timeout 3000 python tools/r2_perf_sweep.py --only gn_dot >> "$LOG" 2>&1

echo "== done ==" >> "$LOG"
