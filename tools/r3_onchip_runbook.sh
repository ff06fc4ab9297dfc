#!/bin/bash
# Round-3 on-chip measurement plan — run when the axon TPU tunnel is back.
# Each step is independently skippable; outputs land in /tmp/r3_onchip/.
#
# Context: the round-3 CPU-side work (fused freeze plans, folded S matvec,
# CSC-aligned loader order, bf16 'highest' fix) all await on-chip numbers:
# VERDICT r2 #2 (Venice-Final >= 0.5 it/s), #3 (Ladybug >= 220 it/s),
# #5 (bf16 throughput at <= 1.05x chi2).
set -x
mkdir -p /tmp/r3_onchip
cd "$(dirname "$0")/.."

# 0. hardware oracles (fast sanity that the chip computes correctly)
timeout 900 python tools/tpu_checks.py 2>&1 | tail -20 | tee /tmp/r3_onchip/checks.log

# 1. Ladybug headline (fused whole-PCG VMEM kernel active at dim_p=441)
timeout 1200 python bench.py ladybug 2>&1 | tee /tmp/r3_onchip/ladybug.log

# 2. bf16/fp16 on-chip confirm (throughput + final chi2)
timeout 1800 python tools/precision_sweep.py ladybug 20 2>&1 | tee /tmp/r3_onchip/precision.log

# 3. Venice-Final end-to-end + stage table + solve breakdown
timeout 3600 python bench.py venice-big 2>&1 | tee /tmp/r3_onchip/venice.log

# 4. dense-S matvec retry at dim_p=16002 (watch for worker crash — run LAST)
GRAPHITE_TPU_DENSE_SMV_LIMIT=16002 timeout 3600 python bench.py venice-big \
  2>&1 | tee /tmp/r3_onchip/venice_dense.log
