#!/bin/bash
# Round-3 on-chip measurement queue, priority-ordered so a flapping
# tunnel still yields the decisive numbers first. Each step logs to
# artifacts/round3/ and is independently re-runnable.
cd /root/repo
mkdir -p artifacts/round3
set -x

# 1. The decisive experiment: flat-2D vs 3-D BERT residual stream @T=96
timeout 900 python artifacts/bench_bert_flat.py \
  2>&1 | tee artifacts/round3/bert_flat_t96.log

# 2. End-to-end official bench (flat stream now default)
timeout 1500 python bench.py 2>&1 | tee artifacts/round3/bench_flat.log

# 3. Flat vs 3-D at T=128 (regression check for the max-length bucket)
BENCH_T=128 timeout 900 python artifacts/bench_bert_flat.py \
  2>&1 | tee artifacts/round3/bert_flat_t128.log

# 4. Compiled-Pallas numerics on the real chip
MRD_TPU_TESTS=1 timeout 1800 python -m pytest tests/ -m tpu -q \
  2>&1 | tee artifacts/round3/tpu_kernel_smoke.log

# 5. Full-size from-scratch text-cliff experiment (warmup + pre-LN)
timeout 5400 python artifacts/exp_text_cliff.py 30 \
  2>&1 | tee artifacts/round3/text_cliff.log
