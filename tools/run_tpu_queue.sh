#!/bin/bash
# The queued TPU work from late round 3, runnable the moment the tunnel
# returns (see memory round3-late-state / CLAUDE.md "TPU tunnel outages").
# Everything is bounded and logs to tpu_queue_logs/; safe to re-run.
#
#   1. full bench.py refresh (headline + serving + train JSON lines)
#   2. xla_flags_ab --workload train compiler-knob sweep (the prepared
#      attack on the conv-backward gap, PERF.md round-3 train audit)
#   3. artifact-on-TPU check (cpu-vs-tpu parity of a frozen .pwrsrv)
#
# Usage: bash tools/run_tpu_queue.sh   (from the repo root)
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_queue_logs
TS=$(date +%Y%m%d_%H%M%S)

echo "== probe tunnel =="
if ! timeout 180 python -c "import jax; assert jax.devices()[0].platform=='tpu'"; then
  echo "tunnel down; aborting queue run"; exit 2
fi

echo "== 1/5 bench refresh =="
timeout 2400 python bench.py 2>&1 | tee "tpu_queue_logs/bench_$TS.log"

echo "== 2/5 train-step XLA flag sweep =="
timeout 5400 python tools/xla_flags_ab.py --workload train \
  --variant base= \
  --variant vmem64="--xla_tpu_scoped_vmem_limit_kib=65536" \
  --variant vmem128="--xla_tpu_scoped_vmem_limit_kib=131072" \
  --rounds 3 2>&1 | tee "tpu_queue_logs/xla_flags_train_$TS.log"

echo "== 3/5 artifact-on-TPU check =="
timeout 1800 python tools/artifact_tpu_check.py 2>&1 \
  | tee "tpu_queue_logs/artifact_check_$TS.log"

echo "== 4/5 stage-2 serving measurement (int8+batchnorm, never measured) =="
timeout 2400 python bench.py --stages 2 --no_train 2>&1 \
  | tee "tpu_queue_logs/bench_stage2_$TS.log"

echo "== 5/5 stage-2 inference XLA flag sweep (flagship 6.17k vs 7.1k floor) =="
timeout 3600 python tools/xla_flags_ab.py --workload infer --stages 2 \
  --variant base= \
  --variant vmem64="--xla_tpu_scoped_vmem_limit_kib=65536" \
  --variant vmem128="--xla_tpu_scoped_vmem_limit_kib=131072" \
  --variant lhs_off="--xla_tpu_enable_latency_hiding_scheduler=false" \
  --rounds 3 2>&1 | tee "tpu_queue_logs/xla_flags_infer_$TS.log"

echo "== queue done; logs in tpu_queue_logs/ =="
