#!/bin/bash
# Follow-up TPU queue (round 3, second healthy-chip window) — runs after
# tools/run_tpu_queue.sh finishes. Everything bounded, logs to
# tpu_queue_logs/, safe to re-run: bash tools/run_tpu_queue2.sh [START_STEP]
#
#   1. artifact-on-TPU check rerun (the forced-platform bug is fixed:
#      the tpu child now rides the default backend)
#   2. train lhs_off confirmation: the first sweep showed a possible ~2%
#      from xla_tpu_enable_latency_hiding_scheduler=false (min 94.69 vs
#      96.33 ms) — 6 interleaved rounds decide signal vs noise
#   3. stage-1 inference knob sweep (the headline config, never swept)
#   4. stage-1 inference batch scaling (arg: variants): 128 vs 256 vs 512
#   5. train batch scaling: 128 vs 256 (compare f/s, not ms)
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_queue_logs
TS=$(date +%Y%m%d_%H%M%S)
START=${1:-1}

echo "== probe tunnel =="
if ! timeout 180 python -c "import jax; assert jax.devices()[0].platform=='tpu'"; then
  echo "tunnel down; aborting queue2 run"; exit 2
fi

if [ "$START" -le 1 ]; then
echo "== 1/5 artifact-on-TPU check (fixed tpu child) =="
timeout 1800 python tools/artifact_tpu_check.py 2>&1 \
  | tee "tpu_queue_logs/artifact_check2_$TS.log"
fi

if [ "$START" -le 2 ]; then
echo "== 2/5 train lhs_off confirmation (6 rounds) =="
timeout 9000 python tools/xla_flags_ab.py --workload train \
  --variant base= \
  --variant lhs_off="copt:xla_tpu_enable_latency_hiding_scheduler=false" \
  --rounds 6 2>&1 | tee "tpu_queue_logs/xla_flags_train_lhs_$TS.log"
fi

if [ "$START" -le 3 ]; then
echo "== 3/5 stage-1 inference knob sweep =="
timeout 7200 python tools/xla_flags_ab.py --workload infer --stages 1 \
  --variant base= \
  --variant vmem64="copt:xla_tpu_scoped_vmem_limit_kib=65536" \
  --variant lhs_off="copt:xla_tpu_enable_latency_hiding_scheduler=false" \
  --rounds 3 2>&1 | tee "tpu_queue_logs/xla_flags_infer_s1_$TS.log"
fi

if [ "$START" -le 4 ]; then
echo "== 4/5 stage-1 inference batch scaling =="
timeout 7200 python tools/xla_flags_ab.py --workload infer --stages 1 \
  --variant b128= \
  --variant b256="arg:batch=256" \
  --variant b512="arg:batch=512" \
  --rounds 2 2>&1 | tee "tpu_queue_logs/infer_s1_batch_$TS.log"
fi

if [ "$START" -le 5 ]; then
echo "== 5/5 train batch scaling 128 vs 256 =="
timeout 7200 python tools/xla_flags_ab.py --workload train \
  --variant b128= \
  --variant b256="arg:batch=256" \
  --rounds 2 2>&1 | tee "tpu_queue_logs/train_batch_$TS.log"
fi

echo "== queue2 done; logs in tpu_queue_logs/ =="
