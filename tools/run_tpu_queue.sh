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
# Usage: bash tools/run_tpu_queue.sh [START_STEP]   (from the repo root)
#
# xla_tpu_* knobs go through per-jit compiler_options (copt: variants) —
# the axon client's XLA_FLAGS parser aborts on them (tools/xla_flags_ab.py
# docstring has the measured evidence).
set -u
cd "$(dirname "$0")/.."
mkdir -p tpu_queue_logs
TS=$(date +%Y%m%d_%H%M%S)
START=${1:-1}

echo "== probe tunnel =="
if ! timeout 180 python -c "import jax; assert jax.devices()[0].platform=='tpu'"; then
  echo "tunnel down; aborting queue run"; exit 2
fi

if [ "$START" -le 1 ]; then
echo "== 1/6 bench refresh =="
timeout 2400 python bench.py 2>&1 | tee "tpu_queue_logs/bench_$TS.log"
fi

if [ "$START" -le 2 ]; then
echo "== 2/6 train-step compiler-knob sweep =="
timeout 9000 python tools/xla_flags_ab.py --workload train \
  --variant base= \
  --variant vmem64="copt:xla_tpu_scoped_vmem_limit_kib=65536" \
  --variant vmem128="copt:xla_tpu_scoped_vmem_limit_kib=131072" \
  --variant lhs_off="copt:xla_tpu_enable_latency_hiding_scheduler=false" \
  --rounds 3 2>&1 | tee "tpu_queue_logs/xla_flags_train_$TS.log"
fi

if [ "$START" -le 3 ]; then
echo "== 3/6 artifact-on-TPU check =="
timeout 1800 python tools/artifact_tpu_check.py 2>&1 \
  | tee "tpu_queue_logs/artifact_check_$TS.log"
fi

if [ "$START" -le 4 ]; then
echo "== 4/6 stage-2 serving measurement (int8+batchnorm, never measured) =="
timeout 2400 python bench.py --stages 2 --no_train 2>&1 \
  | tee "tpu_queue_logs/bench_stage2_$TS.log"
fi

if [ "$START" -le 5 ]; then
echo "== 5/6 stage-2 inference compiler-knob sweep (flagship 6.17k vs 7.1k floor) =="
timeout 7200 python tools/xla_flags_ab.py --workload infer --stages 2 \
  --variant base= \
  --variant vmem64="copt:xla_tpu_scoped_vmem_limit_kib=65536" \
  --variant vmem128="copt:xla_tpu_scoped_vmem_limit_kib=131072" \
  --variant lhs_off="copt:xla_tpu_enable_latency_hiding_scheduler=false" \
  --rounds 3 2>&1 | tee "tpu_queue_logs/xla_flags_infer_$TS.log"
fi

if [ "$START" -le 6 ]; then
echo "== 6/6 HTTP serving throughput on TPU (artifact + dynamic batching) =="
# artifact written by step 3's export (or re-export here); serve on TPU,
# drive with the load generator, record /metrics. Kill by PID only.
ART=/tmp/msra_queue.pwrsrv
timeout 900 python tools/export_model.py \
  --ckpt Model/MSRA_default_subject0_final.ckpt --dataset MSRA \
  --output "$ART" --batch_size 32 2>&1 | tail -2
timeout 1800 python -m pixelwiseregression_tpu.serve_http --artifact "$ART" \
  --host 127.0.0.1 --port 8147 > "tpu_queue_logs/serve_tpu_$TS.log" 2>&1 &
echo $! > /tmp/serve_queue.pid
for _ in $(seq 60); do
  curl -s -m 5 http://127.0.0.1:8147/healthz | grep -q '"ok"' && break
  sleep 5
done
timeout 600 python tools/bench_http.py --url http://127.0.0.1:8147 \
  --threads 16 --requests 64 --size 1 2>&1 \
  | tee "tpu_queue_logs/bench_http_tpu_$TS.log"
kill "$(cat /tmp/serve_queue.pid)" 2>/dev/null
fi

echo "== queue done; logs in tpu_queue_logs/ =="
