#!/bin/bash
# Round-4 on-chip re-measurement queue (VERDICT r3 item 1).
# Runs every round-3 perf claim serially on the real chip, logging to
# BENCH_QUEUE_r4/. One chip — never run two TPU jobs concurrently.
set -u
cd /root/repo
OUT=BENCH_QUEUE_r4
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$OUT/queue.log"
  timeout 2400 "$@" > "$OUT/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
}

run tpu_parity env MIA_TEST_BACKEND=tpu python -m pytest tests/test_tpu_parity.py -q
run mae_step python tools/bench_mae_step.py both
run serving_split python tools/bench_serving.py 8 3
run serving_reorder python tools/bench_serving.py 8 3 --reorder
run serving_greedy python tools/bench_serving.py 8 1
run backbones_arm python tools/bench_backbones.py arm both
run backbones_swin python tools/bench_backbones.py swin both
run backbones_vssm python tools/bench_backbones.py vssm both
run headline python bench.py
echo "QUEUE DONE $(date -u)" | tee -a "$OUT/queue.log"
