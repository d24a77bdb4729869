#!/bin/bash
# Round-5 on-chip measurement queue (VERDICT r4 items 1, 3, 5).
# Every perf number cited in BENCH.md for round 5 must come from a log
# in BENCH_QUEUE_r5/ produced by this runner. One chip — never run two
# TPU jobs concurrently.
set -u
cd /root/repo
OUT=BENCH_QUEUE_r5
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$OUT/queue.log"
  timeout 3600 "$@" > "$OUT/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
}

# kernel numerics on the real compiler (incl. the new scan_n1 test)
run r5_tpu_parity env MIA_TEST_BACKEND=tpu python -m pytest tests/test_tpu_parity.py -q

# VERDICT item 1: VSSM training-throughput attack artifacts
run vssm_profile_retuned python tools/profile_vssm_step.py 64
run glue_sol python tools/glue_sol.py 64
run vssm1_tiny_b128 python tools/bench_vssm1.py 128 vssm1_tiny

# VERDICT item 5: re-measure round-4 claims that lacked log artifacts
run mae_step_ab python tools/bench_mae_step.py 384
run headline python bench.py

# VERDICT item 2: packed-ingestion end-to-end (decode-free input path)
run e2e_packed python tools/bench_e2e.py 8 256 --packed
run e2e_jpeg python tools/bench_e2e.py 4 256

# VERDICT item 3: compositional-holdout convergence, three recipes
run convergence_r2gengpt python tools/convergence_demo.py 12 512 16 r2gengpt
run convergence_am_mrg python tools/convergence_demo.py 10 512 16 am_mrg
run convergence_r2gen_kg python tools/convergence_demo.py 10 512 16 r2gen_kg

echo "QUEUE DONE $(date -u)" | tee -a "$OUT/queue.log"
