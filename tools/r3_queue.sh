#!/bin/bash
# Round-3 post-recovery measurement queue. Strictly sequential, one TPU
# process at a time, each process bounds its own work and exits cleanly
# (never SIGTERM a TPU process — it wedges the axon device).
cd /root/repo
LOG=/tmp/r3_queue.log
echo "=== queue start $(date +%H:%M:%S)" >> $LOG

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run python bench.py sphere
run python bench.py sphere-textured
run python bench.py helmet
run python bench.py helmet-textured
run python bench.py app
run python bench.py
run python bench.py animated
run python bench.py manylight
run python tools/golden_ssim.py 512 g3 app
run python tools/diag_fetch.py
run env TPU_PBRT_FETCH_PALLAS=1 python bench.py
run env TPU_PBRT_FETCH_PALLAS=1 python bench.py app
run python bench.py breakdown
run python bench.py breakdown sphere
run python bench.py breakdown manylight
run python bench.py breakdown animated
run python tools/g3_app_sweep.py 192
echo "=== queue done $(date +%H:%M:%S)" >> $LOG
run python tools/diag_block32.py
