#!/bin/bash
# Round-4h record queue: post stage-barrier + culled-preselect-fix +
# ReGIR-packed-rows numbers. Strictly sequential, one TPU process at a
# time (never SIGTERM a TPU process — wedges axon).
cd /root/repo
LOG=/tmp/r4h_queue.log
echo "=== r4h queue start $(date +%H:%M:%S)" >> $LOG

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run python bench.py                      # PT + app record (barriers on)
run python bench.py sphere               # culled preselect fix
run python bench.py app-native           # native-res flagship
run python bench.py manylight            # post ReGIR packed rows
run python bench.py animated
run env TPU_PBRT_FORCE_TRACER=culled python bench.py animated
run python bench.py breakdown            # fresh PT profile (barriered)
run python bench.py breakdown manylight  # localize residual ReGIR cost
run python tools/golden_ssim.py 256 r4g app   # post-bake app-mode SSIM
echo "=== r4h queue done $(date +%H:%M:%S)" >> $LOG
