#!/bin/bash
# Round-4g measurement queue: first numbers for the fused bounce
# megakernel (ops/trace_shade_fused.py) + the culled preselect fix.
# Strictly sequential, one TPU process at a time; waits for the r4f
# queue to release the chip (never SIGTERM a TPU process — wedges axon).
cd /root/repo
LOG=/tmp/r4g_queue.log
echo "=== r4g queue start $(date +%H:%M:%S)" >> $LOG

# wait (up to 1.5h) for the r4f queue to finish
for i in $(seq 1 90); do
  pgrep -f r4f_queue.sh >/dev/null 2>&1 || break
  sleep 60
done

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run python bench.py                      # PT headline: megakernel first run
run env TPU_PBRT_TRACE_FUSED=0 python bench.py   # A/B control
run python bench.py breakdown            # new PT profile
run python bench.py sphere               # culled preselect fix
run python bench.py app-native           # native-res flagship (re-run)
run python bench.py animated
run env TPU_PBRT_FORCE_TRACER=culled python bench.py animated
run python bench.py manylight
run python bench.py breakdown manylight  # localize the residual ReGIR cost
run python tools/golden_ssim.py 256 r4g app   # post-bake app-mode SSIM
echo "=== r4g queue done $(date +%H:%M:%S)" >> $LOG
