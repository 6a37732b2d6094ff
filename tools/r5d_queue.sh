#!/bin/bash
# Round-5d: U1 re-sweep under the head-gather cascade (the pass-1 MT
# sweep is linear in U1; the gather cascade changed the overflow cost
# model) + fresh app-graph golden SSIM after the mask-IoU re-pose.
cd /root/repo
LOG=/tmp/r5d_queue.log
: > $LOG
echo "=== r5d queue start $(date +%H:%M:%S)" >> $LOG

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  timeout 1800 "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run python tools/r5_u1_sweep.py
run python tools/golden_ssim.py 256 r5d app
run python tools/golden_ssim.py map /tmp/r5d_app_ours.png
run python bench.py breakdown app
run python bench.py breakdown sphere
echo "=== r5d queue done $(date +%H:%M:%S)" >> $LOG
