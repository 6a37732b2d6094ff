#!/bin/bash
# Round-5e: fresh-image cold-cache measurement queue. Order = verdict
# priority: (1) driver prewarm + headline (cornell + app rider), (2) the
# big-scene ask with the windowed gather path, (3) golden SSIM after the
# re-pose, (4) helmet-100k + animated. Timeouts sized for cold REMOTE
# compiles (the r5c queue lost 2x20 min to a 1200 s cap).
cd /root/repo
LOG=/tmp/r5e_queue.log
: > $LOG
echo "=== r5e queue start $(date +%H:%M:%S)" >> $LOG

run() {
  t=$1; shift
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  timeout "$t" "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run 2700 python bench.py
run 2700 python bench.py sphere
run 1800 python tools/golden_ssim.py 256 r5e app
run 1800 python bench.py helmet-100k
run 1500 python bench.py animated
run 1500 python bench.py helmet
run 1800 python tools/r5_u1_sweep.py
echo "=== r5e queue done $(date +%H:%M:%S)" >> $LOG
