#!/bin/bash
# Round-4f measurement queue: draw_cdf effect (manylight/app/PT), SHARC
# resolve A/B, culled-tracer structure A/B, then the winner benches.
# Strictly sequential, one TPU process at a time; waits for any existing
# TPU user to exit first (never SIGTERM a TPU process — wedges axon).
cd /root/repo
LOG=/tmp/r4f_queue.log
echo "=== r4f queue start $(date +%H:%M:%S)" >> $LOG

# wait (up to 2.5h) for the g3 sweep to release the chip
for i in $(seq 1 150); do
  pgrep -f g3_app_sweep >/dev/null 2>&1 || break
  sleep 60
done

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run python bench.py manylight
run python bench.py app
run env TPU_PBRT_SHARC_RESOLVE=sorted BENCH_SHARC_LOG2=20 BENCH_REGIR=0 python bench.py app
run env BENCH_SHARC_LOG2=20 BENCH_REGIR=0 python bench.py app
run python tools/r4f_culled_ab.py
run python bench.py
run python bench.py app-native
run python bench.py animated
echo "=== r4f queue done $(date +%H:%M:%S)" >> $LOG
