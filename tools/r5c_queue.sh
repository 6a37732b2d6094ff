#!/bin/bash
# Round-5c: measure the unmeasured culled-path work (head-gather cascade,
# query gather, chunk barriers) on the big-scene configs, plus the
# animated + helmet-100k rows the verdict asks for.
cd /root/repo
LOG=/tmp/r5c_queue.log
: > $LOG
echo "=== r5c queue start $(date +%H:%M:%S)" >> $LOG

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  timeout 1200 "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

run python bench.py sphere                                     # defaults (gather paths ON)
run env TPU_PBRT_CASCADE_GATHER=0 TPU_PBRT_QUERY_GATHER=0 python bench.py sphere  # pre-r5c control
run env TPU_PBRT_CULLED_BARRIERS=1 python bench.py sphere      # staged barrier A/B
run python bench.py helmet
run python bench.py helmet-100k
run python bench.py animated
echo "=== r5c queue done $(date +%H:%M:%S)" >> $LOG
