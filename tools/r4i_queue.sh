#!/bin/bash
# Round-4i: fetch-path matrix under the new stage barriers (fetch is
# still 43.9% of the PT frame), the records lost to device wedges
# (PT headline, manylight), and the culled rank A/B.
cd /root/repo
LOG=/tmp/r4i_queue.log
echo "=== r4i queue start $(date +%H:%M:%S)" >> $LOG

for i in $(seq 1 90); do
  pgrep -f r4h_queue.sh >/dev/null 2>&1 || break
  sleep 60
done

run() {
  echo "--- $* @ $(date +%H:%M:%S)" >> $LOG
  "$@" >> $LOG 2>&1
  echo "--- rc=$? @ $(date +%H:%M:%S)" >> $LOG
}

# fetch-path matrix (ptframe, ~4 min each): FUSED kernel vs plain Pallas
# row fetch vs pure-XLA one-hot dot, and the extra shade barriers
run python tools/r4g_ptframe.py                                   # control (FUSED=1)
run env TPU_PBRT_FETCH_FUSED=0 python tools/r4g_ptframe.py        # row kernel only
run env TPU_PBRT_FETCH_FUSED=0 TPU_PBRT_FETCH_PALLAS=0 python tools/r4g_ptframe.py  # pure XLA
run env TPU_PBRT_STAGE_BARRIERS_SHADE=1 python tools/r4g_ptframe.py
run python tools/r4h_culled_rank.py
run python bench.py manylight
run python bench.py
echo "=== r4i queue done $(date +%H:%M:%S)" >> $LOG
