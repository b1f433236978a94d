#!/bin/bash
# Round-5 serialized TPU job queue: one client at a time on the tunnel
# (docs/ROADMAP.md tunnel-wedge notes).  Probes health between jobs and
# aborts the queue if the tunnel wedges, leaving partial results on disk.
# The deg_040 variant sweep is launched separately after reading these
# results (the A/B outcome decides its config/defaults).
set -u
cd /root/repo
LOG=/tmp/tpu_queue_r5.log
probe() {
  for i in $(seq 1 12); do
    timeout 400 python tools/tpu_health.py 300 >>"$LOG" 2>&1 && return 0
    echo "probe $i wedged; waiting 120s" >>"$LOG"
    sleep 120
  done
  return 1
}

echo "=== queue start $(date)" >>"$LOG"
probe || { echo "ABORT: tunnel wedged through all probes" >>"$LOG"; exit 3; }

echo "=== job 1: bench smoke DD_STEPS=5 (SMEM-refactor compile check)" >>"$LOG"
timeout 1200 env DD_STEPS=5 python bench.py >>"$LOG" 2>&1
echo "job1 exit $?" >>"$LOG"

probe || { echo "ABORT after job1" >>"$LOG"; exit 3; }
echo "=== job 2: full bench (default config, post-SMEM-streaming)" >>"$LOG"
timeout 1800 python bench.py >"/tmp/bench_r5_default.out" 2>&1
echo "job2 exit $?" >>"$LOG"
tail -3 /tmp/bench_r5_default.out >>"$LOG"

probe || { echo "ABORT after job2" >>"$LOG"; exit 3; }
echo "=== job 3: A/B DD_TILE_W=32 (sub=4 binning)" >>"$LOG"
timeout 1800 env DD_TILE_W=32 python bench.py >"/tmp/bench_r5_tw32.out" 2>&1
echo "job3 exit $?" >>"$LOG"
tail -3 /tmp/bench_r5_tw32.out >>"$LOG"

probe || { echo "ABORT after job3" >>"$LOG"; exit 3; }
echo "=== job 4: A/B DD_CROP_MARGIN=16 (at default tile_w 64)" >>"$LOG"
timeout 1800 env DD_CROP_MARGIN=16 python bench.py >"/tmp/bench_r5_m16.out" 2>&1
echo "job4 exit $?" >>"$LOG"
tail -3 /tmp/bench_r5_m16.out >>"$LOG"
echo "=== queue done $(date)" >>"$LOG"
