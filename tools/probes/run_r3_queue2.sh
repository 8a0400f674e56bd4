#!/bin/bash
# Round-3 session-4 on-chip queue: probe 19 (bf16-conv e2e A/B), then the
# lost probes 13 (fused train step) and 16 (KITTI VoxelRCNN-3DDF e2e).
set -u
cd /root/repo
LOCK=/tmp/relay_queue.running
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/r3_queue2.log
  timeout "$tmo" "$@" > "/tmp/${name}.log" 2>&1
  echo "--- $name exit=$? ---" | tee -a /tmp/r3_queue2.log
}
run r3_probe19 2400 python tools/probes/r3_probe19.py
run r3_probe13 2400 python tools/probes/r3_probe13.py
run r3_probe16 2400 python tools/probes/r3_probe16.py
echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a /tmp/r3_queue2.log
