#!/bin/bash
# Round-3 on-chip measurement queue. Run when the axon relay is up.
# Serializes every python job (one CPU core, one chip); each gets its own
# timeout and log under /tmp so a relay flake mid-queue loses nothing.
set -u
cd /root/repo
LOCK=/tmp/relay_queue.running
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT

# single CPU core: wait for any running pytest (pid file) to finish first
if [ -f /tmp/pytest.pid ]; then
  while kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/r3_queue.log
  timeout "$tmo" "$@" > "/tmp/${name}.log" 2>&1
  echo "--- $name exit=$? ---" | tee -a /tmp/r3_queue.log
}

run r3_probe14 2400 python tools/probes/r3_probe14.py
run r3_probe15 2400 python tools/probes/r3_probe15.py
run r3_probe17 2400 python tools/probes/r3_probe17.py
run fit_caps_onchip 3000 python tools/fit_caps.py \
  --preset centerpoint_nusc --synthetic --frames 12
run r3_probe13 2400 python tools/probes/r3_probe13.py
run r3_probe16 2400 python tools/probes/r3_probe16.py
run bench_r3b  3600 python bench.py
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/r3_queue.log
