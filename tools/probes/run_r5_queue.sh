#!/bin/bash
# Round-5 on-chip queue: plan-build decomposition probe, then a full
# bench.py (primes .jax_cache for the driver run and captures the r5
# effect of the center-identity subm plans).
set -u
cd /root/repo
LOCK=/tmp/relay_queue.running
touch "$LOCK"
trap 'rm -f "$LOCK"' EXIT
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/r5_queue.log
  timeout "$tmo" "$@" > "/tmp/${name}.log" 2>&1
  echo "--- $name exit=$? ---" | tee -a /tmp/r5_queue.log
}
run r5_probe1 4800 python tools/probes/r5_probe1.py
run r5_bench 2400 env DF3D_BENCH_BUDGET_S=2100 python bench.py
echo "QUEUE5 DONE $(date +%H:%M:%S)" | tee -a /tmp/r5_queue.log
