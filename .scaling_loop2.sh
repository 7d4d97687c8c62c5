#!/bin/bash
# Round-4 scaling sample accumulation, v2: interleave pure-CPU host-ceiling
# probes (tools/probe_sample.py -> SCALING_PROBES.jsonl) with the engine
# legs so tools/scaling_windows.py can normalize each paired same-window
# efficiency by the ceiling measured in (almost) the same window.
cd /root/repo
for i in $(seq 1 60); do
  echo "=== v2 iter $i probe $(date +%T) ===" >> .scaling_loop.log
  python tools/probe_sample.py 4 8 16 32 >> .scaling_loop.log 2>&1 || true
  echo "=== v2 iter $i sf0.1 $(date +%T) ===" >> .scaling_loop.log
  # Alternate iterations also sample the 2-core leg so the primary 2->8
  # pair gets paired same-window evidence (it currently only has minima).
  if [ $((i % 2)) -eq 0 ]; then CORES=2,4,8,16,32; else CORES=4,16,8,32; fi
  SCALING_CORES=$CORES SCALING_ROUNDS=1 python tools/scaling_bench.py >> .scaling_loop.log 2>&1 || echo "bench leg failed" >> .scaling_loop.log
  echo "=== v2 iter $i probe2 $(date +%T) ===" >> .scaling_loop.log
  python tools/probe_sample.py 8 32 >> .scaling_loop.log 2>&1 || true
  echo "=== v2 iter $i big $(date +%T) ===" >> .scaling_loop.log
  python tools/scaling_big.py 1 >> .scaling_loop.log 2>&1 || echo "big leg failed" >> .scaling_loop.log
done
