#!/bin/bash
# TPU tunnel recovery watcher (CLAUDE.md round-3/round-4 pattern).
# Probes the axon tunnel with a hard timeout; on first recovery runs
# bench.py on the real chip and records the JSON line.  Keeps probing
# and re-benching (up to MAX_BENCH runs) so the round ends with the
# freshest measurement available.
set -u
cd /root/repo
OUT=${1:-/tmp/bitmagic_bench_r05}
MAX_BENCH=${2:-3}
mkdir -p "$OUT"
n=0
while [ "$n" -lt "$MAX_BENCH" ]; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28
print('tunnel-up', jax.devices())
" >> "$OUT/probe.log" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel up; running bench #$n" >> "$OUT/probe.log"
    timeout 3000 python bench.py > "$OUT/bench_$n.json" 2> "$OUT/bench_$n.err"
    echo "$(date -u +%FT%TZ) bench #$n exit=$?" >> "$OUT/probe.log"
    n=$((n+1))
    sleep 600
  else
    echo "$(date -u +%FT%TZ) tunnel down" >> "$OUT/probe.log"
    sleep 180
  fi
done
