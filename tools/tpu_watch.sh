#!/bin/bash
# TPU tunnel recovery watcher (CLAUDE.md round-3/round-4 pattern).
# Probes the axon tunnel with a hard timeout; on recovery runs bench.py on
# the real chip and records the JSON line.  Keeps probing and re-benching
# (up to MAX_BENCH runs) so the round ends with the freshest measurement.
#
# If SOAK_PID names a live process (the long fuzz soak), it is SIGSTOPped
# for the duration of each bench run and SIGCONTed after: the host codec
# configs (5_*) are CPU-bound and the soak competes for the single core.
set -u
cd /root/repo
OUT=${1:-/tmp/bitmagic_bench_r05}
MAX_BENCH=${2:-3}
SOAK_PID=${SOAK_PID:-}
mkdir -p "$OUT"
n=$(ls "$OUT"/bench_*.json 2>/dev/null | wc -l)
while [ "$n" -lt "$MAX_BENCH" ]; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28
print('tunnel-up', jax.devices())
" >> "$OUT/probe.log" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel up; running bench #$n" >> "$OUT/probe.log"
    if [ -n "$SOAK_PID" ] && kill -0 "$SOAK_PID" 2>/dev/null; then
      kill -STOP "$SOAK_PID" 2>/dev/null
    fi
    timeout 3000 python bench.py > "$OUT/bench_$n.json" 2> "$OUT/bench_$n.err"
    echo "$(date -u +%FT%TZ) bench #$n exit=$?" >> "$OUT/probe.log"
    if [ -n "$SOAK_PID" ] && kill -0 "$SOAK_PID" 2>/dev/null; then
      kill -CONT "$SOAK_PID" 2>/dev/null
    fi
    n=$((n+1))
    sleep 600
  else
    echo "$(date -u +%FT%TZ) tunnel down" >> "$OUT/probe.log"
    sleep 180
  fi
done
