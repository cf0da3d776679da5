#!/bin/bash
# Interleaved load-gated A/B: working tree vs stashed HEAD, cold probes.
# Usage: ./ab_cold.sh ROUNDS key1 key2 ...
set -e
ROUNDS=$1; shift
gate() {
  while :; do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 1.0 else 0)")
    [ "$ok" = 1 ] && break
    sleep 15
  done
}
for r in $(seq "$ROUNDS"); do
  gate
  echo "== round $r: WORK"
  python probe_cold.py "$@" 2>/dev/null
  git stash -q
  gate
  echo "== round $r: HEAD"
  python probe_cold.py "$@" 2>/dev/null
  git stash pop -q
done
