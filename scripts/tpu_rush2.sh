#!/bin/bash
# Round-4 measurement rush, phase 2: runs after tpu_rush.sh finishes (pass
# its PID as $1).  Closes the remaining VERDICT r3 measurement items:
#   * body-alone powerlaw_1m (the "4-5x over body-alone" claim, weak #3);
#   * the VPU packed-gather probe (next #6);
#   * scaling/multihost table refresh on the virtual mesh (next #10).
# Each step logs to $LOGDIR/<step>.log; one line per step in $SUMMARY.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
LOGDIR=/tmp/tpu_rush2
SUMMARY=$LOGDIR/SUMMARY.log
mkdir -p "$LOGDIR"

note() { echo "[$(date +%H:%M:%S)] $*" >> "$SUMMARY"; }

if [ $# -ge 1 ]; then
  note "waiting for rush phase 1 (pid $1)"
  while kill -0 "$1" 2>/dev/null; do sleep 120; done
  note "phase 1 done"
fi

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  note "START $name"
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    note "OK    $name: $(grep -E 'BENCH_RESULT|GFLOP|VERDICT|cyc' "$LOGDIR/$name.log" | tail -2 | tr '\n' ' | ')"
  else
    note "FAIL  $name (exit $?, see $LOGDIR/$name.log)"
  fi
}

step body_powerlaw   4800 env EHYB_BENCH_DELEGATE=never \
                          python bench.py --run ehyb powerlaw_1m 50
step probe_gather2   4800 python scripts/probe_gather2.py
step scaling         3600 python scripts/scaling.py
step multihost       2400 python scripts/multihost.py

note "RUSH2 COMPLETE"
