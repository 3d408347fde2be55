#!/bin/bash
# Round-4 session-2 measurement chain (final order: highest evidence value
# per TPU-minute first).  Waits for the running sweep (PID $1).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
LOGDIR=/tmp/r4/rush3
SUMMARY=$LOGDIR/SUMMARY.log
mkdir -p "$LOGDIR"

note() { echo "[$(date +%H:%M:%S)] $*" >> "$SUMMARY"; }

if [ $# -ge 1 ]; then
  note "waiting for sweep (pid $1)"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  note "sweep done"
fi

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  note "START $name"
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    note "OK    $name: $(grep -E 'BENCH_RESULT|GFLOP|VERDICT|RESULT|cyc' "$LOGDIR/$name.log" | tail -2 | tr '\n' ' | ')"
  else
    note "FAIL  $name (exit $?, see $LOGDIR/$name.log)"
  fi
}

# VPU packed-gather probe (VERDICT r3 next #6)
step probe_gather2   3600 python scripts/probe_gather2.py
# pp1024 with the fixed futility gate (partition ordering restored)
step pp1024_fixed    2400 python bench.py --run ehyb permuted_poisson_1024 100
# f64 contract cost ratio on hardware (VERDICT r3 next #8)
step dword_pp512     2400 env EHYB_BENCH_DWORD=1 \
                          python bench.py --run ehyb permuted_poisson_512 100
# stage-B block-cap A/B: cap c back to 6 (the v7 geometry) on random_1m
step routed_1m_c6    3000 env EHYB_ROUTE_BANDS_MAX=6 \
                          python bench.py --run ehyb_routed random_1m 100
# S=64 quad working-set experiment on the HBM window-cache body
step pp4096_st64     3600 env EHYB_STREAM_SUBTILES=64 EHYB_NSLOT=512 \
                          python bench.py --run ehyb permuted_poisson_4096 100
# canonical CLI flow at reference scale on the 1.3 GB .mtx (next #5 tail)
step mtx_cli         5400 python scripts/mtx_scale.py --cli --iters 300
# heavy-tail body-alone comparison point for the split's "4-5x" claim
step body_powerlaw   4800 env EHYB_BENCH_DELEGATE=never \
                          python bench.py --run ehyb powerlaw_1m 50
# virtual-mesh scaling tables refresh (CPU-only)
step scaling         3600 python scripts/scaling.py
step multihost       2400 python scripts/multihost.py

note "RUSH3 COMPLETE"
