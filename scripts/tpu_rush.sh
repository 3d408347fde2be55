#!/bin/bash
# Round-3 TPU measurement rush: wait for the axon tunnel to come back, then
# run the queued measurement plan (VERDICT_R2_RESPONSE.md tail) unattended,
# highest-value first.  Each step logs to $LOGDIR/<step>.log; a one-line
# status per step goes to $SUMMARY.  Safe to re-run: steps are independent.
#
# Usage: bash scripts/tpu_rush.sh   (run in background; tail $SUMMARY)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
LOGDIR=/tmp/tpu_rush
SUMMARY=$LOGDIR/SUMMARY.log
mkdir -p "$LOGDIR"

note() { echo "[$(date +%H:%M:%S)] $*" >> "$SUMMARY"; }

# ---- phase 0: wait for the tunnel (up to ~11 h, 7-min cadence) ----------
up=0
for i in $(seq 1 95); do
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    up=1; note "tunnel UP (attempt $i)"; break
  fi
  note "tunnel still down (attempt $i)"
  sleep 180
done
if [ "$up" != 1 ]; then note "GIVING UP: tunnel never came back"; exit 1; fi

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  note "START $name"
  if timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1; then
    note "OK    $name: $(grep -E 'BENCH_RESULT|GFLOP' "$LOGDIR/$name.log" | tail -2 | tr '\n' ' | ')"
  else
    note "FAIL  $name (exit $?, see $LOGDIR/$name.log)"
  fi
}

# ---- phase 0.5: compiled check_vma smoke (sharded engines, D=1) ----------
step vma_smoke          1800 python scripts/tpu_smoke_sharded.py

# ---- phase 1: the routed engine, never measured on hardware -------------
step routed_random_1m   2400 python bench.py --run ehyb_routed random_1m 100
step routed_random_4m   3000 python bench.py --run ehyb_routed random_4m 100
step delegate_random_1m 2400 python bench.py --run ehyb random_1m 100
# heavy-tail regime: the degree-split hybrid (models/hybrid.py) vs the
# body-alone number the veto previously kept (23.1 GFLOP/s r3-session-1)
step split_powerlaw_1m  3000 python bench.py --run ehyb_split powerlaw_1m 100
step delegate_powerlaw  3000 python bench.py --run ehyb powerlaw_1m 100
step route_breakdown    2400 python scripts/route_breakdown.py random_1m
step probe_route        1800 python scripts/probe_route.py

# ---- phase 2: headline + experiments -------------------------------------
step headline           5400 python bench.py
# S=64 quad working set is <=256 windows/step, two steps in flight > the
# default 320 slots — raise the cache to its 512-slot bit-budget cap.
step pp4096_st64        3600 env EHYB_STREAM_SUBTILES=64 EHYB_NSLOT=512 \
                             python bench.py --run ehyb permuted_poisson_4096 100
step pp4096_base        3600 python bench.py --run ehyb permuted_poisson_4096 100
# f64 contract (spmv.h:46 analog): measure the f32x2 dword cost ratio on
# hardware next to the f32 headline number (VERDICT r3 next #8).
step dword_pp512        2400 env EHYB_BENCH_DWORD=1 \
                             python bench.py --run ehyb permuted_poisson_512 100

# ---- phase 3: the full corpus sweep (longest; everything cached by now) --
step sweep             14400 python scripts/sweep.py

note "RUSH COMPLETE"
