#!/bin/bash
# Round-5 TPU measurement battery: strictly serial (the tunnel is
# single-tenant), each stage time-boxed, continues past failures, resumable
# (skips stages whose marker file exists). Run whenever a TPU window opens;
# logs land in /tmp/r5_battery/. NEVER overlap with pytest or other CPU-heavy
# jobs (host contention distorts every timing, CLAUDE.md).
#
#   bash scripts/r5_battery.sh [stage...]
#   default order: buildprof overlap express e2eprof dsweep repeat long64
#                  aotcold roofline ksweep lsweep
#   explicit-only: bench chm13 cblk

set -u
cd /root/repo
OUT=/tmp/r5_battery
mkdir -p "$OUT"
STAGES=${@:-"buildprof overlap express e2eprof dsweep repeat long64 aotcold roofline ksweep lsweep"}

log() { echo "[battery $(date +%H:%M:%S)] $*" | tee -a "$OUT/battery.log"; }

run_stage() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "$name: already done, skipping"; return; fi
  log "$name: start (timeout ${tmo}s)"
  timeout "$tmo" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  log "$name: exit $rc"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
}

for s in $STAGES; do
  case $s in
    buildprof)
      # device index-build phase split at 64MB (the 50 MB/s bar)
      run_stage buildprof 2400 python scripts/r5_buildprof.py
      ;;
    overlap)
      # h2d-during-compute A/B: is the serial discipline still justified?
      run_stage overlap 1800 python scripts/r5_overlap_ab.py
      ;;
    xcost)
      # dissect the ~95 ms/chunk extraction cost (seed vs gather vs fixed)
      run_stage xcost 1800 python scripts/r5_extract_cost.py
      ;;
    express)
      # warm-cache bench at the new 16384-read workload
      run_stage express 1800 env BENCH_EXPRESS=1 python bench.py
      ;;
    e2eprof)
      # e2e split with the r5 tail/wave fixes in
      run_stage e2eprof 1800 env MAPQUIK_E2E_PROF=2 python scripts/r5_e2e_prof.py
      ;;
    bench)
      run_stage bench 3600 python bench.py
      ;;
    cblk)
      run_stage cblk 3600 python scripts/r3_probe2.py cblk
      ;;
    dsweep)
      # regenerated density sweep (stale-artifact item; honest 128-step caps)
      run_stage dsweep 3600 python scripts/sweep.py --axis d --genome-mb 8 --reads 512
      [ -e "$OUT/dsweep.done" ] && grep -q reads_per_s "$OUT/dsweep.out" && \
        cp "$OUT/dsweep.out" experiments/d_sweep_v5e.csv && log "dsweep: artifact updated"
      ;;
    ksweep)
      run_stage ksweep 3600 python scripts/sweep.py --axis k --genome-mb 8 --reads 512
      [ -e "$OUT/ksweep.done" ] && grep -q reads_per_s "$OUT/ksweep.out" && \
        cp "$OUT/ksweep.out" experiments/k_sweep_v5e.csv && log "ksweep: artifact updated"
      ;;
    lsweep)
      run_stage lsweep 3600 python scripts/sweep.py --axis l --genome-mb 8 --reads 512
      [ -e "$OUT/lsweep.done" ] && grep -q reads_per_s "$OUT/lsweep.out" && \
        cp "$OUT/lsweep.out" experiments/l_sweep_v5e.csv && log "lsweep: artifact updated"
      ;;
    repeat)
      # maize-scale repeat stress: >=100 MB, >=5000 reads (3 gated tests)
      run_stage repeat 7200 python scripts/repeat_report.py \
        --preset maize --genome-mb 100 --depth 1.0 \
        --out experiments/repeat_stress_large.csv
      ;;
    long64)
      run_stage long64 3600 python scripts/r4_longreads.py
      ;;
    aotcold)
      # re-run in a second phase via: rm /tmp/r5_battery/aotcold.done
      run_stage aotcold 3600 python scripts/r4_aot_cold.py --tag "$(date +%H%M)"
      ;;
    roofline)
      run_stage roofline 3600 python scripts/r4_roofline.py
      ;;
    chm13)
      run_stage chm13 10800 python scripts/scale_rehearsal.py \
        --genome-gb 3.1 --out experiments/scale_rehearsal_chm13.json
      ;;
    *) log "unknown stage $s";;
  esac
done
log "battery pass complete"
