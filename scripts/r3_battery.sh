#!/bin/bash
# Round-3 TPU measurement battery: strictly serial (the tunnel is
# single-tenant), each stage time-boxed, continues past failures, resumable
# (skips stages whose marker file exists). Run it whenever the TPU window
# opens; logs land in /tmp/r3_battery/.
#
#   bash scripts/r3_battery.sh [stage...]   # default: all stages in order

set -u
cd /root/repo
OUT=/tmp/r3_battery
mkdir -p "$OUT"
STAGES=${@:-"express bench dsweep repeat"}

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
    # (the `ab` stage ran on 08-18 — experiments/toggles_ab_v5e.txt; the toggle
    # scripts were deleted once the decisions landed in DESIGN.md)
    bench)
      run_stage bench 3000 python bench.py
      ;;
    express)
      # <10-min window mode: cached inputs/index + warm AOT executables
      run_stage express 900 env BENCH_EXPRESS=1 python bench.py
      ;;
    cblk)
      # CBLK=4096 vs default A/B (child re-exec'd with MAPQUIK_CBLK; probe2)
      run_stage cblk 3600 python scripts/r3_probe2.py cblk
      ;;
    dsweep)
      # regenerated density sweep: honest 128-step caps should flatten the
      # round-2 power-of-two cliff (VERDICT item 5)
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
      # maize-scale repeat stress (VERDICT item 7): >=100 MB, >=5000 reads
      run_stage repeat 7200 python scripts/repeat_report.py \
        --preset maize --genome-mb 100 --depth 1.0 \
        --out experiments/repeat_stress_large.csv
      ;;
    roofline)
      # per-stage GB/s vs measured ceiling + bare-v5e projection (VERDICT r3 #9)
      run_stage roofline 3600 python scripts/r4_roofline.py
      ;;
    long64)
      # 64 kb bin on-chip validation + timing (VERDICT r3 #6)
      run_stage long64 3600 python scripts/r4_longreads.py
      ;;
    aotcold)
      # cross-session AOT cold-start proof (VERDICT r3 #8); run twice for
      # two relay phases via: rm /tmp/r3_battery/aotcold.done
      run_stage aotcold 3600 python scripts/r4_aot_cold.py --tag "$(date +%H%M)"
      ;;
    chm13)
      # CHM13-scale rehearsal (VERDICT item 4) — longest; run explicitly
      run_stage chm13 10800 python scripts/scale_rehearsal.py \
        --genome-gb 3.1 --out experiments/scale_rehearsal_chm13.json
      ;;
    *) log "unknown stage $s";;
  esac
done
log "battery pass complete"
