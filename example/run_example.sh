#!/usr/bin/env bash
# Acceptance test: map 100 near-perfect simulated reads against a 4.6Mb genome and
# score the PAF. Analog of the reference's example/run_ecoli.sh (same -k 8 -d 0.01
# -l 16 -g 100 parameters; mapeval scoring). Expected final line:
#   mapped 100/100 correct 100 (1.0000) wrong 0 | Q60: 100 mapped, 0 wrong
set -euo pipefail
cd "$(dirname "$0")"
export PYTHONPATH="..:${PYTHONPATH:-}"

[ -f sim.genome.fa ] || python make_data.py

python -m mapquik_tpu.cli nearperfect.100.fa --reference sim.genome.fa \
    -k 8 -d 0.01 -l 16 -g 100 -p example-out "$@"

python - <<'EOF'
from mapquik_tpu.eval.mapeval import evaluate_paf
lines = open("example-out.paf").read().strip().split("\n")
res = evaluate_paf(lines, n_reads=100)
print(res.summary())
assert res.n_wrong == 0, "wrong mappings in acceptance run"
assert res.q60_total >= 96, f"Q60 sensitivity regression: {res.q60_total}/100"
# golden-output check (committed expected.paf; order-insensitive, SURVEY.md §7(e))
import os
if os.path.exists("expected.paf"):
    exp = sorted(open("expected.paf").read().strip().split("\n"))
    assert sorted(lines) == exp, "PAF differs from committed golden output"
    print("golden PAF parity OK")
EOF
