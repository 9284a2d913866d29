"""Identity-limit characterization: sensitivity/Q60 vs read accuracy.

The reference documents HiFi-range operation (">=97% identity",
/root/reference/README.md:12) — below that, k-min-mer seeds (k consecutive
exact l-mers) vanish and sensitivity cliffs. This sweep reproduces that cliff
for the TPU build: simulate reads at accuracies 0.90..0.999, map, and record
mapped/Q60/wrong fractions per point.

  python scripts/identity_sweep.py [--platform cpu] [--out experiments/identity_sweep.csv]
"""

import argparse
import csv
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=4)
    ap.add_argument("--n-reads", type=int, default=256)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="experiments/identity_sweep.csv")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mapquik_tpu.eval.mapeval import evaluate_paf
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    t0 = time.time()
    genome = markov_genome(int(args.genome_mb * 1e6), seed=23, n_contigs=2)
    p = Params.auto(k=7, l=31, density=0.01, max_read_len=1 << 15)
    mapper = Mapper(genome, p)
    print(f"[{time.time()-t0:6.1f}s] index {mapper.n_unique}", file=sys.stderr)

    accs = [0.90, 0.92, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99, 0.995, 0.999]
    rows = []
    for acc in accs:
        reads = simulate_reads(genome, args.n_reads, mean_len=18_000,
                               accuracy=acc, seed=int(acc * 10000))
        ev = evaluate_paf(mapper.map_reads(reads), n_reads=len(reads))
        rows.append([
            acc, ev.n_reads, ev.n_mapped,
            round(ev.n_mapped / ev.n_reads, 4),
            ev.q60_total, round(ev.q60_total / ev.n_reads, 4),
            ev.n_wrong, ev.q60_wrong,
        ])
        print(f"[{time.time()-t0:6.1f}s] acc={acc}: mapped "
              f"{ev.n_mapped}/{ev.n_reads}, q60 {ev.q60_total}, "
              f"wrong {ev.n_wrong}, q60_wrong {ev.q60_wrong}", file=sys.stderr)

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["accuracy", "reads", "mapped", "mapped_frac",
                    "q60", "q60_frac", "wrong", "q60_wrong"])
        w.writerows(rows)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
