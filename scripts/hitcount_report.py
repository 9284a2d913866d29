"""Q0 / hit-count (candidate-locus) distribution analysis.

Analog of the reference's figure-hit-count analysis
(/root/reference/experiments/figure-hit-count/get_q0_hitstats.sh +
figure-seeds/figure1-right-panel.sh: re-run with the stats module enabled and
histogram per-read candidate-locus counts for Q0 mappings): simulate a
repeat-stressed genome, map with the device locus-stats op (ops/stats.py),
join MAPQ outcomes with locus counts, and write the joint histogram.

  python scripts/hitcount_report.py [--genome-mb 4] [--platform cpu]
  -> experiments/hitcount_q0.csv (rows: nb_loci, n_unmapped, n_q0, n_q60)

Expected shape (the reference's rationale for binary MAPQ): Q60 reads
concentrate at nb_loci == 1; Q0 and unmapped reads dominate nb_loci >= 2.
"""

import argparse
import csv
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=4)
    ap.add_argument("--depth", type=float, default=2)
    ap.add_argument("--seed", type=int, default=19)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="experiments/hitcount_q0.csv")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mapquik_tpu.eval.simulate import repeat_genome, simulate_depth
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.ops.stats import StatsWriter
    from mapquik_tpu.params import Params

    n = int(args.genome_mb * 1_000_000)
    t0 = time.time()
    genome, regions = repeat_genome(
        n, seed=args.seed, n_contigs=2,
        tandem_arrays=max(4, n // 500_000), tandem_copies=(40, 200),
        tandem_identity=(1.0, 1.0),  # perfect copies: multi-locus candidates
        segdups=max(3, n // 1_000_000), segdup_identity=(0.995, 1.0),
        segdup_len=12_000, segdup_copies=(2, 5),
        microsats=max(6, n // 500_000), microsat_span=(1000, 6000),
    )
    # short reads land INSIDE repeat structures (long reads always reach
    # unique flanks and trivially resolve)
    reads = simulate_depth(genome, args.depth, mean_len=6_000, accuracy=0.99,
                           seed=args.seed + 1)
    print(f"[{time.time()-t0:6.1f}s] {len(reads)} reads", file=sys.stderr)
    p = Params.auto(k=7, l=31, density=0.01, max_read_len=1 << 14)

    import tempfile

    mapper = Mapper(genome, p)
    with tempfile.TemporaryDirectory() as td:
        stats = StatsWriter(td + "/run")
        mapq = {}
        for ln in mapper.map_reads(reads, stats=stats):
            f = ln.split("\t")
            mapq[f[0]] = int(f[11])
        stats.close()
        loci = {}
        with open(stats.path) as f:
            for line in f:
                nm, v = line.rsplit(":", 1)
                loci[nm.strip()] = int(v)
    print(f"[{time.time()-t0:6.1f}s] mapped {len(mapq)}/{len(reads)}",
          file=sys.stderr)

    hist = defaultdict(lambda: [0, 0, 0])  # nb_loci -> [unmapped, q0, q60]
    for nm, _ in reads:
        nl = loci.get(nm, 0)
        q = mapq.get(nm)
        hist[nl][0 if q is None else (1 if q == 0 else 2)] += 1
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["nb_loci", "n_unmapped", "n_q0", "n_q60"])
        for nl in sorted(hist):
            w.writerow([nl] + hist[nl])
    multi = sum(v[1] + v[0] for nl, v in hist.items() if nl >= 2)
    single_q60 = hist.get(1, [0, 0, 0])[2]
    print(f"single-locus Q60: {single_q60}; multi-locus unmapped/Q0: {multi} "
          f"-> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
