"""Variant-region specificity analysis (analog of the reference's variants.sh).

The reference intersects Q0 mappings with an HG002 VCF to show Q0 calls are
enriched at variant-dense loci while Q60 calls stay specific
(/root/reference/experiments/variants.sh:12-22). Without real VCFs, this
simulates the same question end-to-end: plant SNV/indel variants into a SAMPLE
copy of the reference genome (recording a VCF-like region list), simulate
reads FROM THE SAMPLE, map them AGAINST THE REFERENCE, and report mapping
outcome vs variant-density class.

  python scripts/variants_report.py [--platform cpu]
  -> experiments/variants_q0.csv

Expected shape: Q60 reads stay position-correct even across variant-dense
regions (HiFi-range divergence is what HPC ntHash absorbs); q60_wrong == 0
everywhere; unmapped/Q0 enrich only at extreme local divergence.
"""

import argparse
import csv
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=4)
    ap.add_argument("--depth", type=float, default=3)
    ap.add_argument("--seed", type=int, default=37)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="experiments/variants_q0.csv")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mapquik_tpu.eval.mapeval import parse_truth
    from mapquik_tpu.eval.simulate import markov_genome, simulate_depth
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    rng = np.random.default_rng(args.seed)
    n = int(args.genome_mb * 1e6)
    t0 = time.time()
    reference = markov_genome(n, seed=args.seed, n_contigs=2)

    # build the SAMPLE: per-contig variant regions of three densities
    # (background 0.1% SNV; dense 1%; hyperdense 3% SNV + 0.3% 1-5bp indels)
    lut = np.full(256, 0, np.uint8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
    sample = []
    regions = []  # (contig, start, end, klass)
    for name, seq in reference:
        codes = lut[np.frombuffer(seq, np.uint8)].copy()
        glen = codes.size
        # dense / hyperdense regions
        for klass, dens, count, span in (
            ("dense", 0.01, 6, 60_000), ("hyper", 0.03, 4, 40_000),
        ):
            for _ in range(count):
                s = int(rng.integers(0, glen - span))
                regions.append((name, s, s + span, klass))
                nmut = rng.poisson(dens * span)
                pos = rng.integers(s, s + span, nmut)
                codes[pos] = (codes[pos] + rng.integers(1, 4, nmut)) % 4
                if klass == "hyper":  # short indels, applied as local shifts
                    for _ in range(int(0.003 * span)):
                        ip = int(rng.integers(s, s + span - 8))
                        ilen = int(rng.integers(1, 6))
                        if rng.random() < 0.5:  # deletion: shift left, refill tail
                            codes[ip : glen - ilen] = codes[ip + ilen : glen].copy()
                        else:  # insertion
                            codes[ip + ilen : glen] = codes[ip : glen - ilen].copy()
                            codes[ip : ip + ilen] = rng.integers(0, 4, ilen)
        # background SNVs
        nmut = rng.poisson(0.001 * glen)
        pos = rng.integers(0, glen, nmut)
        codes[pos] = (codes[pos] + rng.integers(1, 4, nmut)) % 4
        sample.append((name, _BASES[codes].tobytes()))
    print(f"[{time.time()-t0:6.1f}s] sample built ({len(regions)} variant regions)",
          file=sys.stderr)

    reads = simulate_depth(sample, args.depth, mean_len=18_000, accuracy=0.99,
                           seed=args.seed + 1)
    p = Params.auto(k=7, l=31, density=0.01)
    mapper = Mapper(reference, p)  # index the REFERENCE, map SAMPLE reads
    by_name = {}
    for ln in mapper.map_reads(reads):
        f = ln.split("\t")
        by_name[f[0]] = (f[5], int(f[7]), int(f[8]), int(f[11]))
    print(f"[{time.time()-t0:6.1f}s] mapped {len(by_name)}/{len(reads)}",
          file=sys.stderr)

    def klass_of(nm):
        chrom, lo, hi, _ = parse_truth(nm)
        best, bk = 0, "background"
        for rname, rs, re_, k in regions:
            if rname != chrom:
                continue
            ov = min(hi, re_) - max(lo, rs)
            if ov > best:
                best, bk = ov, k
        return bk if best >= 0.3 * (hi - lo) else "background"

    classes = ["background", "dense", "hyper"]
    stats = {c: dict(n=0, mapped=0, q60=0, q60_wrong=0, q0=0) for c in classes}
    for nm, _ in reads:
        st = stats[klass_of(nm)]
        st["n"] += 1
        hit = by_name.get(nm)
        if hit is None:
            continue
        st["mapped"] += 1
        rname, rs, re_, mapq = hit
        if mapq == 0:
            st["q0"] += 1
            continue
        st["q60"] += 1
        chrom, lo, hi, _ = parse_truth(nm)
        ov = min(re_, hi) - max(rs, lo)
        if rname != chrom or ov < 0.1 * (hi - lo):
            st["q60_wrong"] += 1

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class", "reads", "mapped", "q60", "q0", "unmapped",
                    "q60_wrong"])
        for c in classes:
            st = stats[c]
            w.writerow([c, st["n"], st["mapped"], st["q60"], st["q0"],
                        st["n"] - st["mapped"], st["q60_wrong"]])
    tw = sum(s["q60_wrong"] for s in stats.values())
    for c in classes:
        st = stats[c]
        print(f"{c:10s} n={st['n']:5d} q60={st['q60']:5d} q0={st['q0']:3d} "
              f"unmapped={st['n']-st['mapped']:3d} q60_wrong={st['q60_wrong']}")
    print(f"TOTAL q60_wrong={tw} -> {args.out}")
    return 0 if tw == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
