"""Censat-style repeat-stress accuracy report.

Analog of the reference's censat/Q60 analysis (table1.sh:106-129: "Q60 reads
outside censat regions") and maize repeat stress (simulate_maize.sh): simulate
a genome with planted tandem arrays / segmental duplications / microsatellites,
map reads, classify each read by its TRUE origin's repeat overlap, and report
mapped/Q60/Q60-wrong/unmapped per class. Writes experiments/repeat_stress.csv.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/repeat_report.py \
      [--genome-mb 8] [--depth 3] [--platform cpu]
"""

import argparse
import csv
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=8)
    ap.add_argument("--depth", type=float, default=3)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="experiments/repeat_stress.csv")
    ap.add_argument("--preset", choices=["default", "maize"], default="default",
                    help="maize: ~25-30%% planted-repeat fraction (the "
                         "reference's maize-30X-scale stress, "
                         "simulate_maize.sh), for >=100MB genomes")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from mapquik_tpu.eval.mapeval import parse_truth
    from mapquik_tpu.eval.simulate import (
        read_repeat_overlap, repeat_genome, simulate_depth,
    )
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    n = int(args.genome_mb * 1_000_000)
    t0 = time.time()
    if args.preset == "maize":
        # maize-like repeat load: ~25-30% of the genome is tandem arrays /
        # dispersed duplications / microsatellites (the reference's hardest
        # published stress is maize 30X, ~85% repetitive overall with the
        # mappable stress concentrated in young high-identity families)
        genome, regions = repeat_genome(
            n, seed=args.seed, n_contigs=max(2, n // 25_000_000),
            tandem_arrays=max(8, n // 2_000_000),
            tandem_copies=(200, 1500), tandem_identity=(0.999, 1.0),
            segdups=max(8, n // 500_000), segdup_len=15_000,
            segdup_copies=(2, 8), segdup_identity=(0.97, 1.0),
            microsats=max(8, n // 500_000), microsat_span=(1000, 8000),
        )
    else:
        genome, regions = repeat_genome(
            n, seed=args.seed, n_contigs=max(2, n // 8_000_000),
            tandem_arrays=max(4, n // 1_000_000),
            tandem_copies=(30, 150), tandem_identity=(0.999, 1.0),
            segdups=max(3, n // 2_000_000), segdup_len=10_000,
            segdup_copies=(2, 6), segdup_identity=(0.97, 1.0),
            microsats=max(6, n // 1_000_000), microsat_span=(500, 4000),
        )
    reads = simulate_depth(genome, args.depth, mean_len=18_000, accuracy=0.99,
                           seed=args.seed + 1)
    rep_bases = sum(e - s for _, s, e, _ in regions)
    print(f"[{time.time()-t0:6.1f}s] genome {n/1e6:.0f}MB "
          f"({100*rep_bases/n:.1f}% repeat), {len(reads)} reads", file=sys.stderr)

    p = Params.auto(k=7, l=31, density=0.01)
    mapper = Mapper(genome, p)
    print(f"[{time.time()-t0:6.1f}s] index: {mapper.n_unique} unique k-min-mers",
          file=sys.stderr)
    lines = list(mapper.map_reads(reads))
    print(f"[{time.time()-t0:6.1f}s] mapped {len(lines)}/{len(reads)}",
          file=sys.stderr)

    by_name = {}
    for ln in lines:
        f = ln.split("\t")
        by_name[f[0]] = (f[5], int(f[7]), int(f[8]), int(f[11]))

    classes = ["unique", "partial", "tandem", "segdup", "microsat"]
    stats = {c: dict(n=0, mapped=0, q60=0, q60_wrong=0, q60_wrong_oracle=0)
             for c in classes}
    wrong_reads = {}  # name -> (class, device PAF line)
    line_by_name = {ln.split("\t", 1)[0]: ln for ln in lines}
    for nm, _ in reads:
        cls = read_repeat_overlap(nm, regions, min_frac=0.5)
        st = stats[cls]
        st["n"] += 1
        hit = by_name.get(nm)
        if hit is None:
            continue
        st["mapped"] += 1
        rname, rs, re_, mapq = hit
        if mapq != 60:
            continue
        st["q60"] += 1
        t_chr, t_lo, t_hi, _ = parse_truth(nm)
        ov = min(re_, t_hi) - max(rs, t_lo - 1)
        if rname != t_chr or ov < 0.1 * (t_hi - t_lo + 1):
            st["q60_wrong"] += 1
            wrong_reads[nm] = (cls, line_by_name[nm])

    # Oracle adjudication of every Q60-wrong call: a wrong call whose PAF line
    # is STRING-IDENTICAL to the pure-Python oracle's is the reference
    # ALGORITHM's own behavior (near-identical tandem copies can genuinely
    # out-score the true copy under read errors; the top-2 tie rejection,
    # mers.rs:104-129, only demotes EXACT score ties) — not an implementation
    # bug. Only unconfirmed wrong calls fail the report.
    if wrong_reads:
        from mapquik_tpu.oracle import pyref as o

        print(f"[{time.time()-t0:6.1f}s] oracle-adjudicating "
              f"{len(wrong_reads)} Q60-wrong call(s)", file=sys.stderr)
        codes_contigs = [o.encode(s) for _, s in genome]
        oidx = o.build_index(codes_contigs, p)
        refs = [o.RefInfo(nm_, len(s)) for nm_, s in genome]
        read_by_name = dict(reads)
        for nm, (cls, dev_line) in wrong_reads.items():
            oln = o.map_read(nm, o.encode(read_by_name[nm]), oidx, refs, p)
            if oln == dev_line:
                stats[cls]["q60_wrong_oracle"] += 1
            else:
                print(f"ORACLE MISMATCH {nm}:\n  device {dev_line}\n"
                      f"  oracle {oln}", file=sys.stderr)

    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class", "reads", "mapped", "unmapped_frac", "q60",
                    "q60_frac", "q60_wrong", "q60_wrong_oracle_confirmed"])
        for c in classes:
            st = stats[c]
            if st["n"] == 0:
                continue
            w.writerow([
                c, st["n"], st["mapped"],
                round(1 - st["mapped"] / st["n"], 4),
                st["q60"], round(st["q60"] / st["n"], 4), st["q60_wrong"],
                st["q60_wrong_oracle"],
            ])
        w.writerow([])
        w.writerow(["genome_mb", args.genome_mb])
        w.writerow(["repeat_frac", round(rep_bases / n, 4)])
        w.writerow(["unique_kminmers", mapper.n_unique])

    total_q60_wrong = sum(s["q60_wrong"] for s in stats.values())
    total_confirmed = sum(s["q60_wrong_oracle"] for s in stats.values())
    total_q60 = sum(s["q60"] for s in stats.values())
    for c in classes:
        st = stats[c]
        if st["n"]:
            print(f"{c:9s} n={st['n']:5d} mapped={st['mapped']:5d} "
                  f"q60={st['q60']:5d} q60_wrong={st['q60_wrong']} "
                  f"(oracle-confirmed {st['q60_wrong_oracle']})")
    print(f"TOTAL q60_wrong={total_q60_wrong} "
          f"(oracle-confirmed {total_confirmed}, "
          f"rate {total_q60_wrong / max(1, total_q60):.5f}) -> {args.out}")
    # pass iff every wrong call is the algorithm's own AND the rate stays
    # within the reference's published error class (<0.2% of Q60 calls)
    ok = (total_confirmed == total_q60_wrong
          and total_q60_wrong <= 0.002 * total_q60)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
