"""Validate + time the 64 kb read bin ON-CHIP (round-3 verdict item 6).

The default Params route reads >32 kb to the L=65536 XLA bin automatically
(Pallas fast path stays for <=32 kb; params.length_bins). That path had only
ever run on the CPU test mesh — this script runs a >=5k-read 33-50 kb workload
through CLI-default Params on the real chip, asserts oracle-identical PAF,
and records the L=65536 program's compile time and steady ms/batch
(reference: uncapped extraction, /root/reference/src/mers.rs:41-54).

  python scripts/r4_longreads.py [--reads N] [--oracle-sample N]
Writes experiments/longreads_64k.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[long64 +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=5120)
    ap.add_argument("--genome-mb", type=int, default=16)
    ap.add_argument("--oracle-sample", type=int, default=512,
                    help="reads checked for string-identical PAF vs the oracle "
                         "(the rest are truth-evaluated via read names)")
    args = ap.parse_args()

    import jax

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.eval.mapeval import evaluate_paf
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.oracle import pyref

    p = Params(k=7, l=31, density=0.01)  # CLI defaults: max_read_len 65536
    log(f"device {jax.devices()[0]}; {args.reads} reads, mean 40 kb "
        f"(33-50 kb band), genome {args.genome_mb}MB")
    genome = markov_genome(args.genome_mb * 1_000_000, seed=41, n_contigs=4)
    reads = simulate_reads(genome, args.reads, mean_len=40_000, accuracy=0.99,
                           seed=42)
    lens = np.array([len(s) for _, s in reads])
    n_long = int((lens > 32768).sum())
    log(f"read lengths: min {lens.min()} max {lens.max()}; "
        f"{n_long}/{args.reads} take the 64 kb XLA bin")
    assert n_long > args.reads // 2, "workload must exercise the 64 kb bin"

    mapper = Mapper(genome, p)
    log(f"index ready: {mapper.n_unique} keys; first pass (compiles)")
    t0 = time.time()
    paf = list(mapper.map_reads(reads))
    first_s = time.time() - t0
    log(f"first pass: {first_s:.1f}s ({args.reads/first_s:.0f} reads/s incl. compiles)")
    t0 = time.time()
    paf = list(mapper.map_reads(reads))
    steady_s = time.time() - t0
    nb = max(1, args.reads // p.batch_size)
    log(f"steady: {steady_s:.1f}s = {args.reads/steady_s:.0f} reads/s "
        f"({steady_s/nb*1e3:.1f} ms per {p.batch_size}-read batch)")

    ev = evaluate_paf(paf, n_reads=args.reads)
    log(f"accuracy: mapped {ev.n_mapped}/{args.reads}, wrong {ev.n_wrong}, "
        f"q60 {ev.q60_total} (q60 wrong {ev.q60_wrong})")
    assert ev.n_wrong == 0 and ev.q60_wrong == 0

    # oracle string parity on a sample (full oracle at 5k x 40 kb is minutes)
    ns = min(args.oracle_sample, args.reads)
    idx = pyref.build_index([pyref.encode(s) for _, s in genome], p)
    refs = [pyref.RefInfo(n, len(s)) for n, s in genome]
    sample = reads[:ns]
    opaf = [
        ln for n, s in sample
        if (ln := pyref.map_read(n, pyref.encode(s), idx, refs, p))
    ]
    got = [ln for ln in mapper.map_reads(sample)]
    assert got == opaf, "64 kb bin PAF differs from oracle"
    log(f"oracle parity OK on {ns} reads ({len(opaf)} PAF lines)")

    out = {
        "device": str(jax.devices()[0]),
        "n_reads": args.reads,
        "n_over_32k": n_long,
        "len_min": int(lens.min()),
        "len_max": int(lens.max()),
        "first_pass_s": round(first_s, 1),
        "steady_s": round(steady_s, 1),
        "steady_reads_per_s": round(args.reads / steady_s, 1),
        "mapped": ev.n_mapped,
        "wrong": ev.n_wrong,
        "q60": ev.q60_total,
        "q60_wrong": ev.q60_wrong,
        "oracle_parity_reads": ns,
    }
    os.makedirs("experiments", exist_ok=True)
    with open("experiments/longreads_64k.json", "w") as f:
        json.dump(out, f, indent=1)
    log("artifact written: experiments/longreads_64k.json")


if __name__ == "__main__":
    main()
