"""On-chip randomized parity fuzz: device pipeline (Pallas seeding path active at
batch_size=32) vs the pure-Python oracle, string-identical PAF required.

Run on a TPU host:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_fuzz.py [n_seeds]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main(n_seeds: int = 4) -> int:
    import jax

    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.oracle import pyref
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    if jax.default_backend() != "tpu":
        print("not a TPU backend; the Pallas path will not be exercised", file=sys.stderr)
    for seed in range(n_seeds):
        rng = np.random.default_rng(5000 + seed)
        p = Params.auto(
            k=int(rng.integers(3, 9)), l=int(rng.choice([13, 17, 21, 31])),
            density=float(rng.choice([0.02, 0.04, 0.06])),
            c=int(rng.integers(1, 6)), s=int(rng.integers(2, 16)),
            g=int(rng.choice([100, 2000, 10000])),
            use_hpc=bool(rng.random() < 0.7),
            fix_check_bug=bool(rng.random() < 0.3),
            max_read_len=1 << 13, batch_size=32,
        )
        genome = markov_genome(int(rng.integers(100_000, 300_000)), seed=seed,
                               n_contigs=int(rng.integers(1, 4)))
        reads = simulate_reads(genome, 32, mean_len=int(rng.integers(1500, 6000)),
                               accuracy=0.99, seed=seed + 7)
        mapper = Mapper(genome, p)
        jx = sorted(mapper.map_reads(reads))
        idx = pyref.build_index([pyref.encode(s) for _, s in genome], p)
        assert mapper.n_unique == idx.n_unique(), f"seed {seed}: index divergence"
        refs = [pyref.RefInfo(n, len(s)) for n, s in genome]
        opaf = sorted(
            ln for n, s in reads if (ln := pyref.map_read(n, pyref.encode(s), idx, refs, p))
        )
        assert jx == opaf, f"seed {seed}: PAF divergence ({p})"
        print(f"seed {seed}: OK (k={p.k} l={p.l} d={p.density} hpc={p.use_hpc} lines={len(jx)})")
    print("ALL CONFIGS IDENTICAL TO ORACLE")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 4))
