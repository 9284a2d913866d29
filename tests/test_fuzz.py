"""Randomized differential fuzzing: device pipeline vs oracle across parameter
space. Every configuration must produce STRING-IDENTICAL PAF output (SURVEY.md §7
gate). Catches interactions no hand-written case covers: k/l/density extremes,
HPC on/off, check-bug toggle, tiny/huge gaps, multi-contig boundary effects,
N runs, short reads, rc-heavy read sets."""

import numpy as np
import pytest

from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.oracle import pyref as o
from mapquik_tpu.ops.pipeline import Mapper
from mapquik_tpu.params import Params


def _config(rng):
    k = int(rng.integers(3, 9))
    l = int(rng.choice([13, 17, 21, 25, 31]))
    density = float(rng.choice([0.02, 0.035, 0.05, 0.08]))
    return Params.auto(
        k=k, l=l, density=density,
        c=int(rng.integers(1, 6)), s=int(rng.integers(2, 16)),
        g=int(rng.choice([100, 500, 2000, 10_000])),
        use_hpc=bool(rng.random() < 0.7),
        fix_check_bug=bool(rng.random() < 0.3),
        max_read_len=1 << 12, batch_size=8,
        ref_window=1 << 13, ref_halo=1 << 11,
    )


def _mutate_reads(reads, rng):
    """Inject adversarial reads: N-runs, lowercase, very short, unmappable."""
    out = list(reads)
    if out:
        n, s = out[0]
        mid = len(s) // 2
        out[0] = (n + "_N", s[:mid] + b"N" * int(rng.integers(1, 60)) + s[mid:])
    out.append(("tiny", b"ACGTAC"))
    out.append(("junk", bytes(rng.choice(list(b"ACGT"), 800).astype(np.uint8))))
    return out


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_device_equals_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    p = _config(rng)
    n_contigs = int(rng.integers(1, 4))
    genome = markov_genome(int(rng.integers(40_000, 120_000)), seed=seed, n_contigs=n_contigs)
    reads = simulate_reads(
        genome, 12, mean_len=int(rng.integers(800, 3500)),
        accuracy=float(rng.choice([0.97, 0.99, 0.999])), seed=seed + 7,
    )
    reads = _mutate_reads(reads, rng)

    mapper = Mapper(genome, p)
    device = sorted(mapper.map_reads(reads))

    oidx = o.build_index([o.encode(s) for _, s in genome], p)
    assert mapper.n_unique == oidx.n_unique(), "index divergence"
    refs = [o.RefInfo(nm, len(s)) for nm, s in genome]
    oracle = sorted(
        ln for nm, s in reads if (ln := o.map_read(nm, o.encode(s), oidx, refs, p))
    )
    assert device == oracle, f"PAF divergence with params {p}"
