"""Tests that only run on a real TPU backend (skipped on the CPU test mesh):
string-level PAF parity of the Pallas seeding path against the oracle.

Run manually with:  PYTHONPATH=.:/root/.axon_site python -m pytest tests/test_tpu_only.py -q --no-header -p no:cacheprovider
(without the conftest CPU override: pytest -p no:conftest or set MAPQUIK_TPU_TESTS=1)
"""

import os

import numpy as np
import pytest


@pytest.mark.skipif(
    os.environ.get("MAPQUIK_TPU_TESTS") != "1",
    reason="TPU-only test; set MAPQUIK_TPU_TESTS=1 on a TPU host",
)
def test_pallas_path_paf_parity_on_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.oracle import pyref
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    p = Params.auto(k=7, l=31, density=0.01, max_read_len=1 << 15, batch_size=64)
    genome = markov_genome(1_000_000, seed=31, n_contigs=2)
    reads = simulate_reads(genome, 64, mean_len=20_000, accuracy=0.99, seed=32)
    mapper = Mapper(genome, p)
    jx = sorted(mapper.map_reads(reads))
    idx = pyref.build_index([pyref.encode(s) for _, s in genome], p)
    assert mapper.n_unique == idx.n_unique()
    refs = [pyref.RefInfo(n, len(s)) for n, s in genome]
    opaf = sorted(
        ln for n, s in reads if (ln := pyref.map_read(n, pyref.encode(s), idx, refs, p))
    )
    assert jx == opaf
