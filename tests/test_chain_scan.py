"""Differential test: gather-free chaining (chain_and_select_v2, Params
.chain_scan) must match the gather formulation bit-for-bit through the full
map_batch program — mapped flags everywhere, every output field on mapped
reads (unmapped reads carry don't-care fields in both formulations)."""

import dataclasses

import numpy as np
import pytest

from mapquik_tpu.eval.simulate import markov_genome, repeat_genome, simulate_reads
from mapquik_tpu.oracle.pyref import encode
from mapquik_tpu.params import Params
from mapquik_tpu.ops.pipeline import Mapper, map_batch
from mapquik_tpu.index.build import build_index

import jax.numpy as jnp


# base = the gather formulation (the foil); chain_scan=True is the adopted
# default (experiments/toggles_ab_v5e.txt)
P = Params(
    k=5, l=17, density=0.05,
    ref_window=1 << 14, ref_halo=1 << 12, ref_window_minimizers=1 << 12,
    max_read_len=1 << 13, max_minimizers=1 << 10, batch_size=32,
    chain_scan=False,
)


def _compare(genome, reads, p, cap=256):
    index, meta = build_index(genome, p)
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))
    B = p.batch_size
    L = p.max_read_len
    p2 = dataclasses.replace(p, chain_scan=True)
    for i in range(0, len(reads), B):
        chunk = reads[i : i + B]
        codes = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for j, (_, seq) in enumerate(chunk):
            c = encode(seq)[:L]
            codes[j, : len(c)] = c
            lens[j] = len(c)
        codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)
        r1 = map_batch(codes_d, lens_d, index, ref_lens, p, cap)
        r2 = map_batch(codes_d, lens_d, index, ref_lens, p2, cap)
        m1, m2 = np.asarray(r1.mapped), np.asarray(r2.mapped)
        np.testing.assert_array_equal(m1, m2)
        for f in ("rc", "q_start", "q_end", "rid", "r_start", "r_end",
                  "score", "mapq"):
            v1 = np.asarray(getattr(r1, f))[m1]
            v2 = np.asarray(getattr(r2, f))[m1]
            np.testing.assert_array_equal(v1, v2, err_msg=f)


def test_chain_scan_matches_plain():
    genome = markov_genome(300_000, seed=5, n_contigs=3)
    reads = simulate_reads(genome, 64, mean_len=5000, accuracy=0.99, seed=6)
    _compare(genome, reads, P)


def test_chain_scan_matches_on_repeats():
    # repeats drive multi-bucket reads, ties, and top-2 rejection
    genome, _ = repeat_genome(
        400_000, seed=9, n_contigs=2, tandem_arrays=6,
        tandem_copies=(20, 60), tandem_identity=(0.999, 1.0),
        segdups=4, segdup_len=8_000, segdup_copies=(2, 4),
        segdup_identity=(0.97, 1.0), microsats=6, microsat_span=(400, 2000),
    )
    reads = simulate_reads(genome, 64, mean_len=5000, accuracy=0.99, seed=10)
    _compare(genome, reads, P)


def test_chain_scan_matches_low_accuracy():
    # low accuracy fragments chains -> many small buckets per read
    genome = markov_genome(300_000, seed=7, n_contigs=2)
    reads = simulate_reads(genome, 48, mean_len=4000, accuracy=0.93, seed=8)
    _compare(genome, reads, P)
