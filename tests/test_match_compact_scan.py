"""Differential test: sort-free head/last compactions in matching
(Params.match_compact_scan -> seeding.compact_scan) must match the rowsort
idiom bit-for-bit through the full map_batch program."""

import dataclasses

import numpy as np

from mapquik_tpu.eval.simulate import markov_genome, repeat_genome, simulate_reads
from mapquik_tpu.oracle.pyref import encode
from mapquik_tpu.params import Params
from mapquik_tpu.ops.pipeline import map_batch
from mapquik_tpu.index.build import build_index

import jax.numpy as jnp


P = Params(
    k=5, l=17, density=0.05,
    ref_window=1 << 14, ref_halo=1 << 12, ref_window_minimizers=1 << 12,
    max_read_len=1 << 13, max_minimizers=1 << 10, batch_size=32,
)


def _compare(genome, reads, p, cap=256):
    index, meta = build_index(genome, p)
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))
    B, L = p.batch_size, p.max_read_len
    p2 = dataclasses.replace(p, match_compact_scan=True)
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
            np.testing.assert_array_equal(
                np.asarray(getattr(r1, f))[m1], np.asarray(getattr(r2, f))[m1],
                err_msg=f,
            )


def test_match_compact_scan_matches_plain():
    genome = markov_genome(300_000, seed=15, n_contigs=3)
    reads = simulate_reads(genome, 64, mean_len=5000, accuracy=0.99, seed=16)
    _compare(genome, reads, P)


def test_match_compact_scan_matches_on_repeats():
    genome, _ = repeat_genome(
        400_000, seed=19, n_contigs=2, tandem_arrays=6,
        tandem_copies=(20, 60), tandem_identity=(0.999, 1.0),
        segdups=4, segdup_len=8_000, segdup_copies=(2, 4),
        segdup_identity=(0.97, 1.0), microsats=6, microsat_span=(400, 2000),
    )
    reads = simulate_reads(genome, 64, mean_len=5000, accuracy=0.93, seed=20)
    _compare(genome, reads, P)
