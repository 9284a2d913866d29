"""Differential tests: device seeding ops vs the pure-Python oracle (bit-exact)."""

import numpy as np
import pytest

from mapquik_tpu.params import Params
from mapquik_tpu.oracle import pyref as o

import jax.numpy as jnp
from mapquik_tpu.ops import seeding


def rand_codes(n, seed=0, p_hp=0.3, p_n=0.0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    runs = rng.random(n) < p_hp
    for i in range(1, n):
        if runs[i]:
            codes[i] = codes[i - 1]
    if p_n:
        codes[rng.random(n) < p_n] = o.INVALID
    return codes


def pad_batch(seqs, L):
    B = len(seqs)
    codes = np.full((B, L), o.INVALID, dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = s
        lens[i] = len(s)
    return jnp.asarray(codes), jnp.asarray(lens)


def make_seqs():
    return [
        rand_codes(2000, seed=1),
        rand_codes(1500, seed=2, p_n=0.01),
        rand_codes(100, seed=3),
        rand_codes(17, seed=4),        # < l+k-1 for default-ish params
        np.zeros(0, dtype=np.uint8),   # empty
        rand_codes(2048, seed=5, p_hp=0.7),  # heavy homopolymers
    ]


class TestHpc:
    def test_matches_oracle(self):
        seqs = make_seqs()
        codes, lens = pad_batch(seqs, 2048)
        hc, rs, re, hl = seeding.hpc_compact(codes, lens)
        hc, rs, re, hl = map(np.asarray, (hc, rs, re, hl))
        for i, s in enumerate(seqs):
            oh, ors, ore = o.hpc_compress(s)
            n = oh.shape[0]
            assert hl[i] == n
            np.testing.assert_array_equal(hc[i, :n], oh)
            np.testing.assert_array_equal(rs[i, :n], ors)
            np.testing.assert_array_equal(re[i, :n], ore)
            assert (hc[i, n:] == o.INVALID).all()


class TestNtHash:
    @pytest.mark.parametrize("l", [5, 16, 31])
    def test_matches_oracle(self, l):
        seqs = make_seqs()
        codes, lens = pad_batch(seqs, 2048)
        # device path hashes the raw (non-HPC) codes here
        canon, valid = seeding.nthash32_batch(codes, l)
        canon, valid = np.asarray(canon), np.asarray(valid)
        for i, s in enumerate(seqs):
            oc, _, ov = o.nthash32(s, l)
            m = oc.shape[0]
            np.testing.assert_array_equal(valid[i, :m], ov)
            np.testing.assert_array_equal(canon[i, :m][ov], oc[ov])
            assert not valid[i, m:].any()


class TestSeedBatch:
    @pytest.mark.parametrize(
        "p",
        [
            Params(k=5, l=17, density=0.05),
            Params(k=8, l=16, density=0.01, g=100),
            Params(k=3, l=31, density=0.1),
            Params(k=5, l=17, density=0.05, use_hpc=False),
        ],
        ids=["default-ish", "ecoli", "small-k", "nohpc"],
    )
    def test_matches_oracle(self, p):
        seqs = make_seqs() + [rand_codes(4000, seed=9), rand_codes(3000, seed=10, p_n=0.005)]
        codes, lens = pad_batch(seqs, 4096)
        cap = 512
        sb = seeding.seed_batch(codes, lens, p, cap)
        h1, h2, st, en, rv, n, _, _ = (np.asarray(x) for x in sb)
        for i, s in enumerate(seqs):
            ks = o.kminmers(s, p)
            assert n[i] == len(ks), f"seq {i}: {n[i]} != {len(ks)}"
            for j, m in enumerate(ks):
                assert (int(h1[i, j]), int(h2[i, j])) == (m.h1, m.h2), (i, j)
                assert st[i, j] == m.start and en[i, j] == m.end, (i, j)
                assert bool(rv[i, j]) == m.rev, (i, j)
            # padding cleared
            assert (h1[i, len(ks):] == 0).all()

    def test_cap_clips_gracefully(self):
        p = Params(k=3, l=7, density=0.5)
        s = rand_codes(2000, seed=11)
        codes, lens = pad_batch([s], 2048)
        sb = seeding.seed_batch(codes, lens, p, 64)
        assert int(sb.n[0]) == 62  # cap minimizers at 64 -> 62 k-min-mers
        ks = o.kminmers(s, p)
        # the first 62 must still match the oracle exactly
        for j in range(62):
            assert (int(sb.h1[0, j]), int(sb.h2[0, j])) == (ks[j].h1, ks[j].h2)
