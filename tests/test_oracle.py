"""Self-consistency tests for the pure-Python oracle: these pin the numeric contract
every device kernel is differentially tested against."""

import numpy as np
import pytest

from mapquik_tpu.params import Params
from mapquik_tpu.oracle import pyref as o
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.eval.mapeval import evaluate_paf


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
    return comp[codes[::-1]]


def rand_codes(n, seed=0, p_hp=0.3):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    # inject homopolymer runs
    runs = rng.random(n) < p_hp
    for i in range(1, n):
        if runs[i]:
            codes[i] = codes[i - 1]
    return codes


class TestEncodeHpc:
    def test_encode(self):
        got = o.encode(b"ACGTacgtNnX-")
        np.testing.assert_array_equal(got, [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4, 4])

    def test_hpc_basic(self):
        codes = o.encode(b"AAACCGTTTTA")
        h, rs, re = o.hpc_compress(codes)
        np.testing.assert_array_equal(h, o.encode(b"ACGTA"))
        np.testing.assert_array_equal(rs, [0, 3, 5, 6, 10])
        np.testing.assert_array_equal(re, [3, 5, 6, 10, 11])

    def test_hpc_empty(self):
        h, rs, re = o.hpc_compress(np.zeros(0, dtype=np.uint8))
        assert h.shape == (0,) and rs.shape == (0,)

    def test_hpc_rc_symmetry(self):
        """HPC of RC == RC of HPC (sequence content, not positions)."""
        codes = rand_codes(500, seed=3)
        h1, _, _ = o.hpc_compress(revcomp_codes(codes))
        h2, _, _ = o.hpc_compress(codes)
        np.testing.assert_array_equal(h1, revcomp_codes(h2))


class TestNtHash:
    def test_shapes(self):
        codes = rand_codes(100)
        canon, fwd, valid = o.nthash32(codes, 31)
        assert canon.shape == (70,)
        assert valid.all()

    def test_too_short(self):
        canon, _, valid = o.nthash32(rand_codes(10), 31)
        assert canon.shape == (0,)

    def test_matches_direct_computation(self):
        """Prefix-XOR formulation == direct windowed definition."""
        l = 13
        codes = rand_codes(200, seed=7)
        canon, fwd, _ = o.nthash32(codes, l)
        for i in [0, 1, 5, 100, 187]:
            h = np.uint32(0)
            for j in range(l):
                h ^= o._rol32(o.SEED32[codes[i + j]], (l - 1 - j) % 32)
            assert fwd[i] == h, i

    def test_rc_symmetry(self):
        """canonical hash of an l-mer == canonical hash of its reverse complement."""
        l = 21
        codes = rand_codes(300, seed=11)
        canon, _, _ = o.nthash32(codes, l)
        rc = revcomp_codes(codes)
        canon_rc, _, _ = o.nthash32(rc, l)
        np.testing.assert_array_equal(canon, canon_rc[::-1])

    def test_invalid_bases_masked(self):
        codes = rand_codes(100, seed=5)
        codes[50] = o.INVALID
        _, _, valid = o.nthash32(codes, 31)
        assert not valid[20:51].any()
        assert valid[:20].all()
        assert valid[51:].all()

    def test_distribution(self):
        """Hashes should be roughly uniform (density predicate calibration)."""
        codes = rand_codes(200_000, seed=13, p_hp=0.0)
        canon, _, _ = o.nthash32(codes, 31)
        frac = (canon < np.uint32(0.01 * 2**32)).mean()
        # canonical = min(f, r) skews low: P[min < t] ~ 2d for small d
        assert 0.015 < frac < 0.025, frac


class TestMinimizersKminmers:
    def test_minimizer_rc_symmetry(self):
        p = Params(k=5, l=21, density=0.05)
        codes = rand_codes(5000, seed=17)
        h1, s1, e1 = o.minimizers(codes, p)
        h2, s2, e2 = o.minimizers(revcomp_codes(codes), p)
        n = codes.shape[0]
        np.testing.assert_array_equal(h1, h2[::-1])
        # positions mirror: start' = n - end, end' = n - start
        np.testing.assert_array_equal(s1, (n - e2)[::-1])
        np.testing.assert_array_equal(e1, (n - s2)[::-1])

    def test_kminmer_rc_invariance(self):
        """k-min-mer hashes of RC sequence == reversed hashes, rev flags flipped
        (except palindromic tuples)."""
        p = Params(k=4, l=15, density=0.08)
        codes = rand_codes(8000, seed=19)
        kf = o.kminmers(codes, p)
        kr = o.kminmers(revcomp_codes(codes), p)
        assert len(kf) == len(kr) > 10
        n = codes.shape[0]
        for a, b in zip(kf, kr[::-1]):
            assert (a.h1, a.h2) == (b.h1, b.h2)
            assert a.rev != b.rev or a.h1 == a.h2  # palindrome tolerance
            assert a.start == n - b.end
            assert a.end == n - b.start

    def test_offsets_sequential(self):
        p = Params(k=3, l=15, density=0.05)
        ks = o.kminmers(rand_codes(4000, seed=23), p)
        assert [m.offset for m in ks] == list(range(len(ks)))

    def test_short_seq_yields_nothing(self):
        p = Params()
        assert o.kminmers(rand_codes(p.l + p.k - 2), p) == []


class TestIndex:
    def test_tombstone(self):
        p = Params(k=3, l=15, density=0.1)
        codes = rand_codes(2000, seed=29)
        # duplicate the sequence -> every k-min-mer occurs twice -> all tombstoned
        idx = o.build_index([codes, codes.copy()], p)
        assert idx.n_unique() == 0
        ks = o.kminmers(codes, p)
        assert len(ks) > 0
        assert all(idx.get(m.key) is None for m in ks)

    def test_unique_retrieval(self):
        p = Params(k=3, l=15, density=0.1)
        codes = rand_codes(2000, seed=31)
        idx = o.build_index([codes], p)
        ks = o.kminmers(codes, p)
        hits = 0
        for m in ks:
            e = idx.get(m.key)
            if e is not None:
                assert e.start == m.start and e.offset == m.offset and e.rc == m.rev
                hits += 1
        assert hits > 0


class TestCheckQuirk:
    """Pin the Match::check precedence behavior (src/match.rs:39-43)."""

    def test_forward_bypasses_id_and_strand(self):
        q = o.Kminmer(0, 0, 0, 10, 5, False)
        prev = o.Entry(id=1, start=100, end=110, offset=7, rc=False)
        r_other_ref = o.Entry(id=2, start=900, end=910, offset=8, rc=True)
        # forward match: offset delta +1 suffices even across refs/strands (quirk)
        assert o._check(False, q, r_other_ref, prev, fix_bug=False)
        assert not o._check(False, q, r_other_ref, prev, fix_bug=True)

    def test_rc_requires_all(self):
        q = o.Kminmer(0, 0, 0, 10, 5, True)
        prev = o.Entry(id=1, start=100, end=110, offset=7, rc=False)
        r = o.Entry(id=1, start=90, end=100, offset=6, rc=False)
        assert o._check(True, q, r, prev, fix_bug=False)
        r_wrong_ref = o.Entry(id=2, start=90, end=100, offset=6, rc=False)
        assert not o._check(True, q, r_wrong_ref, prev, fix_bug=False)


class TestEndToEnd:
    def _run(self, p, genome_len=300_000, n_reads=40, accuracy=0.99, seed=5):
        contigs = markov_genome(genome_len, seed=seed)
        reads = simulate_reads(contigs, n_reads, mean_len=12000, accuracy=accuracy, seed=seed + 1)
        codes_contigs = [o.encode(s) for _, s in contigs]
        idx = o.build_index(codes_contigs, p)
        refs = [o.RefInfo(nm, len(s)) for nm, s in contigs]
        paf = []
        for name, seq in reads:
            line = o.map_read(name, o.encode(seq), idx, refs, p)
            if line:
                paf.append(line)
        return evaluate_paf(paf, n_reads=n_reads)

    def test_perfect_reads_all_correct(self):
        p = Params(k=5, l=17, density=0.03)
        res = self._run(p, accuracy=1.0)
        assert res.n_mapped == res.n_reads
        assert res.n_wrong == 0
        assert res.q60_total >= 0.9 * res.n_reads

    def test_hifi_reads_sensitivity(self):
        p = Params(k=5, l=17, density=0.03)
        res = self._run(p, accuracy=0.99, n_reads=60)
        assert res.n_wrong == 0
        assert res.n_mapped >= 0.95 * res.n_reads
        assert res.q60_wrong == 0

    def test_self_mapping_ecoli_reads(self):
        """Index the bundled real E. coli reads as 'contigs'; each read must map to
        itself (the genome itself is not in the mount — SURVEY.md §4.1)."""
        from mapquik_tpu.io.fastx import iter_fasta

        recs = list(iter_fasta("/root/reference/example/nearperfect-ecoli.100.fa"))[:12]
        p = Params(k=8, l=16, density=0.01, g=100)
        codes = [o.encode(s) for _, s in recs]
        idx = o.build_index(codes, p)
        refs = [o.RefInfo(nm, len(s)) for nm, s in recs]
        n_self = 0
        for i, (name, seq) in enumerate(recs):
            line = o.map_read(name, codes[i], idx, refs, p)
            if line is None:
                continue
            ls = line.split("\t")
            if ls[5] == name:
                n_self += 1
                assert int(ls[11]) == 60
        assert n_self >= 10  # reads overlapping others may tombstone some seeds
