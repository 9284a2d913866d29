"""Differential tests: device index build + full mapping pipeline vs the oracle."""

import numpy as np
import pytest

from mapquik_tpu.params import Params
from mapquik_tpu.oracle import pyref as o
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.eval.mapeval import evaluate_paf
from mapquik_tpu.index.build import build_index
from mapquik_tpu.ops.pipeline import Mapper

P = Params(
    k=5, l=17, density=0.05,
    ref_window=1 << 14, ref_halo=1 << 12, ref_window_minimizers=1 << 12,
    max_read_len=1 << 13, max_minimizers=1 << 9, batch_size=16,
)


@pytest.fixture(scope="module")
def genome():
    return markov_genome(120_000, seed=101, n_contigs=3)


@pytest.fixture(scope="module")
def reads(genome):
    return simulate_reads(genome, 48, mean_len=5000, accuracy=0.99, seed=7)


class TestIndexBuild:
    def test_matches_oracle_index(self, genome):
        """Windowed device extraction + sort/dedup == oracle whole-contig dict index."""
        index, meta = build_index(genome, P, backend="sorted")
        oidx = o.build_index([o.encode(s) for _, s in genome], P)
        # oracle unique entries
        want = {}
        for key, e in oidx.items():
            if e is not None:
                want[key] = (e.id, e.start, e.end, e.offset, e.rc)
        h1 = np.asarray(index.h1, dtype=np.uint64)
        h2 = np.asarray(index.h2, dtype=np.uint64)
        keys = (h1 << 32) | h2
        got = {}
        rid = np.asarray(index.rid)
        st = np.asarray(index.start)
        en = np.asarray(index.end)
        off = np.asarray(index.offset)
        rc = np.asarray(index.rc)
        for i in range(keys.shape[0]):
            got[int(keys[i])] = (int(rid[i]), int(st[i]), int(en[i]), int(off[i]), bool(rc[i]))
        assert len(got) == len(want)
        assert got == want

    def test_sorted_unique(self, genome):
        index, _ = build_index(genome, P, backend="sorted")
        h1 = np.asarray(index.h1, dtype=np.uint64)
        h2 = np.asarray(index.h2, dtype=np.uint64)
        keys = (h1 << 32) | h2
        assert (np.diff(keys.astype(np.int64)) > 0).all() or keys.shape[0] < 2


class TestDeviceBuild:
    def test_device_build_equals_host_build(self, genome):
        """The zero-pull device-resident builder must store exactly the host
        builder's key set and return identical probe results (slot order may
        differ; probes are order-blind)."""
        import jax.numpy as jnp

        from mapquik_tpu.index.device_build import build_index_device
        from mapquik_tpu.index.hashtable import NCOL, probe_hash

        host_idx, host_meta = build_index(genome, P, backend="hash", device=False)
        got = build_index_device(genome, P)
        assert got is not None
        dev_idx, dev_meta = got
        assert dev_meta.names == host_meta.names
        np.testing.assert_array_equal(dev_meta.lengths, host_meta.lengths)
        assert dev_idx.n == host_idx.n > 0
        rng = np.random.default_rng(1)
        hk = np.asarray(host_idx.keys).reshape(-1, 2).astype(np.uint32)
        real = hk[(hk[:, 0] != 0xFFFFFFFF) | (hk[:, 1] != 0xFFFFFFFF)]
        nq = 512
        take = rng.integers(0, real.shape[0], nq // 2)
        qh1 = np.concatenate([
            real[take, 0], rng.integers(0, 2**32, nq // 2, dtype=np.uint32)
        ]).reshape(2, -1)
        qh2 = np.concatenate([
            real[take, 1], rng.integers(0, 2**32, nq // 2, dtype=np.uint32)
        ]).reshape(2, -1)
        ph = probe_hash(host_idx, jnp.asarray(qh1), jnp.asarray(qh2))
        pd = probe_hash(dev_idx, jnp.asarray(qh1), jnp.asarray(qh2))
        np.testing.assert_array_equal(np.asarray(ph.hit), np.asarray(pd.hit))
        assert np.asarray(ph.hit)[0].all()
        hit = np.asarray(ph.hit)
        for name in ("rid", "start", "end", "offset", "rc"):
            a, b = getattr(ph, name), getattr(pd, name)
            np.testing.assert_array_equal(
                np.asarray(a)[hit], np.asarray(b)[hit], err_msg=name
            )

    def test_device_build_pipeline_paf_identical(self, genome, reads):
        """Full pipeline over a device-built index == oracle PAF."""
        from mapquik_tpu.index.build import build_index as bi
        from mapquik_tpu.index.device_build import build_index_device
        from mapquik_tpu.ops.pipeline import Mapper

        got = build_index_device(genome, P)
        assert got is not None
        idx, meta = got
        mapper = Mapper.from_index(idx, meta, P)
        device_lines = sorted(mapper.map_reads(reads))
        ref_mapper = Mapper(genome, P)
        assert sorted(ref_mapper.map_reads(reads)) == device_lines
        assert len(device_lines) > 30


class TestHashIndex:
    def test_probe_equals_sorted_backend(self, genome):
        """Two-choice hash table returns identical probe results to binary search."""
        import jax.numpy as jnp
        from mapquik_tpu.index.lookup import probe
        from mapquik_tpu.index.hashtable import probe_hash

        sorted_idx, _ = build_index(genome, P, backend="sorted")
        hash_idx, _ = build_index(genome, P, backend="hash")
        assert hash_idx.n == sorted_idx.n > 0
        rng = np.random.default_rng(0)
        # half real keys, half random (mostly misses)
        nq = 512
        take = rng.integers(0, sorted_idx.n, nq // 2)
        qh1 = np.concatenate([
            np.asarray(sorted_idx.h1)[take],
            rng.integers(0, 2**32, nq // 2, dtype=np.uint32),
        ]).reshape(2, -1)
        qh2 = np.concatenate([
            np.asarray(sorted_idx.h2)[take],
            rng.integers(0, 2**32, nq // 2, dtype=np.uint32),
        ]).reshape(2, -1)
        ps = probe(sorted_idx, jnp.asarray(qh1), jnp.asarray(qh2))
        ph = probe_hash(hash_idx, jnp.asarray(qh1), jnp.asarray(qh2))
        np.testing.assert_array_equal(np.asarray(ps.hit), np.asarray(ph.hit))
        assert np.asarray(ps.hit)[0].all()
        hit = np.asarray(ps.hit)
        for a, b in zip(ps[1:], ph[1:]):
            np.testing.assert_array_equal(np.asarray(a)[hit], np.asarray(b)[hit])


class TestSortJoinProbe:
    def test_sortjoin_equals_binary_search(self, genome):
        """Merge-join probe (lookup.probe_sortjoin) is exact vs binary search.
        (Measured SLOWER in-situ than the hash backend at bench table size —
        kept as a reference implementation; see DESIGN.md round-3 rejected.)"""
        import jax.numpy as jnp
        from mapquik_tpu.index.lookup import probe, probe_sortjoin

        idx, _ = build_index(genome, P, backend="sorted")
        rng = np.random.default_rng(4)
        take = rng.integers(0, idx.n, 300)
        qh1 = np.concatenate([
            np.asarray(idx.h1)[take],
            rng.integers(0, 2**32, 212, dtype=np.uint32),
        ]).reshape(4, 128)
        qh2 = np.concatenate([
            np.asarray(idx.h2)[take],
            rng.integers(0, 2**32, 212, dtype=np.uint32),
        ]).reshape(4, 128)
        a = probe(idx, jnp.asarray(qh1), jnp.asarray(qh2))
        b = probe_sortjoin(idx, jnp.asarray(qh1), jnp.asarray(qh2))
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        hit = np.asarray(a.hit)
        assert hit.sum() >= 300
        for f in ("rid", "start", "end", "offset", "rc"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f))[hit], np.asarray(getattr(b, f))[hit],
                err_msg=f,
            )


class TestPipelineVsOracle:
    def test_paf_identical(self, genome, reads):
        mapper = Mapper(genome, P)
        device_lines = list(mapper.map_reads(reads))

        codes_contigs = [o.encode(s) for _, s in genome]
        oidx = o.build_index(codes_contigs, P)
        refs = [o.RefInfo(nm, len(s)) for nm, s in genome]
        oracle_lines = []
        for name, seq in reads:
            ln = o.map_read(name, o.encode(seq), oidx, refs, P)
            if ln:
                oracle_lines.append(ln)
        assert len(oracle_lines) > 30  # sanity: most reads map
        assert device_lines == oracle_lines

    def test_accuracy(self, genome, reads):
        mapper = Mapper(genome, P)
        res = evaluate_paf(mapper.map_reads(reads), n_reads=len(reads))
        assert res.n_wrong == 0
        assert res.n_mapped >= 0.9 * res.n_reads

    def test_degenerate_reads(self, genome):
        mapper = Mapper(genome, P)
        weird = [
            ("empty", b""),
            ("short", b"ACGT"),
            ("ns", b"N" * 500),
            ("random", bytes(np.frombuffer(b"ACGT", np.uint8)[
                np.random.default_rng(0).integers(0, 4, 3000, dtype=np.uint8)])),
        ]
        assert list(mapper.map_reads(weird)) == []


class TestNoHpc:
    def test_nohpc_paf_identical_to_oracle(self, genome, reads):
        # nohpc yields ~1/0.75x more minimizers per base: needs a larger cap
        p_nohpc = Params(**{**P.__dict__, "use_hpc": False, "max_minimizers": 1 << 10})
        mapper = Mapper(genome, p_nohpc)
        device_lines = sorted(mapper.map_reads(reads))
        oidx = o.build_index([o.encode(s) for _, s in genome], p_nohpc)
        refs = [o.RefInfo(nm, len(s)) for nm, s in genome]
        oracle_lines = sorted(
            ln for name, seq in reads
            if (ln := o.map_read(name, o.encode(seq), oidx, refs, p_nohpc))
        )
        assert len(oracle_lines) > 30
        assert device_lines == oracle_lines


class TestCheckBugToggle:
    def test_fixed_semantics_also_maps(self, genome, reads):
        p_fixed = Params(**{**P.__dict__, "fix_check_bug": True})
        mapper = Mapper(genome, p_fixed)
        res = evaluate_paf(mapper.map_reads(reads), n_reads=len(reads))
        assert res.n_wrong == 0
        assert res.n_mapped >= 0.9 * res.n_reads


class TestRealSequenceSelfMapping:
    def test_device_self_mapping_ecoli_reads(self):
        """Device pipeline on REAL E. coli HiFi sequence (the bundled reference
        example reads; the genome itself is a missing blob — SURVEY.md §4.1):
        index the reads as contigs, map them against themselves, and require
        string-identical PAF vs the oracle plus self-hits at Q60."""
        import os

        path = "/root/reference/example/nearperfect-ecoli.100.fa"
        if not os.path.exists(path):
            import pytest

            pytest.skip("reference example reads not mounted")
        from mapquik_tpu.io.fastx import iter_fasta

        recs = list(iter_fasta(path))[:12]
        p = Params.auto(k=8, l=16, density=0.01, g=100,
                        max_read_len=1 << 15, batch_size=12)
        mapper = Mapper(recs, p)
        device = sorted(mapper.map_reads(recs))
        oidx = o.build_index([o.encode(s) for _, s in recs], p)
        refs = [o.RefInfo(nm, len(s)) for nm, s in recs]
        oracle = sorted(
            ln for nm, s in recs if (ln := o.map_read(nm, o.encode(s), oidx, refs, p))
        )
        assert device == oracle
        n_self = sum(1 for ln in device
                     if ln.split("\t")[0] == ln.split("\t")[5]
                     and ln.split("\t")[11] == "60")
        assert n_self >= 10


class TestOverflowRetry:
    def test_tiny_cap_still_oracle_identical(self, genome, reads):
        """A cap small enough to clip most reads must trigger the doubled-cap
        remap (ops/pipeline.py finalize) and still emit oracle-identical PAF —
        never a clipped mapping (the repo invariant: silent clipping = silent
        wrong output)."""
        p_tiny = Params(**{**P.__dict__, "max_minimizers": 64})
        ref_mapper = Mapper(genome, P)
        mapper = Mapper.from_index(ref_mapper.index, ref_mapper.meta, p_tiny)
        lines_tiny = sorted(mapper.map_reads(reads))
        lines_ref = sorted(ref_mapper.map_reads(reads))
        assert lines_tiny == lines_ref
        assert len(lines_tiny) > 30

    def test_overflow_actually_fires(self, genome, reads, capsys):
        import sys

        p_tiny = Params(**{**P.__dict__, "max_minimizers": 64})
        ref_mapper = Mapper(genome, P)
        mapper = Mapper.from_index(ref_mapper.index, ref_mapper.meta, p_tiny)
        list(mapper.map_reads(reads))
        err = capsys.readouterr().err
        assert "clipped" in err and "remapping" in err


class TestHaloDropRetry:
    def test_small_halo_retries_to_exact_index(self):
        """A halo below the typical k-min-mer span must be DETECTED (via
        SeedBatch.tail_start) and retried with a doubled halo until the index
        equals whole-contig extraction (index/build.py drop detection)."""
        from mapquik_tpu.eval.simulate import markov_genome
        from mapquik_tpu.index.build import extract_contig_kminmers

        genome = markov_genome(60_000, seed=31, n_contigs=1)
        codes = o.encode(genome[0][1])
        # low density -> long spans; min_ref_halo = (k-1)/d + l = 431
        p_small = Params(
            k=5, l=31, density=0.01, ref_window=2048, ref_halo=512,
            ref_window_minimizers=1 << 10, max_read_len=1 << 13,
        )
        # whole-contig ground truth: one window covering everything
        p_whole = Params(**{**p_small.__dict__, "ref_window": 1 << 17,
                            "ref_halo": 8192})
        got = extract_contig_kminmers(codes, p_small)
        want = extract_contig_kminmers(codes, p_whole)
        assert got[0].shape[0] == want[0].shape[0] > 100
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


class TestLongReads:
    def test_50kb_read_maps_full_length(self, genome):
        """Reads past the 32 kb fast-path bin auto-route to the 64 kb XLA bin
        and map FULL-LENGTH with oracle-identical PAF (the reference has no
        length cap, src/mers.rs:41-54; round 2 truncated at 32 kb by default —
        VERDICT r2 Missing #3)."""
        import sys

        big = markov_genome(400_000, seed=33, n_contigs=1)
        reads = simulate_reads(big, 6, mean_len=50_000, accuracy=0.995, seed=34)
        assert max(len(s) for _, s in reads) > (1 << 15)
        p = Params(**{**P.__dict__, "max_read_len": 1 << 16,
                      "length_bins": (P.max_read_len,), "batch_size": 4,
                      "max_minimizers": 1 << 11})
        m = Mapper(big, p)
        got = sorted(m.map_reads(reads))
        oidx = o.build_index([o.encode(s) for _, s in big], p)
        refs = [o.RefInfo(nm, len(s)) for nm, s in big]
        want = sorted(
            ln for name, seq in reads
            for ln in [o.map_read(name, o.encode(seq), oidx, refs, p)] if ln
        )
        assert got == want
        assert len(got) >= 5
        # full length reported in the PAF (no truncation at 32768)
        assert any(int(line.split("\t")[1]) > (1 << 15) for line in got)


class TestWaveDispatch:
    def test_wave_equals_overlap_path(self, genome, monkeypatch):
        """Serial wave dispatch (upload-all/dispatch-all/one pull per wave)
        must yield the same PAF line set as the overlap (fire-and-forget)
        worker path; enough batches that multi-group waves actually form
        (B=16, G=4 -> 64 reads per group job, 384 reads = 6 jobs)."""
        reads = simulate_reads(genome, 384, mean_len=3000, accuracy=0.99, seed=31)
        m = Mapper(genome, P)
        monkeypatch.setenv("MAPQUIK_DISPATCH", "serial")
        a = sorted(m.map_reads(reads))
        monkeypatch.setenv("MAPQUIK_DISPATCH", "overlap")
        b = sorted(m.map_reads(reads))
        assert len(a) > 360
        assert a == b


class TestLengthBins:
    def test_binned_output_equals_unbinned(self, genome):
        """Mixed-length reads through length bins: same PAF line set as single-bin."""
        reads = simulate_reads(genome, 24, mean_len=1500, accuracy=0.99, seed=21)
        reads += simulate_reads(genome, 24, mean_len=6000, accuracy=0.99, seed=22)
        p1 = Params(**{**P.__dict__})
        p2 = Params(**{**P.__dict__, "length_bins": (2048,)})
        m1 = Mapper(genome, p1)
        m2 = Mapper.from_index(m1.index, m1.meta, p2)
        a = sorted(m1.map_reads(reads))
        b = sorted(m2.map_reads(reads))
        assert len(a) > 40
        assert a == b
