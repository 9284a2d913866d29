"""Auxiliary subsystems: read stats, PAF concordance, index serialization,
byte-range input sharding."""

import os

import numpy as np
import pytest

from mapquik_tpu.eval.concordance import compare, overlap_frac, parse_paf_targets
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.index.build import build_index
from mapquik_tpu.index.serialize import load_index, params_key, save_index
from mapquik_tpu.io import fastx
from mapquik_tpu.io.shard import iter_fastx_shard
from mapquik_tpu.params import Params

P_SMALL = Params(
    k=4, l=13, density=0.05,
    ref_window=1 << 12, ref_halo=1 << 10, ref_window_minimizers=1 << 9,
    max_read_len=1 << 11, max_minimizers=1 << 7,
)


def _loci_oracle(pairs, dist=48_000):
    """Reference stats.rs:72-94 jump counting over (rid, start) hit pairs."""
    pairs = sorted(pairs)
    n, prev = 0, None
    for a, b in pairs:
        if prev is None or a != prev[0] or b - prev[1] > dist:
            n += 1
        prev = (a, b)
    return n


def test_count_loci_matches_bruteforce():
    from mapquik_tpu.ops.stats import count_loci

    rng = np.random.default_rng(0)
    B, M = 8, 64
    hit = rng.random((B, M)) < 0.4
    valid = np.arange(M)[None, :] < rng.integers(10, M, size=(B, 1))
    rid = rng.integers(0, 3, size=(B, M)).astype(np.int32)
    start = rng.integers(0, 200_000, size=(B, M)).astype(np.int32)
    got = np.asarray(count_loci(hit, rid, start, valid))
    for b in range(B):
        pairs = [
            (int(rid[b, j]), int(start[b, j]))
            for j in range(M)
            if hit[b, j] and valid[b, j]
        ]
        assert got[b] == _loci_oracle(pairs), b


def test_read_stats_batch_runs(tmp_path):
    import jax.numpy as jnp

    from mapquik_tpu.ops.stats import StatsWriter, read_stats_batch
    from mapquik_tpu.oracle.pyref import encode

    p = P_SMALL
    genome = markov_genome(60_000, seed=5)
    reads = simulate_reads(genome, 8, mean_len=1500, accuracy=0.99, seed=6)
    index, meta = build_index(genome, p)
    B, L = 8, p.max_read_len
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (_, s) in enumerate(reads):
        c = encode(s)[:L]
        codes[i, : len(c)] = c
        lens[i] = len(c)
    loci = np.asarray(read_stats_batch(jnp.asarray(codes), jnp.asarray(lens), index, p, p.max_minimizers))
    # simulated reads from a 60kb genome: every read should have >= 1 candidate locus
    assert (loci >= 1).all()
    # most reads should hit exactly one locus (unique-seed index, small genome)
    assert (loci == 1).sum() >= 5
    w = StatsWriter(str(tmp_path / "x"))
    w.write_batch([n for n, _ in reads], loci)
    w.close()
    lines = open(w.path).read().strip().split("\n")
    assert len(lines) == 8 and lines[0].endswith(f": {loci[0]}")


def test_overlap_frac_and_compare():
    assert overlap_frac(0, 100, 50, 150) == pytest.approx(50 / 150)
    assert overlap_frac(0, 100, 200, 300) == 0.0
    paf1 = parse_paf_targets(
        [
            "r1\t100\t0\t99\t+\tc1\t1000\t100\t200\t50\t1000\t60",
            "r2\t100\t0\t99\t+\tc1\t1000\t500\t600\t50\t1000\t60",
            "r3\t100\t0\t99\t+\tc2\t1000\t0\t100\t50\t1000\t60",
        ]
    )
    paf2 = parse_paf_targets(
        [
            "r1\t100\t0\t99\t+\tc1\t1000\t120\t220\t50\t1000\t60",  # concordant
            "r2\t100\t0\t99\t+\tc1\t1000\t5000\t5100\t50\t1000\t60",  # same chr, far
            "r3\t100\t0\t99\t+\tc9\t1000\t0\t100\t50\t1000\t60",  # diff chr
            "r4\t100\t0\t99\t+\tc1\t1000\t0\t100\t50\t1000\t60",  # only in 2
        ]
    )
    res = compare(paf1, paf2)
    assert res.concordant == 1
    assert res.discordant_same_chr == 1
    assert res.discordant_diff_chr == 1
    assert res.only_in_1 == 0 and res.only_in_2 == 1


def test_index_serialize_roundtrip(tmp_path):
    p = P_SMALL
    genome = markov_genome(50_000, seed=7)
    index, meta = build_index(genome, p)
    path = str(tmp_path / "idx.npz")
    save_index(path, index, meta, params_key(p))
    idx2, meta2 = load_index(path, params_key(p))
    assert type(idx2) is type(index)
    assert idx2.n == index.n
    assert meta2.names == meta.names
    for a, b in zip(index, idx2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        load_index(path, "k9-l21-d0.5-hpc0")


def _write_reads(path, records, fastq):
    with open(path, "w") as f:
        for name, seq in records:
            if fastq:
                f.write(f"@{name} extra\n{seq}\n+\n{'I' * len(seq)}\n")
            else:
                f.write(f">{name} extra\n{seq}\n")


@pytest.mark.parametrize("fastq", [True, False])
@pytest.mark.parametrize("n_shards", [1, 3, 4])
def test_shard_partition_exact(tmp_path, fastq, n_shards):
    rng = np.random.default_rng(3)
    records = [
        (f"r{i}", "".join(rng.choice(list("ACGT"), size=rng.integers(50, 400))))
        for i in range(37)
    ]
    path = str(tmp_path / ("reads.fastq" if fastq else "reads.fasta"))
    _write_reads(path, records, fastq)
    whole = list(fastx.iter_fastx(path))
    assert [n for n, _ in whole] == [n for n, _ in records]
    got = []
    for s in range(n_shards):
        got.extend(iter_fastx_shard(path, s, n_shards))
    assert [n for n, _ in got] == [n for n, _ in records]
    assert all(g[1] == w[1] for g, w in zip(got, whole))


def test_shard_fastq_quality_at_signs(tmp_path):
    # quality lines full of '@' must not be mistaken for headers
    path = str(tmp_path / "tricky.fastq")
    with open(path, "w") as f:
        for i in range(20):
            f.write(f"@r{i}\n{'ACGT' * 30}\n+\n{'@' * 120}\n")
    got = []
    for s in range(5):
        got.extend(iter_fastx_shard(path, s, 5))
    assert [n for n, _ in got] == [f"r{i}" for i in range(20)]


def test_shard_fastq_plus_description(tmp_path):
    # valid FASTQ allows '+description' separator lines; shard offsets must use
    # the separator's real length or boundary records get double-owned
    path = str(tmp_path / "plusdesc.fastq")
    with open(path, "w") as f:
        for i in range(24):
            seq = "ACGT" * (20 + i)
            f.write(f"@r{i}\n{seq}\n+r{i} description text\n{'I' * len(seq)}\n")
    for n_shards in (2, 3, 5):
        got = []
        for s in range(n_shards):
            got.extend(iter_fastx_shard(path, s, n_shards))
        assert [n for n, _ in got] == [f"r{i}" for i in range(24)], n_shards


def test_index_load_refuses_pickles(tmp_path):
    # saved indexes must be loadable with allow_pickle=False (a shared index
    # file must never be able to execute code)
    p = Params(k=5, l=17, density=0.05, max_read_len=1 << 13)
    genome = [("ctgA", b"ACGTTGCA" * 800), ("ctgB", b"TTGACCAG" * 700)]
    idx, meta = build_index(genome, p)
    path = str(tmp_path / "idx.npz")
    save_index(path, idx, meta, params_key(p))
    idx2, meta2 = load_index(path, params_key(p))
    assert meta2.names == meta.names
    z = np.load(path, allow_pickle=False)  # must not raise
    assert str(z["names"].dtype).startswith("<U") or z["names"].dtype.kind == "U"


def test_params_auto_derives_halo():
    # low density -> long k-min-mer spans -> auto must widen ref_halo
    p = Params.auto(k=7, density=0.001)
    assert p.ref_halo >= 4 * int((p.k - 1) / p.density)
    assert p.ref_window >= p.ref_halo
    # and a manifestly unsafe halo is rejected outright
    with pytest.raises(ValueError, match="ref_halo"):
        Params(k=7, density=0.0005)


def test_lz4_roundtrip_fastx(tmp_path):
    from mapquik_tpu.io import lz4frame

    if not lz4frame.available():
        pytest.skip("liblz4 not present")
    recs = [(f"r{i}", "ACGTTGCA" * (20 + i)) for i in range(10)]
    plain = "".join(f">{n} x\n{s}\n" for n, s in recs).encode()
    path = str(tmp_path / "reads.fa.lz4")
    with open(path, "wb") as f:
        f.write(lz4frame.compress(plain))
    got = list(fastx.iter_fastx(path))
    assert [n for n, _ in got] == [n for n, _ in recs]
    assert all(g.decode() == s for (_, g), (_, s) in zip(got, recs))


def test_simulate_depth_parameterization():
    from mapquik_tpu.eval.simulate import simulate_depth

    genome = markov_genome(240_000, seed=13, n_contigs=2)
    reads = simulate_depth(genome, depth=10, mean_len=3000, seed=14)
    assert len(reads) == 800  # 10 * 240000 / 3000
    total = sum(len(s) for _, s in reads)
    assert 0.8 < total / (10 * 240_000) < 1.2  # ~10x coverage
