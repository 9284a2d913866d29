"""End-to-end CLI tests (CPU backend): flag parity surface, PAF output, stats file,
index save/load, sharding, oracle-backend agreement."""

import os
import subprocess
import sys

import numpy as np
import pytest

from mapquik_tpu.cli import main as cli_main
from mapquik_tpu.eval.mapeval import evaluate_paf
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.io.fastx import write_fasta

ARGS = ["-k", "5", "-l", "17", "-d", "0.05", "--batch-size", "32", "--max-read-len", "4096"]


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    genome = markov_genome(150_000, seed=31, n_contigs=2)
    reads = simulate_reads(genome, 24, mean_len=2500, accuracy=0.99, seed=32)
    ref = str(d / "genome.fa")
    rd = str(d / "reads.fq")
    write_fasta(ref, genome)
    with open(rd, "w") as f:
        for n, s in reads:
            s = s.decode() if isinstance(s, bytes) else s
            f.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    return d, ref, rd, len(reads)


def test_jax_backend_end_to_end(data):
    d, ref, rd, n = data
    prefix = str(d / "out")
    rc = cli_main([rd, "--reference", ref, "-p", prefix, *ARGS, "--read-stats"])
    assert rc == 0
    lines = open(prefix + ".paf").read().strip().split("\n")
    res = evaluate_paf(lines, n_reads=n)
    assert res.n_wrong == 0 and res.n_mapped >= 0.8 * n
    stats = open(prefix + ".read_stats").read().strip().split("\n")
    assert len(stats) == n and all(":" in s for s in stats)


def test_oracle_backend_agrees(data):
    d, ref, rd, n = data
    pj = str(d / "outj")
    po = str(d / "outo")
    assert cli_main([rd, "--reference", ref, "-p", pj, *ARGS]) == 0
    assert cli_main([rd, "--reference", ref, "-p", po, *ARGS, "--backend", "oracle"]) == 0
    jx = sorted(open(pj + ".paf").read().strip().split("\n"))
    orc = sorted(open(po + ".paf").read().strip().split("\n"))
    assert jx == orc


def test_save_load_index_and_shards(data):
    d, ref, rd, n = data
    idx = str(d / "idx.npz")
    p0 = str(d / "w")
    assert cli_main([rd, "--reference", ref, "-p", p0, *ARGS, "--save-index", idx]) == 0
    whole = sorted(open(p0 + ".paf").read().strip().split("\n"))
    shard_lines = []
    for s in range(3):
        ps = str(d / "s")
        assert cli_main(
            [rd, "--reference", ref, "-p", ps, *ARGS, "--load-index", idx, "--shard", f"{s}/3"]
        ) == 0
        shard_lines.extend(open(f"{ps}.shard{s}of3.paf").read().strip().split("\n"))
    assert sorted(x for x in shard_lines if x) == whole


def test_defaults_warning_and_prefix(data, capsys, tmp_path, monkeypatch):
    d, ref, rd, n = data
    monkeypatch.chdir(tmp_path)
    rc = cli_main([rd, "--reference", ref, "--batch-size", "32", "--max-read-len", "4096"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Warning: Using default k value (5)." in out
    assert "Warning: Using default output prefix (mapquik-k5-d0.01-l31)." in out
    assert os.path.exists("mapquik-k5-d0.01-l31.paf")
