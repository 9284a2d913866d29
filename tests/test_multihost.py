"""Genuine multi-process jax.distributed bring-up: two OS processes, one
coordinator, byte-range input shards, concatenated PAF == single-process PAF.

Round-1 gap: parallel/multihost.init_distributed's success path had never
executed. Here both workers must report distributed mode active with
process_count == 2, and the shard outputs must reassemble exactly."""

import os
import socket
import subprocess
import sys

import pytest

from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.io.fastx import write_fasta

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from mapquik_tpu.parallel.multihost import host_shard, init_distributed, run_host_shard
from mapquik_tpu.io import fastx
from mapquik_tpu.ops.pipeline import Mapper
from mapquik_tpu.params import Params

active = init_distributed()
assert active, "init_distributed must report active"
assert jax.process_count() == 2, jax.process_count()
i, n = host_shard()
assert n == 2
p = Params(k=5, l=17, density=0.05, max_read_len=4096, batch_size=8,
           ref_window=1 << 13, ref_halo=1 << 12, ref_window_minimizers=1 << 11,
           max_minimizers=1 << 9)
genome = list(fastx.iter_fastx({genome!r}))
mapper = Mapper(genome, p)
out = run_host_shard({reads!r}, mapper, {prefix!r})
print("WORKER_OK", i, out, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shards_reassemble(tmp_path):
    genome = markov_genome(60_000, seed=5, n_contigs=2)
    reads = simulate_reads(genome, 24, mean_len=2000, accuracy=0.99, seed=6)
    gpath = str(tmp_path / "g.fa")
    rpath = str(tmp_path / "r.fa")
    write_fasta(gpath, genome)
    write_fasta(rpath, reads)
    prefix = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.format(repo=repo, genome=gpath, reads=rpath, prefix=prefix)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            MAPQUIK_COORDINATOR=f"127.0.0.1:{port}",
            MAPQUIK_NUM_PROCESSES="2",
            MAPQUIK_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for pr in procs:
        out, err = pr.communicate(timeout=540)
        assert pr.returncode == 0, f"worker failed:\n{out}\n{err}"
        assert "WORKER_OK" in out
        outs.append(out)

    shard_lines = []
    for pid in range(2):
        with open(f"{prefix}.shard{pid}of2.paf") as f:
            shard_lines.extend(ln.rstrip("\n") for ln in f if ln.strip())

    # reference: single-process mapping of the whole file
    import jax

    from mapquik_tpu.io import fastx
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    p = Params(k=5, l=17, density=0.05, max_read_len=4096, batch_size=8,
               ref_window=1 << 13, ref_halo=1 << 12,
               ref_window_minimizers=1 << 11, max_minimizers=1 << 9)
    mapper = Mapper(list(fastx.iter_fastx(gpath)), p)
    whole = list(mapper.map_reads(fastx.iter_fastx(rpath)))
    assert len(whole) >= 15
    assert sorted(shard_lines) == sorted(whole)
