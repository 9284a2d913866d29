"""Hash-sharded index mode: exact equivalence with the replicated-index path on a
virtual mesh (the scale-out backend for references too large to replicate)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.index.build import build_index
from mapquik_tpu.index.lookup import dedup_host
from mapquik_tpu.ops.pipeline import map_batch
from mapquik_tpu.oracle.pyref import encode
from mapquik_tpu.params import Params
from mapquik_tpu.parallel.mesh import make_mesh
from mapquik_tpu.parallel.sharded_index import (
    ShardedHashIndex, build_sharded_index, map_batch_hash_sharded,
)

P_ = Params(
    k=5, l=17, density=0.05,
    ref_window=1 << 13, ref_halo=1 << 11, ref_window_minimizers=1 << 9,
    max_read_len=1 << 12, max_minimizers=1 << 8,
)


@pytest.fixture(scope="module")
def setup():
    genome = markov_genome(150_000, seed=201, n_contigs=3)
    reads = simulate_reads(genome, 32, mean_len=2500, accuracy=0.99, seed=202)
    index, meta = build_index(genome, P_)
    # raw columns for the sharded build
    from mapquik_tpu.index.build import extract_contig_kminmers

    cols = {k: [] for k in ("h1", "h2", "rid", "st", "en", "off", "rc")}
    for rid_, (nm, seq) in enumerate(genome):
        codes = encode(seq)
        h1, h2, st, en, off, rv = extract_contig_kminmers(codes, P_)
        cols["h1"].append(h1); cols["h2"].append(h2)
        cols["rid"].append(np.full(h1.shape[0], rid_, np.int64))
        cols["st"].append(st); cols["en"].append(en)
        cols["off"].append(off); cols["rc"].append(rv)
    cat = {k: np.concatenate(v) for k, v in cols.items()}
    d = dedup_host(cat["h1"].astype(np.uint32), cat["h2"].astype(np.uint32),
                   cat["rid"], cat["st"], cat["en"], cat["off"], cat["rc"])
    B, L = 32, P_.max_read_len
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (_, s) in enumerate(reads):
        c = encode(s)[:L]
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return index, meta, d, codes, lens


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_equals_replicated(setup, n_dev):
    index, meta, d, codes, lens = setup
    mesh = make_mesh(n_dev)
    sidx = build_sharded_index(
        d[0], d[1],
        d[2].astype(np.int32), d[3].astype(np.int32), d[4].astype(np.int32),
        d[5].astype(np.int32), d[6], n_shards=n_dev,
    )
    assert sidx.n == index.n
    ref_lens = meta.lengths.astype(np.int32)
    got = map_batch_hash_sharded(mesh, codes, lens, sidx, ref_lens, P_, P_.max_minimizers)
    want = map_batch(jnp.asarray(codes), jnp.asarray(lens), index,
                     jnp.asarray(ref_lens), P_, P_.max_minimizers)
    for name in ("mapped", "rc", "q_start", "q_end", "rid", "r_start", "r_end",
                 "score", "mapq"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, name)), np.asarray(getattr(want, name)), err_msg=name
        )
    assert int(np.asarray(got.mapped).sum()) >= 28
