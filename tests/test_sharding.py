"""Multi-device tests on the virtual 8-device CPU mesh: sharded mapping must equal
single-device mapping exactly; sharded index extraction must match unsharded."""

import numpy as np
import pytest

import jax

from mapquik_tpu.params import Params
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.index.build import build_index
from mapquik_tpu.oracle.pyref import encode
from mapquik_tpu.ops.pipeline import map_batch
from mapquik_tpu.ops.seeding import seed_batch
from mapquik_tpu.parallel import mesh as pm

P = Params(
    k=5, l=17, density=0.05,
    ref_window=1 << 13, ref_halo=1 << 11, ref_window_minimizers=1 << 10,
    max_read_len=1 << 12, max_minimizers=1 << 8,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    genome = markov_genome(60_000, seed=3)
    reads = simulate_reads(genome, 16, mean_len=3000, accuracy=0.99, seed=4)
    index, meta = build_index(genome, P)
    B, L = 16, P.max_read_len
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (_, s) in enumerate(reads):
        c = encode(s)[:L]
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return genome, index, meta, codes, lens


def test_sharded_mapping_equals_single_device(setup):
    genome, index, meta, codes, lens = setup
    ref_lens = meta.lengths.astype(np.int32)
    mesh = pm.make_mesh(8)
    res_s, n_mapped = pm.map_batch_sharded(
        mesh, codes, lens, index, ref_lens, P, P.max_minimizers
    )
    import jax.numpy as jnp

    res_1 = map_batch(
        jnp.asarray(codes), jnp.asarray(lens), index, jnp.asarray(ref_lens),
        P, P.max_minimizers,
    )
    assert int(n_mapped) == int(np.asarray(res_1.mapped).sum()) > 0
    for a, b in zip(res_s, res_1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_extraction_equals_unsharded(setup):
    genome, *_ = setup
    g = encode(genome[0][1])
    W, Lw, cap = 8, 1 << 13, 1 << 10
    wc = np.full((W, Lw), 4, np.uint8)
    wl = np.zeros(W, np.int32)
    for i in range(W):
        seg = g[i * 6000 : i * 6000 + Lw]
        wc[i, : len(seg)] = seg
        wl[i] = len(seg)
    mesh = pm.make_mesh(8)
    import jax.numpy as jnp

    sb_s = pm.extract_windows_sharded(mesh, wc, wl, P, cap)
    sb_1 = seed_batch(jnp.asarray(wc), jnp.asarray(wl), P, cap)
    for a, b in zip(sb_s, sb_1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mesh_sizes(setup):
    """2- and 4-device meshes produce identical results too (dp scaling)."""
    genome, index, meta, codes, lens = setup
    ref_lens = meta.lengths.astype(np.int32)
    outs = []
    for n in (2, 4):
        mesh = pm.make_mesh(n)
        res, n_mapped = pm.map_batch_sharded(
            mesh, codes, lens, index, ref_lens, P, P.max_minimizers
        )
        outs.append(int(n_mapped))
    assert outs[0] == outs[1] > 0


def test_multihost_helpers_single_process(tmp_path):
    """Single-process fallback of the multi-host glue: init is a no-op, shard is
    0/1, run_host_shard maps the whole file."""
    import numpy as np

    from mapquik_tpu.parallel import multihost
    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.ops.pipeline import Mapper

    assert multihost.init_distributed() is False  # no coordinator configured
    i, n = multihost.host_shard()
    assert (i, n) == (0, 1)
    p = Params.auto(k=5, l=17, density=0.05, max_read_len=1 << 12, batch_size=8,
                    ref_window=1 << 13, ref_halo=1 << 11)
    genome = markov_genome(60_000, seed=41)
    reads = simulate_reads(genome, 10, mean_len=2000, accuracy=0.99, seed=42)
    path = str(tmp_path / "r.fq")
    with open(path, "w") as f:
        for nm, s in reads:
            s = s.decode()
            f.write(f"@{nm}\n{s}\n+\n{'I' * len(s)}\n")
    mapper = Mapper(genome, p)
    out = multihost.run_host_shard(path, mapper, str(tmp_path / "out"))
    lines = open(out).read().strip().split("\n")
    assert len(lines) >= 8
