"""Seeding-stage attribution on TPU with device-resident inputs.

Times each stage of the (new) compacted seeding path in isolation AND the full
map_batch, inputs pre-staged on device and varied per call, results consumed
order-dependently (weighted sums) and pulled once — the only measurement recipe
that doesn't lie on this backend (DESIGN.md methodology).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/prof_seed.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timeit(fn, inputs, n=6):
    """median seconds per call over varied device-resident inputs."""
    import jax.numpy as jnp

    outs = []
    fn(*inputs[0])  # compile
    ts = []
    for i in range(n):
        args = inputs[i % len(inputs)]
        t0 = time.time()
        o = fn(*args)
        o.block_until_ready()
        ts.append(time.time() - t0)
        outs.append(o)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.ops import seeding
    from mapquik_tpu.ops.pallas_seeding import seed_select_compact
    from mapquik_tpu.params import Params

    print(f"backend: {jax.default_backend()}", flush=True)
    p = Params.auto(k=7, l=31, density=0.01)
    B, L, cap = 256, p.max_read_len, p.max_minimizers
    rng = np.random.default_rng(0)
    code_batches = []
    for i in range(3):
        codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
        code_batches.append(jnp.asarray(codes))
    lens = jnp.full(B, L, jnp.int32)
    w_small = jnp.arange(cap, dtype=jnp.int32)[None, :]

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def stage_sortkey(codes):
        skey = seeding.hpc_sortkey(codes, lens, p)
        return jnp.sum(skey * jnp.arange(L, dtype=jnp.int32)[None, :], dtype=jnp.int64)

    t = timeit(lambda c: stage_sortkey(c), [(c,) for c in code_batches])
    print(f"hpc_sortkey (incl 32k sort): {1e3 * t:8.2f} ms", flush=True)

    skeys = [seeding.hpc_sortkey(c, lens, p) for c in code_batches]
    skeys = [jax.device_put(s).block_until_ready() for s in skeys]

    @jax.jit
    def stage_kernels(skey):
        pk, ch, ps = seed_select_compact(skey, lens, p.l, p.hash_threshold, L)
        w = jnp.arange(pk.shape[1], dtype=jnp.int32)[None, :]
        return jnp.sum((pk + ch.astype(jnp.int32) + ps) * w, dtype=jnp.int64)

    t = timeit(lambda s: stage_kernels(s), [(s,) for s in skeys])
    print(f"pallas F+RC kernels:          {1e3 * t:8.2f} ms", flush=True)

    @jax.jit
    def stage_seed_full(codes):
        sb = seeding.seed_batch(codes, lens, p, cap, True)
        return jnp.sum((sb.h1.astype(jnp.int32) + sb.start) * w_small, dtype=jnp.int64)

    t = timeit(lambda c: stage_seed_full(c), [(c,) for c in code_batches])
    print(f"seed_batch use_pallas=True:   {1e3 * t:8.2f} ms", flush=True)

    @jax.jit
    def stage_seed_xla(codes):
        sb = seeding.seed_batch(codes, lens, p, cap, False)
        return jnp.sum((sb.h1.astype(jnp.int32) + sb.start) * w_small, dtype=jnp.int64)

    t = timeit(lambda c: stage_seed_xla(c), [(c,) for c in code_batches])
    print(f"seed_batch use_pallas=False:  {1e3 * t:8.2f} ms", flush=True)

    # full map_batch against a small real index
    from mapquik_tpu.eval.simulate import markov_genome
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.ops.pipeline import map_batch

    genome = markov_genome(2_000_000, seed=5, n_contigs=1)
    index, meta = build_index(genome, p)
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    @jax.jit
    def stage_map(codes):
        res = map_batch(codes, lens, index, ref_lens, p, cap, True)
        return jnp.sum(res.q_start + res.r_start * 7 + res.score, dtype=jnp.int64)

    t = timeit(lambda c: stage_map(c), [(c,) for c in code_batches])
    print(f"map_batch (full, pallas):     {1e3 * t:8.2f} ms", flush=True)

    @jax.jit
    def stage_map_xla(codes):
        res = map_batch(codes, lens, index, ref_lens, p, cap, False)
        return jnp.sum(res.q_start + res.r_start * 7 + res.score, dtype=jnp.int64)

    t = timeit(lambda c: stage_map_xla(c), [(c,) for c in code_batches])
    print(f"map_batch (full, xla):        {1e3 * t:8.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
