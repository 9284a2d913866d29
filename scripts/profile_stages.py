"""Stage-by-stage TPU timing of the mapping pipeline (steady state, compiled)."""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mapquik_tpu.params import Params
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.index.build import build_index
from mapquik_tpu.oracle.pyref import encode
from mapquik_tpu.ops import seeding
from mapquik_tpu.ops.matching import find_matches
from mapquik_tpu.ops.chaining import chain_and_select, project_coords
from mapquik_tpu.index.lookup import probe


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1000:9.2f} ms")
    return out


def main():
    p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15, max_minimizers=1 << 9)
    print("device:", jax.devices()[0])

    # --- mapping-side shapes ---
    B, L, M = 256, p.max_read_len, p.max_minimizers
    genome = markov_genome(8_000_000, seed=11)
    t0 = time.time()
    index, meta = build_index(genome, p)
    print(f"index build (8MB genome): {time.time()-t0:.1f}s, {index.n} kminmers")
    reads = simulate_reads(genome, B, mean_len=24_000, accuracy=0.99, seed=12)
    codes = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, (_, s) in enumerate(reads):
        c = encode(s)[:L]
        codes[i, : len(c)] = c
        lens[i] = len(c)
    codes = jnp.asarray(codes)
    lens = jnp.asarray(lens)
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    hpc = jax.jit(seeding.hpc_compact)
    nth = jax.jit(lambda c: seeding.nthash32_batch(c, p.l))
    minb = jax.jit(lambda c, l: seeding.minimizers_batch(c, l, p, M), static_argnums=())
    seedf = jax.jit(lambda c, l: seeding.seed_batch(c, l, p, M))
    probef = jax.jit(lambda h1, h2: probe(index, h1, h2))
    matchf = jax.jit(lambda sb, pr: find_matches(sb, pr, p))
    chainf = jax.jit(lambda mb: chain_and_select(mb, p))

    hc = timeit("hpc_compact [256,32k]", hpc, codes, lens)
    timeit("nthash32 [256,32k]", nth, hc[0])
    timeit("minimizers_batch", minb, codes, lens)
    sb = timeit("seed_batch (all seeding)", seedf, codes, lens)
    pr = timeit("probe (binary search)", probef, sb.h1, sb.h2)
    mb = timeit("find_matches (scan)", matchf, sb, pr)
    sel = timeit("chain_and_select", chainf, mb)
    from functools import partial
    from mapquik_tpu.ops.pipeline import map_batch
    timeit("map_batch (fused e2e)", lambda: map_batch(codes, lens, index, ref_lens, p, M), n=5)

    # --- index-build-side shapes ---
    Lw = 1 << 21
    wc = np.full((4, Lw), 4, np.uint8)
    g = encode(genome[0][1])
    for i in range(4):
        seg = g[i * 1_000_000 : i * 1_000_000 + (1 << 20) + (1 << 15)]
        wc[i, : len(seg)] = seg
    wl = np.full(4, (1 << 20) + (1 << 15), np.int32)
    wc = jnp.asarray(wc)
    wl = jnp.asarray(wl)
    seedw = jax.jit(lambda c, l: seeding.seed_batch(c, l, p, p.ref_window_minimizers))
    t0 = time.time()
    out = seedw(wc, wl)
    jax.block_until_ready(out)
    print(f"seed_batch [4,2M] compile+run: {time.time()-t0:.1f}s")
    timeit("seed_batch [4,2M] steady", seedw, wc, wl)
    hpcw = jax.jit(seeding.hpc_compact)
    hw = timeit("hpc_compact [4,2M]", hpcw, wc, wl)
    timeit("nthash32 [4,2M]", jax.jit(lambda c: seeding.nthash32_batch(c, p.l)), hw[0])


if __name__ == "__main__":
    main()
