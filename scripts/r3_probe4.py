"""Round-3 probe #4: pick the read-path config by measurement.

  A. honest seed caps / finer bins: (L=32768, cap=512) vs (32768, 896) vs
     (24576, 640) — the 2*density selection rate forces bigger caps for
     exactness; what do they cost in-situ?
  B. probe backends in-situ at bench table size (~155k keys): two-choice hash
     (2 gathers) vs sorted binary search (~26 dependent gathers) vs sort-join
     (3 radix sorts, scripts in index/lookup.probe_sortjoin).
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[probe4 +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.index.serialize import save_index, load_index, params_key
    from mapquik_tpu.index.lookup import probe, probe_sortjoin
    from mapquik_tpu.ops.chaining import chain_and_select, project_coords
    from mapquik_tpu.ops.matching import find_matches
    from mapquik_tpu.ops.pipeline import _flatten_map_result, map_batch
    from mapquik_tpu.ops.seeding import seed_batch
    from mapquik_tpu.oracle.pyref import encode

    B = 256
    G = 4
    n_batches = 16
    p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15,
               max_minimizers=1 << 11, batch_size=B)
    log(f"device {jax.devices()[0]}")
    genome = markov_genome(16_000_000, seed=11, n_contigs=4)
    reads = simulate_reads(genome, B * n_batches, mean_len=24_000,
                           accuracy=0.99, seed=12)
    CACHE = "/tmp/r3_probe_index.npz"
    pk = params_key(p)
    if os.path.exists(CACHE):
        index, meta = load_index(CACHE, pk)
        log(f"hash index loaded: {index.n} keys")
    else:
        index, meta = build_index(genome, p, device=False)
        save_index(CACHE, index, meta, pk)
        log(f"hash index built: {index.n} keys")
    sidx, _ = build_index(genome, p, backend="sorted", device=False)
    jax.block_until_ready(sidx.h1)
    log(f"sorted index ready: {sidx.n} keys")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    def stage(L):
        groups = []
        for i in range(0, n_batches, G):
            codes = np.full((G, B, L), 4, np.uint8)
            lens = np.zeros((G, B), np.int32)
            for g in range(G):
                chunk = reads[(i + g) * B : (i + g + 1) * B]
                for j, (_, seq) in enumerate(chunk):
                    c = encode(seq)[:L]
                    codes[g, j, : len(c)] = c
                    lens[g, j] = len(c)
            groups.append((jnp.asarray(codes), jnp.asarray(lens)))
        jax.block_until_ready([x[0] for x in groups])
        return groups

    def timeit(name, fn, groups):
        r = fn(*groups[0])
        np.asarray(r).reshape(-1)[:2]
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            outs = [fn(*a) for a in groups]
            jax.block_until_ready(outs)
            np.asarray(outs[-1]).reshape(-1)[:2]
            best = min(best, time.time() - t0)
        log(f"{name}: {best / n_batches * 1e3:6.2f} ms/batch "
            f"({n_batches * B / best:.0f} reads/s)")

    # --- A. cap / bin configs (hash probe) ---
    g32 = stage(1 << 15)
    for L, cap, groups in ((1 << 15, 512, g32), (1 << 15, 896, g32),
                           (24576, 640, None)):
        if groups is None:
            groups = stage(L)

        @jax.jit
        def fn(c, n, cap=cap):
            outs = [
                _flatten_map_result(
                    map_batch(c[g], n[g], index, ref_lens, p, cap)
                )
                for g in range(G)
            ]
            return jnp.stack(outs)

        timeit(f"A hash L={L} cap={cap}", fn, groups)

    # --- B. probe backends at cap 896, L 32768 ---
    def make(probe_fn):
        @jax.jit
        def fn(c, n):
            outs = []
            for g in range(G):
                sb = seed_batch(c[g], n[g], p, 896, True)
                pr = probe_fn(sidx, sb.h1, sb.h2)
                mb = find_matches(sb, pr, p)
                sel = chain_and_select(mb, p)
                res = project_coords(sel, n[g], ref_lens)._replace(
                    overflow=sb.overflow
                )
                outs.append(_flatten_map_result(res))
            return jnp.stack(outs)

        return fn

    timeit("B sorted binary-search", make(probe), g32)
    timeit("B sorted sort-join   ", make(probe_sortjoin), g32)


if __name__ == "__main__":
    main()
