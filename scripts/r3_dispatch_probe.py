"""Round-3 probe: does unrolling G batches per jitted program amortize the
~3.3 ms/batch dispatch floor (one program per 256-read batch through the
relay)?  Also: input donation on the codes buffer.

Protocol (DESIGN.md methodology): chained dispatches with VARIED inputs, one
tiny np.asarray pull at the end (block_until_ready does not await remote
execution of scalars here).  Run alone — the tunnel is single-tenant.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[probe +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.ops.pipeline import map_batch, map_batch_flat, _flatten_map_result
    from mapquik_tpu.oracle.pyref import encode

    B, L = 256, 1 << 15
    n_batches = 16
    p = Params(k=7, l=31, density=0.01, max_read_len=L, max_minimizers=1 << 9,
               batch_size=B)
    log(f"device {jax.devices()[0]}")
    genome = markov_genome(16_000_000, seed=11, n_contigs=4)
    reads = simulate_reads(genome, B * n_batches, mean_len=24_000, accuracy=0.99,
                           seed=12)
    log("building index (host path)")
    index, meta = build_index(genome, p, verbose=None, device=False)
    jax.block_until_ready(jax.tree.leaves(index))
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))
    log(f"index ready: {index.n} keys")

    batches = []
    for i in range(0, len(reads), B):
        chunk = reads[i : i + B]
        codes = np.full((B, L), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for j, (name, seq) in enumerate(chunk):
            c = encode(seq)[:L]
            codes[j, : len(c)] = c
            lens[j] = len(c)
        batches.append((jnp.asarray(codes), jnp.asarray(lens)))
    jax.block_until_ready([b[0] for b in batches])
    log(f"{len(batches)} batches staged on device")

    cap = p.max_minimizers

    def timeit(name, fn, args_list, inner=1):
        # warm/compile
        out = fn(*args_list[0])
        np.asarray(jax.tree.leaves(out)[0])[:2]
        log(f"{name}: compiled")
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            outs = [fn(*a) for a in args_list]
            # order-dependent consumption: pull a tiny slice of each output
            for o in outs:
                np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[:2]
            dt = time.time() - t0
            best = min(best, dt)
        per = best / (len(args_list) * inner) * 1e3
        log(f"{name}: {per:.2f} ms per 256-read batch  (total {best * 1e3:.0f} ms)")
        return per

    # --- A: current single-batch program ---
    timeit("G=1 map_batch_flat",
           lambda c, n: map_batch_flat(c, n, index, ref_lens, p, cap),
           batches)

    # --- B: G batches per program, unrolled ---
    for G in (2, 4):
        @functools.partial(jax.jit, static_argnames=())
        def multi(cs, ns):
            outs = []
            for g in range(G):
                r = map_batch(cs[g], ns[g], index, ref_lens, p, cap)
                outs.append(_flatten_map_result(r))
            return jnp.stack(outs)

        args = []
        for i in range(0, n_batches, G):
            grp = batches[i : i + G]
            cs = jnp.stack([g_[0] for g_ in grp])
            ns = jnp.stack([g_[1] for g_ in grp])
            args.append((cs, ns))
        jax.block_until_ready([a[0] for a in args])
        timeit(f"G={G} unrolled", multi, args, inner=G)

    # --- C: donation of the codes buffer (G=1) ---
    donated = jax.jit(
        lambda c, n: map_batch_flat(c, n, index, ref_lens, p, cap),
        donate_argnums=(0,),
    )
    # donation consumes inputs; re-stage fresh copies per run
    def run_donated():
        fresh = [(jnp.asarray(np.asarray(c)), n) for c, n in batches[:8]]
        jax.block_until_ready([f[0] for f in fresh])
        t0 = time.time()
        outs = [donated(c, n) for c, n in fresh]
        for o in outs:
            np.asarray(o).reshape(-1)[:2]
        return (time.time() - t0) / 8 * 1e3

    run_donated()
    per = min(run_donated(), run_donated())
    log(f"G=1 donated codes: {per:.2f} ms per 256-read batch")


if __name__ == "__main__":
    main()
