"""In-situ A/B: gather-free chaining (Params.chain_scan) vs the gather
formulation, inside the FULL grouped map program at the headline config
(G=4 x B=256, L=32768, cap=512). Methodology per DESIGN.md: varied inputs,
order-dependent consumption, one scalar pull per timing, best-of-reps.

  python scripts/r3_chain_scan_ab.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[ab +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.index.hashtable import probe_hash
    from mapquik_tpu.ops.seeding import seed_batch
    from mapquik_tpu.ops.matching import find_matches
    from mapquik_tpu.ops.chaining import chain_and_select, project_coords
    from mapquik_tpu.ops.pipeline import _flatten_map_result
    from mapquik_tpu.oracle.pyref import encode

    B, G = 256, 4
    L = 1 << 15
    cap = 1 << 9
    p = Params(k=7, l=31, density=0.01, max_read_len=L, max_minimizers=cap,
               batch_size=B)
    log(f"device {jax.devices()[0]}")
    genome = markov_genome(16_000_000, seed=11, n_contigs=4)
    index, meta = build_index(genome, p, device=False)
    log(f"index ready: {index.n} keys")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    def make_inputs(seed):
        reads = simulate_reads(genome, B * G, mean_len=24_000, accuracy=0.99,
                               seed=seed)
        codes = np.full((G, B, L), 4, np.uint8)
        lens = np.zeros((G, B), np.int32)
        for g in range(G):
            for j, (_, seq) in enumerate(reads[g * B : (g + 1) * B]):
                c = encode(seq)[:L]
                codes[g, j, : len(c)] = c
                lens[g, j] = len(c)
        return jnp.asarray(codes), jnp.asarray(lens)

    inputs = [make_inputs(200 + i) for i in range(6)]
    wB = jnp.arange(B, dtype=jnp.int32)[:, None]

    def wsum(*arrays):
        acc = jnp.int32(0)
        for a in arrays:
            a = a.astype(jnp.int32) if a.dtype != jnp.int32 else a
            w = jnp.arange(a.shape[-1], dtype=jnp.int32)
            acc = acc + jnp.sum(a * w, dtype=jnp.int32) + jnp.sum(a * wB, dtype=jnp.int32)
        return acc

    def full_fn(pv):
        @jax.jit
        def fn(codes, lengths):
            acc = jnp.int32(0)
            for g in range(G):
                sb = seed_batch(codes[g], lengths[g], pv, cap, True)
                pr = probe_hash(index, sb.h1, sb.h2)
                mb = find_matches(sb, pr, pv)
                sel = chain_and_select(mb, pv)
                res = project_coords(sel, lengths[g], ref_lens)
                res = res._replace(overflow=sb.overflow)
                acc += wsum(_flatten_map_result(res))
            return acc

        return fn

    variants = [("gather(v1)", dataclasses.replace(p, chain_scan=False)),
                ("scan(v2) ", dataclasses.replace(p, chain_scan=True))]
    results = {}
    # interleave timing rounds so relay-phase drift hits both variants equally
    fns = {}
    for name, pv in variants:
        fn = full_fn(pv)
        t0 = time.time()
        np.asarray(fn(*inputs[0]))
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        fns[name] = fn
        results[name] = 1e9
    for rep in range(4):
        for name, _ in variants:
            fn = fns[name]
            t0 = time.time()
            vals = [fn(*args) for args in inputs]
            np.asarray(vals[-1])
            dt = (time.time() - t0) / (len(inputs) * G)
            results[name] = min(results[name], dt)
            log(f"rep{rep} {name}: {dt*1000:.2f} ms/batch")
    log("--- best-of-4 ---")
    for name, _ in variants:
        log(f"{name}: {results[name]*1000:.2f} ms/batch")
    d = (results["gather(v1)"] - results["scan(v2) "]) * 1000
    log(f"delta (v1 - v2): {d:+.2f} ms/batch  (adopt if >= +1.0)")


if __name__ == "__main__":
    main()
