"""In-situ A/B of the round-3 bit-identical formulation toggles inside the
FULL map program at the headline config (G=4 x B=256, L=32768, cap=512):

  base          gather chaining (v1) + rowsort seed merge
  chain         Params.chain_scan   (gather-free chaining v2)
  merge         Params.seed_merge_scan (sort-free cross-block seed merge)
  chain+merge   both

Methodology per DESIGN.md: varied inputs, order-dependent consumption, one
scalar pull per timing, interleaved reps so relay-phase drift hits every
variant equally, best-of-reps.

  python scripts/r3_toggles_ab.py
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
    smoke = "--smoke" in sys.argv  # tiny CPU validation of the harness itself
    if smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from mapquik_tpu.ops import pallas_seeding

        pallas_seeding._INTERPRET = True  # engage the kernel+merge path on CPU
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

    B, G = (32, 2) if smoke else (256, 4)
    L = (1 << 13) if smoke else (1 << 15)
    cap = (1 << 8) if smoke else (1 << 9)
    mean_len = 6_000 if smoke else 24_000
    p0 = Params(k=7, l=31, density=0.01, max_read_len=L, max_minimizers=cap,
                batch_size=B, chain_scan=False, seed_merge_scan=False)
    log(f"device {jax.devices()[0]}")
    genome = markov_genome(1_000_000 if smoke else 16_000_000, seed=11,
                           n_contigs=4)
    index, meta = build_index(genome, p0, device=False)
    log(f"index ready: {index.n} keys")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    def make_inputs(seed):
        reads = simulate_reads(genome, B * G, mean_len=mean_len, accuracy=0.99,
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

    variants = [
        ("base       ", p0),
        ("chain      ", dataclasses.replace(p0, chain_scan=True)),
        ("merge      ", dataclasses.replace(p0, seed_merge_scan=True)),
        ("match      ", dataclasses.replace(p0, match_compact_scan=True)),
        ("all-scan   ", dataclasses.replace(p0, chain_scan=True,
                                            seed_merge_scan=True,
                                            match_compact_scan=True)),
    ]
    fns, best, checks = {}, {}, {}
    for name, pv in variants:
        fn = full_fn(pv)
        t0 = time.time()
        checks[name] = int(fn(*inputs[0]))
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        fns[name] = fn
        best[name] = 1e9
    # bit-identical formulations must agree on the order-dependent checksum
    vals = set(checks.values())
    log(f"checksums: {checks}  {'OK' if len(vals) == 1 else 'MISMATCH!'}")
    for rep in range(4):
        for name, _ in variants:
            fn = fns[name]
            t0 = time.time()
            outs = [fn(*args) for args in inputs]
            np.asarray(outs[-1])
            dt = (time.time() - t0) / (len(inputs) * G)
            best[name] = min(best[name], dt)
            log(f"rep{rep} {name}: {dt*1000:.2f} ms/batch")
    log("--- best-of-4 (ms/batch) ---")
    b0 = best["base       "]
    for name, _ in variants:
        log(f"{name}: {best[name]*1000:.2f}  (delta vs base {1000*(b0-best[name]):+.2f})")


if __name__ == "__main__":
    main()
