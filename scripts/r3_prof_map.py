"""In-situ stage attribution for the CURRENT grouped map program (round 3).

Truncated-pipeline deltas at the headline config (G=4 x B=256, L=32768,
cap=512): each variant runs the pipeline up to stage k inside one jitted
G-unrolled program, consumes every output with index-weighted sums (order
matters -> XLA cannot elide sorts), inputs varied per call, one scalar pull
per timing. Stage cost = time[k] - time[k-1] (the only recipe that doesn't
lie on this backend — DESIGN.md methodology).

  python scripts/r3_prof_map.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[prof +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


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

    def stage_fn(k):
        @jax.jit
        def fn(codes, lengths):
            acc = jnp.int32(0)
            for g in range(G):
                sb = seed_batch(codes[g], lengths[g], p, cap, True)
                if k == 0:
                    acc += wsum(sb.h1, sb.start, sb.end) + jnp.sum(sb.n)
                    continue
                pr = probe_hash(index, sb.h1, sb.h2)
                if k == 1:
                    acc += wsum(pr.hit, pr.rid, pr.start, pr.end, pr.offset)
                    continue
                mb = find_matches(sb, pr, p)
                if k == 2:
                    acc += wsum(mb.count, mb.q_start, mb.q_end, mb.r_start,
                                mb.r_end, mb.bucket) + jnp.sum(mb.n)
                    continue
                sel = chain_and_select(mb, p)
                if k == 3:
                    for a in sel:
                        acc += jnp.sum(a.astype(jnp.int32) * wB[:, 0])
                    continue
                res = project_coords(sel, lengths[g], ref_lens)
                res = res._replace(overflow=sb.overflow)
                acc += wsum(_flatten_map_result(res))
            return acc

        return fn

    names = ["seed", "+probe", "+match", "+chain", "full"]
    times = []
    for k in range(5):
        fn = stage_fn(k)
        t0 = time.time()
        np.asarray(fn(*inputs[0]))
        log(f"{names[k]}: compile+first {time.time()-t0:.1f}s")
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            vals = [fn(*args) for args in inputs]
            np.asarray(vals[-1])
            best = min(best, (time.time() - t0) / (len(inputs) * G))
        times.append(best)
        log(f"{names[k]}: {best*1000:.2f} ms/batch")

    log("--- stage deltas (ms/batch) ---")
    prev = 0.0
    for k in range(5):
        log(f"{names[k]:8s} total {times[k]*1000:6.2f}  delta {(times[k]-prev)*1000:6.2f}")
        prev = times[k]
    return names, times


if __name__ == "__main__":
    main()
