"""Round-3 probe 5: can stacking the G=4 dispatch group FLAT ([G*B, ...] ops)
beat the unrolled per-g loop of map_batch_flat_multi?

Why it might: the unrolled program issues ~7 gathers PER g (2 probe + 5 chain)
and gathers on this backend are latency/count-bound (~0.7-1.4 ms each,
width-independent). One [G*B, M] gather instead of G [B, M] gathers would cut
the count 4x. Why it might not: round-1/2 measured flat B=512/1024 batches
superlinear-WORSE in the [B, M] row sorts — but that was with the old
sort-heavy seeding; the only row sorts left are matching's two multi-operand
sorts and chaining's one.

Variants, all G=4 x B=256 x L=24576 in ONE jit program:
  unrolled : map_batch per g (current map_batch_flat_multi)
  flat     : one map_batch over [G*B, L]
  hybrid   : flat probe+gathers, per-256-chunk sorts (only if flat loses)

  python scripts/r3_probe5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[p5 +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.ops.pipeline import map_batch, map_batch_flat_multi, _flatten_map_result
    from mapquik_tpu.oracle.pyref import encode

    B, G = 256, 4
    L = 24576
    cap = 640
    p = Params(k=7, l=31, density=0.01, max_read_len=L, max_minimizers=cap,
               batch_size=B)
    log(f"device {jax.devices()[0]}")
    genome = markov_genome(16_000_000, seed=11, n_contigs=4)
    index, meta = build_index(genome, p, device=False)
    log(f"index ready: {index.n} keys")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    rng = np.random.default_rng(5)

    def make_inputs(seed):
        reads = simulate_reads(genome, B * G, mean_len=18_000, accuracy=0.99,
                               seed=seed)
        codes = np.full((G, B, L), 4, np.uint8)
        lens = np.zeros((G, B), np.int32)
        for g in range(G):
            for j, (_, seq) in enumerate(reads[g * B : (g + 1) * B]):
                c = encode(seq)[:L]
                codes[g, j, : len(c)] = c
                lens[g, j] = len(c)
        return jnp.asarray(codes), jnp.asarray(lens)

    import functools

    @functools.partial(jax.jit, static_argnames=("p", "cap", "G"))
    def flat_multi(codes, lengths, index, ref_lens, p, cap, G):
        GB = codes.shape[0] * codes.shape[1]
        res = map_batch(
            codes.reshape(GB, codes.shape[2]), lengths.reshape(GB),
            index, ref_lens, p, cap, True,
        )
        return _flatten_map_result(res).reshape(G, codes.shape[1], 10)

    variants = {
        "unrolled": lambda c, n: map_batch_flat_multi(
            c, n, index, ref_lens, p, cap, G
        ),
        "flat": lambda c, n: flat_multi(c, n, index, ref_lens, p, cap, G),
    }

    inputs = [make_inputs(100 + i) for i in range(6)]
    outs = {}
    for name, fn in variants.items():
        t0 = time.time()
        o = fn(*inputs[0])
        np.asarray(o[0, :2])
        log(f"{name}: compile+first {time.time()-t0:.1f}s")
        outs[name] = np.asarray(o)

    if not np.array_equal(outs["unrolled"], outs["flat"]):
        log("MISMATCH unrolled vs flat!")  # exactness first
        d = np.nonzero((outs["unrolled"] != outs["flat"]).any(-1))
        log(f"  differing reads: {len(d[0])}; first {d[0][:3]}, {d[1][:3]}")

    # timed: chained dispatches over varied inputs, pull one tiny slice at end
    for name, fn in variants.items():
        for rep in range(3):
            t0 = time.time()
            last = None
            for c, n in inputs:
                last = fn(c, n)
            np.asarray(last[0, :2])
            dt = time.time() - t0
            log(f"{name} rep{rep}: {dt*1000/ (len(inputs)*G):.2f} ms/batch "
                f"({len(inputs)*G*B/dt:.0f} reads/s)")


if __name__ == "__main__":
    main()
