"""Round-3 probe: can jax.export / AOT serialization cut the relay's cold-start
compile cost (10-300 s per program)?

Phase 1 (export): trace + compile map_batch_flat_multi, serialize with
jax.export, write to /tmp/mq_aot.bin, time it.
Phase 2 (import, run with --load): fresh process deserializes and calls it —
if the deserialized call avoids the relay compile, start-to-first-batch drops.

  python scripts/r3_aot_probe.py          # export phase
  python scripts/r3_aot_probe.py --load   # import phase (fresh process)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()
PATH = "/tmp/mq_aot.bin"
IDX = "/tmp/r3_probe_index.npz"


def log(m):
    print(f"[aot +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    load = "--load" in sys.argv
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.index.serialize import save_index, load_index, params_key
    from mapquik_tpu.ops.pipeline import map_batch_flat_multi
    from mapquik_tpu.oracle.pyref import encode

    B, L, G = 256, 1 << 15, 4
    p = Params(k=7, l=31, density=0.01, max_read_len=L, max_minimizers=1 << 9,
               batch_size=B)
    log(f"device {jax.devices()[0]} (start-to-backend {time.time()-T0:.1f}s)")
    genome = markov_genome(16_000_000, seed=11, n_contigs=4)
    reads = simulate_reads(genome, B * G, mean_len=24_000, accuracy=0.99, seed=12)
    pk = params_key(p)
    if os.path.exists(IDX):
        index, meta = load_index(IDX, pk)
    else:
        index, meta = build_index(genome, p, device=False)
        save_index(IDX, index, meta, pk)
    log(f"index ready: {index.n} keys")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    codes = np.full((G, B, L), 4, np.uint8)
    lens = np.zeros((G, B), np.int32)
    for g in range(G):
        for j, (_, seq) in enumerate(reads[g * B : (g + 1) * B]):
            c = encode(seq)[:L]
            codes[g, j, : len(c)] = c
            lens[g, j] = len(c)
    codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)

    if not load:
        t0 = time.time()
        fn = lambda c, n, idx, rl: map_batch_flat_multi(
            c, n, idx, rl, p, 512, G
        )
        exp = jexport.export(jax.jit(fn))(codes_d, lens_d, index, ref_lens)
        log(f"traced+lowered in {time.time()-t0:.1f}s")
        t0 = time.time()
        blob = exp.serialize()
        with open(PATH, "wb") as f:
            f.write(blob)
        log(f"serialized {len(blob)/1e6:.1f} MB in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = exp.call(codes_d, lens_d, index, ref_lens)
        np.asarray(out[0, :2])
        log(f"exported call ran in {time.time()-t0:.1f}s (includes compile)")
        t0 = time.time()
        out = exp.call(codes_d, lens_d, index, ref_lens)
        np.asarray(out[0, :2])
        log(f"second exported call {time.time()-t0:.2f}s")
    else:
        t0 = time.time()
        with open(PATH, "rb") as f:
            exp = jexport.deserialize(f.read())
        log(f"deserialized in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = exp.call(codes_d, lens_d, index, ref_lens)
        np.asarray(out[0, :2])
        log(f"first call (fresh process) in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = exp.call(codes_d, lens_d, index, ref_lens)
        np.asarray(out[0, :2])
        log(f"second call {time.time()-t0:.2f}s")
        # compare against a fresh jit compile in this same process
        t0 = time.time()
        r = map_batch_flat_multi(codes_d, lens_d, index, ref_lens, p, 512, G)
        np.asarray(r[0, :2])
        log(f"fresh jit compile+run for comparison: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
