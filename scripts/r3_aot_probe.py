"""Round-3 probe: can serialized PJRT executables cut the relay's cold-start
compile cost (10-300 s per program)?

jax.export is NOT enough — it serializes StableHLO, so a fresh process still
pays the backend compile. jax.experimental.serialize_executable pickles the
COMPILED executable; if this tunneled PJRT supports DeserializeExecutable,
a fresh process skips the relay compile entirely. (The jax persistent
compilation cache is documented to HANG reading executables back on this
backend — this probes the same underlying path, so run it under a timeout.)

  python scripts/r3_aot_probe.py          # compile + serialize + self-check
  python scripts/r3_aot_probe.py --load   # fresh process: deserialize + run
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
    from jax.experimental import serialize_executable as se

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.index.hashtable import HashIndex
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

    def fn(c, n, keys, pay, rl):
        return map_batch_flat_multi(c, n, HashIndex(keys=keys, pay=pay), rl, p, 512, G)

    jfn = jax.jit(fn)

    if not load:
        t0 = time.time()
        lowered = jfn.lower(codes_d, lens_d, index.keys, index.pay, ref_lens)
        log(f"lowered in {time.time()-t0:.1f}s")
        t0 = time.time()
        compiled = lowered.compile()
        log(f"compiled in {time.time()-t0:.1f}s")
        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        with open(PATH, "wb") as f:
            import pickle

            pickle.dump((payload, in_tree, out_tree), f)
        log(f"serialized executable {os.path.getsize(PATH)/1e6:.1f} MB "
            f"in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = compiled(codes_d, lens_d, index.keys, index.pay, ref_lens)
        np.asarray(out[0, :2])
        log(f"compiled call ran in {time.time()-t0:.2f}s")
    else:
        import pickle

        t0 = time.time()
        with open(PATH, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        log(f"deserialized+loaded executable in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = compiled(codes_d, lens_d, index.keys, index.pay, ref_lens)
        np.asarray(out[0, :2])
        log(f"first call (fresh process, NO relay compile?) in {time.time()-t0:.2f}s")
        t0 = time.time()
        out = compiled(codes_d, lens_d, index.keys, index.pay, ref_lens)
        np.asarray(out[0, :2])
        log(f"second call {time.time()-t0:.2f}s")
        # compare: fresh jit in this process
        t0 = time.time()
        r = jfn(codes_d, lens_d, index.keys, index.pay, ref_lens)
        np.asarray(r[0, :2])
        log(f"fresh jit compile+run for comparison: {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
