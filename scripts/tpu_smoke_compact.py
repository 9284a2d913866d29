"""TPU compile + parity smoke for the kernel-side compaction seeding path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_smoke_compact.py [big]
Small shapes first (fast compile, catches Mosaic aborts), then optionally the
production [256, 32768] shape with timing.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def check(B, L, p, cap, seed=0):
    import jax.numpy as jnp

    from mapquik_tpu.ops.seeding import seed_batch

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
    codes[0, 50:80] = 4
    codes[1, 300:340] = codes[1, 300]
    lens = np.full(B, L, np.int32)
    lens[2] = max(p.min_seq_len, L // 3)
    lens[3] = 0
    codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)
    t0 = time.time()
    sb_k = seed_batch(codes_d, lens_d, p, cap, use_pallas=True)
    sb_k.h1.block_until_ready()
    t_compile = time.time() - t0
    sb_x = seed_batch(codes_d, lens_d, p, cap, use_pallas=False)
    n_k, n_x = np.asarray(sb_k.n), np.asarray(sb_x.n)
    np.testing.assert_array_equal(n_k, n_x)
    np.testing.assert_array_equal(np.asarray(sb_k.overflow), np.asarray(sb_x.overflow))
    np.testing.assert_array_equal(
        np.asarray(sb_k.tail_start), np.asarray(sb_x.tail_start)
    )
    for f in ("h1", "h2", "start", "end", "rev"):
        a, b = np.asarray(getattr(sb_k, f)), np.asarray(getattr(sb_x, f))
        for i in range(B):
            np.testing.assert_array_equal(a[i, : n_x[i]], b[i, : n_x[i]],
                                          err_msg=f"{f} row {i}")
    # steady-state timing (vary input to defeat caching/elision)
    ts = []
    for it in range(5):
        codes2 = rng.integers(0, 4, (B, L)).astype(np.uint8)
        cd = jnp.asarray(codes2)
        t0 = time.time()
        sb = seed_batch(cd, lens_d, p, cap, use_pallas=True)
        sb.h1.block_until_ready()
        ts.append(time.time() - t0)
    print(
        f"[{B}x{L}] k={p.k} l={p.l} d={p.density} hpc={p.use_hpc}: parity OK, "
        f"compile {t_compile:.1f}s, steady {1e3 * np.median(ts):.2f} ms",
        flush=True,
    )


def main():
    import jax

    from mapquik_tpu.params import Params

    print(f"backend: {jax.default_backend()}", flush=True)
    check(32, 2048, Params(k=5, l=17, density=0.05, max_read_len=2048), 512)
    check(32, 2048, Params(k=8, l=16, density=0.02, use_hpc=False,
                           max_read_len=2048), 256, seed=1)
    if len(sys.argv) > 1 and sys.argv[1] == "big":
        check(256, 32768, Params.auto(k=7, l=31, density=0.01), 512, seed=2)
    print("SMOKE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
