"""Round-3 probe #3: characterize the h2d tunnel for the e2e redesign.

Questions:
  1. latency vs bandwidth: h2d time across sizes (0.59 / 2.4 / 9.4 / 37 MB)
  2. does jnp.asarray release the GIL (can a background thread hide uploads)?
  3. d2h pull cost of a finalize group ([2048, 10] int32)
  4. does an in-flight upload overlap device compute?
"""

import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[probe3 +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"device {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # --- 1. size curve ---
    for mb in (0.59, 2.36, 9.4, 37.7):
        n = int(mb * 1e6)
        src = rng.integers(0, 255, n, dtype=np.uint8)
        ts = []
        for i in range(6):
            src[i] = i  # dirty a page; vary input
            t0 = time.time()
            d = jnp.asarray(src)
            jax.block_until_ready(d)
            ts.append(time.time() - t0)
        med = float(np.median(ts))
        log(f"h2d {mb:5.2f} MB: median {med * 1e3:6.1f} ms ({mb / med:6.1f} MB/s) "
            f"min {min(ts) * 1e3:.1f}")

    # --- 1b. is the submit itself async? ---
    src0 = rng.integers(0, 255, 9_400_000, dtype=np.uint8)
    for i in range(3):
        src0[i] = i
        t0 = time.time()
        d = jnp.asarray(src0)
        t_submit = time.time() - t0
        jax.block_until_ready(d)
        t_total = time.time() - t0
        log(f"h2d submit {t_submit * 1e3:6.1f} ms / total {t_total * 1e3:6.1f} ms "
            f"({'ASYNC submit' if t_submit < t_total * 0.5 else 'sync'})")

    # --- 2. GIL release: upload on a thread while main thread spins ---
    src = rng.integers(0, 255, 9_400_000, dtype=np.uint8)
    out = {}

    def uploader():
        t0 = time.time()
        d = jnp.asarray(src)
        jax.block_until_ready(d)
        out["upload_s"] = time.time() - t0

    # main-thread busy work calibrated ~0.3 s
    def spin(dur):
        t0 = time.time()
        x = 0
        while time.time() - t0 < dur:
            x += sum(range(1000))
        return x

    t0 = time.time()
    th = threading.Thread(target=uploader)
    th.start()
    spin(0.35)
    th.join()
    wall = time.time() - t0
    log(f"overlap(GIL): upload {out['upload_s'] * 1e3:.0f} ms + spin 350 ms -> "
        f"wall {wall * 1e3:.0f} ms "
        f"({'OVERLAPS' if wall < out['upload_s'] + 0.25 else 'SERIALIZES'})")

    # --- 2b. pure-numpy work during upload (releases GIL in ufuncs) ---
    big = rng.integers(0, 255, 20_000_000, dtype=np.uint8)
    t0 = time.time()
    th = threading.Thread(target=uploader)
    th.start()
    for _ in range(12):
        _ = np.add(big, 1)
    th.join()
    wall = time.time() - t0
    log(f"overlap(numpy): wall {wall * 1e3:.0f} ms vs upload {out['upload_s'] * 1e3:.0f} ms")

    # --- 3. d2h pull of a finalize group ---
    flat = jnp.zeros((2048, 10), jnp.int32) + jnp.arange(10, dtype=jnp.int32)[None, :]
    jax.block_until_ready(flat)
    ts = []
    for i in range(6):
        f2 = flat + i
        jax.block_until_ready(f2)
        t0 = time.time()
        _ = np.asarray(f2)
        ts.append(time.time() - t0)
    log(f"d2h [2048,10] i32 (80 KB): median {np.median(ts) * 1e3:.1f} ms")

    # --- 4. upload vs device compute overlap ---
    # dispatch a ~50 ms device program, then immediately upload; if the wall is
    # ~max of the two, transfers overlap compute
    a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32))
    f = jax.jit(lambda x: jnp.tanh(x @ x) @ x @ x @ x)
    r = f(a)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(a)
    jax.block_until_ready(r)
    compute_s = time.time() - t0
    t0 = time.time()
    r = f(a)
    d = jnp.asarray(src)
    jax.block_until_ready([r, d])
    both = time.time() - t0
    log(f"compute {compute_s * 1e3:.0f} ms; compute+upload wall {both * 1e3:.0f} ms "
        f"(upload alone {out['upload_s'] * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
