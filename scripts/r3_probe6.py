"""Round-3 probe 6: transfer/compute CONTENTION on the tunneled backend.

probe3 measured h2d at 450-725 MB/s idle, but one trial suggested an upload
issued while the device runs a program stalls catastrophically (28 ms compute
+ 29 ms upload -> 328 ms wall). The streaming e2e path uploads ~3 MB/batch
while map programs are in flight; if contention is real, e2e is bound by it
(bench r3b: 2,336 reads/s = 110 ms/batch ~ 3 MB / 27 MB/s).

Questions answered here, each repeated 5x:
  A. upload alone (idle device) — baseline MB/s
  B. upload submitted WHILE a chained compute runs — wall vs sum
  C. serial discipline: dispatch -> await completion (tiny pull) -> upload
  D. two-thread parallel uploads — aggregate MB/s
  E. d2h pull (80 KB) while compute runs vs idle

  python scripts/r3_probe6.py
"""

import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[probe6 +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    log(f"device {jax.devices()[0]}")
    dev = jax.devices()[0]

    # a compute program with a tunable busy time (chained matmuls, no inputs
    # re-upload): ~30-60 ms per call at n=4096, reps=24
    n = 4096

    @jax.jit
    def busy(x):
        def body(c, _):
            c = c @ c * np.float32(1e-3) + np.float32(0.5)
            return c, ()

        y, _ = jax.lax.scan(body, x, None, length=24)
        return y

    x0 = jnp.asarray(np.random.default_rng(0).random((n, n), np.float32))
    r = busy(x0)
    np.asarray(r[:1, :1])  # compile + settle
    t0 = time.time()
    r = busy(x0)
    np.asarray(r[:1, :1])
    t_busy = time.time() - t0
    log(f"busy() compute+pull: {t_busy * 1000:.0f} ms")

    mb = 3.0
    bufs = [np.random.randint(0, 255, int(mb * 1e6), np.uint8) for _ in range(8)]

    def upload(i):
        a = jax.device_put(bufs[i % len(bufs)], dev)
        a.block_until_ready()  # h2d completion IS awaited (local buffer exists)
        return a

    # A: idle uploads
    for rep in range(5):
        t0 = time.time()
        upload(rep)
        dt = time.time() - t0
        log(f"A idle upload {mb:.0f}MB: {dt * 1000:6.1f} ms ({mb / dt:6.0f} MB/s)")

    # B: upload submitted while compute in flight
    for rep in range(5):
        t0 = time.time()
        y = busy(x0)
        t_disp = time.time() - t0
        t1 = time.time()
        upload(rep)
        t_up = time.time() - t1
        np.asarray(y[:1, :1])
        wall = time.time() - t0
        log(
            f"B upload-during-compute: dispatch {t_disp*1000:5.1f} + upload "
            f"{t_up*1000:6.1f} ms, wall-to-result {wall*1000:6.1f} ms"
        )

    # C: serial discipline (await completion via tiny pull, then upload)
    for rep in range(5):
        t0 = time.time()
        y = busy(x0)
        np.asarray(y[:1, :1])
        t_done = time.time() - t0
        t1 = time.time()
        upload(rep)
        t_up = time.time() - t1
        log(
            f"C serial: compute+pull {t_done*1000:6.1f} + upload {t_up*1000:6.1f}"
            f" ms = {(t_done + t_up)*1000:6.1f}"
        )

    # D: two parallel upload threads (aggregate bandwidth)
    for rep in range(3):
        res = [None, None]

        def up(slot):
            t0 = time.time()
            a = upload(2 * rep + slot)
            res[slot] = time.time() - t0
            return a

        t0 = time.time()
        th = threading.Thread(target=up, args=(1,))
        th.start()
        up(0)
        th.join()
        wall = time.time() - t0
        log(
            f"D 2-thread uploads {2*mb:.0f}MB total: wall {wall*1000:6.1f} ms "
            f"({2 * mb / wall:6.0f} MB/s agg; each {res[0]*1000:.0f}/{res[1]*1000:.0f})"
        )

    # E: d2h pull while busy vs idle
    small = jnp.asarray(np.zeros((2048, 10), np.int32))
    np.asarray(small[:1, :1])
    for rep in range(3):
        t0 = time.time()
        _ = np.asarray(small)
        log(f"E idle d2h 80KB: {(time.time() - t0)*1000:6.1f} ms")
    for rep in range(3):
        y = busy(x0)
        t0 = time.time()
        _ = np.asarray(small)
        dt = time.time() - t0
        np.asarray(y[:1, :1])
        log(f"E d2h-during-compute 80KB: {dt*1000:6.1f} ms")


if __name__ == "__main__":
    main()
