"""Round-5 probe: device index-build phase split (MAPQUIK_BUILD_PROF=1).

Round-4 closed at 34.3 MB/s driver-captured / 43.1 uncontended vs the 50 MB/s
bar with no committed split of where the 64 MB build's ~1.5 s goes
(pack / upload / extract / finalize). Runs the device builder three times
(cold incl. AOT resolve, then two steady passes) and prints the per-phase
report each time.  Run alone — the tunnel is single-tenant.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MAPQUIK_BUILD_PROF", "1")

T0 = time.time()


def log(m):
    print(f"[buildprof +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome
    from mapquik_tpu.index.device_build import build_index_device

    mb = int(os.environ.get("BENCH_DEVBUILD_MB", "64"))
    p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15,
               max_minimizers=1 << 9)
    log(f"device {jax.devices()[0]}; genome {mb}MB")
    g = markov_genome(mb * 1_000_000, seed=11, n_contigs=2)
    log("genome ready; cold build (AOT resolve + any compiles)")
    times = []
    for i in range(3):
        t0 = time.time()
        r = build_index_device(g, p, verbose=log if i == 0 else None)
        assert r is not None
        dt = time.time() - t0
        times.append(round(dt, 3))
        log(f"pass {i}: {dt:.2f}s = {mb / dt:.1f} MB/s ({r[0].n} k-min-mers)")
    print(json.dumps({"buildprof_mb": mb, "passes_s": times,
                      "steady_mb_per_s": round(mb / min(times[1:]), 1)}))


if __name__ == "__main__":
    main()
