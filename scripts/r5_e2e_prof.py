"""Round-5 probe: e2e Mapper phase split (MAPQUIK_E2E_PROF=1).

Round-4 closed at e2e 3.3-3.7k reads/s vs the 8k bar with no committed split
of where the 1.1 s per 4096 reads goes (candidates: h2d upload phase, result
pull latency, host pack, format). This drives the full Mapper path over the
cached bench inputs with the pipeline's per-phase accumulators on and prints
the report twice (warm pass timed).  Run alone — the tunnel is single-tenant.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("MAPQUIK_E2E_PROF", "1")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[e2eprof +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    from mapquik_tpu.params import Params
    from mapquik_tpu.index.serialize import load_index, params_key
    from mapquik_tpu.ops.pipeline import Mapper

    p = Params(k=7, l=31, density=0.01, batch_size=256)
    log(f"device {jax.devices()[0]}")
    cache = os.path.join("/root/repo", ".bench_cache")
    with open(os.path.join(cache, "inputs_g16_r4096_s11_12.pkl"), "rb") as f:
        genome, reads = pickle.load(f)
    index, meta = load_index(os.path.join(cache, "index_g16.npz"), params_key(p))
    index = jax.tree.map(jax.block_until_ready, index)
    log(f"index ready: {index.n} keys")

    mapper = Mapper.from_index(index, meta, p)
    for i in range(3):
        t0 = time.time()
        n = sum(1 for _ in mapper.map_reads(reads))
        log(f"pass {i}: {len(reads) / (time.time() - t0):,.0f} reads/s "
            f"({n} PAF lines)")


if __name__ == "__main__":
    main()
