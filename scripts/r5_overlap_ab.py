"""Round-5 probe: does an h2d upload issued DURING device compute still stall
the pipe, or was the round-3 'contended h2d' observation just the
post-execution transfer mode (experiments/r5_transfer_modes.md)?

Protocol: warm the G=16 map program (~100 ms device compute per dispatch),
then time, best of 3 each:
  serial:  dispatch -> pull -> upload(8 MB, blocked)
  overlap: dispatch -> upload(8 MB, blocked) -> pull
If overlap's total is ~max(compute, upload) instead of their sum (and the
pull shows no blow-up), the serial transfer/compute discipline in
ops/pipeline + index/device_build is leaving 20-30%% of e2e/build time on
the table.  Run alone — the tunnel is single-tenant.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[overlap +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.index.serialize import load_index, params_key
    from mapquik_tpu.ops.pipeline import _flat_multi_program_fn
    from mapquik_tpu.utils.aot import cached_program
    from time import perf_counter as pc

    B, L, CAP, G = 256, 1 << 15, 1 << 9, 16
    p = Params(k=7, l=31, density=0.01, batch_size=B)
    log(f"device {jax.devices()[0]}")
    index, meta = load_index("/root/repo/.bench_cache/index_g16.npz",
                             params_key(p))
    index = jax.tree.map(jax.block_until_ready, index)
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, (G, B, L), dtype=np.uint8)
    lens = np.full((G, B), 24000, np.int32)
    cs, ns = jnp.asarray(codes), jnp.asarray(lens)
    prog = cached_program(
        f"bench_map_flat_c{CAP}_G{G}", _flat_multi_program_fn(p, CAP, G),
        (cs, ns, index, ref_lens), statics_key=(repr(p), CAP, G),
    )
    out = prog(cs, ns, index, ref_lens)
    np.asarray(out[0, :2])
    log("program warm; entering A/B (8 MB upload vs ~100 ms compute)")
    up_host = rng.integers(0, 255, 8_000_000, dtype=np.uint8)

    def upload():
        d = jnp.asarray(up_host)
        jax.block_until_ready(d)
        return d

    # baselines in the post-execution mode
    t0 = pc(); upload(); t_up = pc() - t0
    t0 = pc(); r = prog(cs, ns, index, ref_lens); np.asarray(r[0, :2])
    t_comp = pc() - t0
    log(f"baseline: upload {t_up*1e3:.1f} ms, dispatch+pull {t_comp*1e3:.1f} ms")

    res = {"upload_ms": round(t_up * 1e3, 1),
           "dispatch_pull_ms": round(t_comp * 1e3, 1)}
    for name, order in (("serial", "after"), ("overlap", "during")):
        best = 1e9
        for _ in range(3):
            t0 = pc()
            r = prog(cs, ns, index, ref_lens)
            if order == "during":
                upload()            # h2d while the program runs
                np.asarray(r[0, :2])
            else:
                np.asarray(r[0, :2])
                upload()            # h2d after the pull (device idle)
            best = min(best, pc() - t0)
        res[name + "_ms"] = round(best * 1e3, 1)
        log(f"{name}: {best*1e3:.1f} ms total")
    res["verdict"] = (
        "overlap-safe" if res["overlap_ms"] < res["serial_ms"] * 0.9
        else "overlap-neutral" if res["overlap_ms"] < res["serial_ms"] * 1.1
        else "overlap-stalls"
    )
    print(json.dumps({"overlap_ab": res}))


if __name__ == "__main__":
    main()
