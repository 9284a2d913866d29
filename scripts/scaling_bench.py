"""Multi-device scaling: steady-state shard_map throughput vs mesh size.

Runs on whatever devices exist — a real TPU pod slice, or a virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py [--out experiments/scaling_steady.csv]

Methodology (round-1 artifact was polluted — it re-placed inputs and the
replicated index on EVERY timed call, measuring host->device placement, not
mapping): inputs and index are device-put with their target shardings ONCE;
the timed region dispatches the jitted shard_map program over pre-placed
varied batches and reports the median of several repeats.

On a virtual CPU mesh all "devices" share physical cores, so per-device
speedup is not observable; the regression metric is OVERHEAD: sharded time /
single-device time for the SAME total reads (1.0 = sharding is free). On a
real pod slice reads_per_s is the scaling curve (>=80% efficiency target).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--per-dev", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import os

    import jax

    if "cpu" in (os.environ.get("JAX_PLATFORMS", ""), os.environ.get("MAPQUIK_PLATFORM", "")):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.oracle.pyref import encode
    from mapquik_tpu.ops.pipeline import map_batch
    from mapquik_tpu.parallel.mesh import (
        _map_batch_shmap, make_mesh, replicate, shard_reads,
    )
    from mapquik_tpu.params import Params

    n_dev = len(jax.devices())
    per_dev = args.per_dev
    p = Params(
        k=7, l=31, density=0.01,
        max_read_len=1 << 14, max_minimizers=1 << 8, batch_size=per_dev,
        ref_window=(1 << 14) - 4096, ref_halo=4096, ref_window_minimizers=1 << 8,
    )
    genome = markov_genome(2_000_000, seed=11, n_contigs=2)
    index, meta = build_index(genome, p)
    ref_lens = meta.lengths.astype(np.int32)

    rows = []
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    header = "devices,total_reads,sharded_ms,single_ms,reads_per_s,overhead_ratio"
    print(header)
    for n in sizes:
        mesh = make_mesh(n)
        B = per_dev * n
        # several input variants, all PRE-PLACED with their target shardings
        variants = []
        for v in range(3):
            reads = simulate_reads(genome, B, mean_len=12_000, accuracy=0.99,
                                   seed=100 + v)
            codes = np.full((B, p.max_read_len), 4, np.uint8)
            lens = np.zeros(B, np.int32)
            for i, (_, s) in enumerate(reads):
                c = encode(s)[: p.max_read_len]
                codes[i, : len(c)] = c
                lens[i] = len(c)
            variants.append(shard_reads(mesh, codes, lens))
        index_r = replicate(mesh, index)
        ref_lens_r = replicate(mesh, jnp.asarray(ref_lens))

        def run_shard(v):
            return _map_batch_shmap(
                variants[v][0], variants[v][1], index_r, ref_lens_r, p,
                p.max_minimizers, mesh,
            )

        res, n_mapped = run_shard(0)
        jax.block_until_ready(res)
        assert int(n_mapped) >= 0.9 * B, f"mesh {n}: {int(n_mapped)}/{B} mapped"
        med_shard = []
        for _ in range(args.repeats):
            t0 = time.time()
            for it in range(args.iters):
                res, _ = run_shard(it % len(variants))
            jax.block_until_ready(res)
            med_shard.append((time.time() - t0) / args.iters)
        dt_shard = float(np.median(med_shard))

        # single device, same total reads, pre-placed per-device-sized batches
        cod_d = [jnp.asarray(np.asarray(v[0])) for v in variants]
        len_d = [jnp.asarray(np.asarray(v[1])) for v in variants]
        idx1 = jax.device_put(index, jax.devices()[0])
        rl1 = jnp.asarray(ref_lens)

        def run_single(v):
            return [
                map_batch(cod_d[v][j : j + per_dev], len_d[v][j : j + per_dev],
                          idx1, rl1, p, p.max_minimizers)
                for j in range(0, B, per_dev)
            ]

        outs = run_single(0)
        jax.block_until_ready(outs)
        med_single = []
        for _ in range(args.repeats):
            t0 = time.time()
            for it in range(args.iters):
                outs = run_single(it % len(variants))
            jax.block_until_ready(outs)
            med_single.append((time.time() - t0) / args.iters)
        dt_single = float(np.median(med_single))

        row = (f"{n},{B},{dt_shard*1000:.1f},{dt_single*1000:.1f},"
               f"{B/dt_shard:.0f},{dt_shard/dt_single:.3f}")
        rows.append(row)
        print(row, flush=True)

    if args.out:
        with open(args.out, "w") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")


if __name__ == "__main__":
    main()
