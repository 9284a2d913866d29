"""Multi-device scaling efficiency: shard_map mapping throughput vs mesh size.

Runs on whatever devices exist — a real TPU pod slice, or a virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py

Prints one CSV row per mesh size with throughput and efficiency vs 1 device
(BASELINE.json north star: >=80% scaling efficiency). Mapping is data-parallel
over reads with a replicated index (SURVEY.md §2.10), so near-linear scaling is
the expected result; this script is the regression check for that claim.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import os

    import jax

    if "cpu" in (os.environ.get("JAX_PLATFORMS", ""), os.environ.get("MAPQUIK_PLATFORM", "")):
        # env alone is overridden by this host's sitecustomize; force it
        jax.config.update("jax_platforms", "cpu")

    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.oracle.pyref import encode
    from mapquik_tpu.parallel.mesh import make_mesh, map_batch_sharded
    from mapquik_tpu.params import Params

    n_dev = len(jax.devices())
    per_dev = 64
    p = Params(
        k=7, l=31, density=0.01,
        max_read_len=1 << 14, max_minimizers=1 << 8, batch_size=per_dev,
        ref_window=(1 << 14) - 4096, ref_halo=4096, ref_window_minimizers=1 << 8,
    )
    genome = markov_genome(2_000_000, seed=11, n_contigs=2)
    index, meta = build_index(genome, p)
    ref_lens = meta.lengths.astype(np.int32)

    from mapquik_tpu.ops.pipeline import map_batch

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    # NOTE on virtual CPU meshes all "devices" share the same physical cores, so
    # per-device speedup is not observable; the meaningful regression metric there
    # is parallelization OVERHEAD: sharded time vs single-device time for the SAME
    # total reads (1.0 = free sharding). On a real pod slice, reads_per_s is the
    # scaling curve and should be near-linear in devices.
    print("devices,total_reads,sharded_ms,single_ms,reads_per_s,overhead_ratio")
    for n in sizes:
        mesh = make_mesh(n)
        B = per_dev * n
        reads = simulate_reads(genome, B, mean_len=12_000, accuracy=0.99, seed=12)
        codes = np.full((B, p.max_read_len), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for i, (_, s) in enumerate(reads):
            c = encode(s)[: p.max_read_len]
            codes[i, : len(c)] = c
            lens[i] = len(c)
        res, n_mapped = map_batch_sharded(mesh, codes, lens, index, ref_lens, p, p.max_minimizers)
        jax.block_until_ready(res)
        assert int(n_mapped) >= 0.9 * B, f"mesh {n}: only {int(n_mapped)}/{B} mapped"
        iters = 6
        t0 = time.time()
        for _ in range(iters):
            res, _ = map_batch_sharded(mesh, codes, lens, index, ref_lens, p, p.max_minimizers)
        jax.block_until_ready(res)
        dt_shard = (time.time() - t0) / iters
        # single device, same total reads, sequential per-device-sized batches
        import jax.numpy as jnp

        cod_d = jnp.asarray(codes)
        len_d = jnp.asarray(lens)
        outs = [map_batch(cod_d[j:j+per_dev], len_d[j:j+per_dev], index,
                          jnp.asarray(ref_lens), p, p.max_minimizers)
                for j in range(0, B, per_dev)]
        jax.block_until_ready(outs)
        t0 = time.time()
        for _ in range(iters):
            outs = [map_batch(cod_d[j:j+per_dev], len_d[j:j+per_dev], index,
                              jnp.asarray(ref_lens), p, p.max_minimizers)
                    for j in range(0, B, per_dev)]
        jax.block_until_ready(outs)
        dt_single = (time.time() - t0) / iters
        print(
            f"{n},{B},{dt_shard*1000:.1f},{dt_single*1000:.1f},"
            f"{B/dt_shard:.0f},{dt_shard/dt_single:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
