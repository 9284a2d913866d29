"""Reference-scale rehearsal: build + map against a 1 GB+ genome on one chip.

Round-1 gap: everything was validated to 128 MB / ~1.2M k-min-mers while the
reference handles CHM13v2 (3.1 GB, 39.8M k-min-mers — src/index.rs:83). This
drives the device-resident builder and the mapping path at >= 1 GB, checks
accuracy, and records build/map throughput + table occupancy.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale_rehearsal.py \
      [--genome-gb 1] -> experiments/scale_rehearsal.json
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-gb", type=float, default=1.0)
    ap.add_argument("--n-reads", type=int, default=512)
    ap.add_argument("--out", default="experiments/scale_rehearsal.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mapquik_tpu.eval.mapeval import evaluate_paf
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.ops.pipeline import Mapper
    from mapquik_tpu.params import Params

    t0 = time.time()

    def log(m):
        print(f"[{time.time()-t0:7.1f}s] {m}", file=sys.stderr, flush=True)

    n = int(args.genome_gb * (1 << 30))
    n_contigs = max(2, int(args.genome_gb * 4))
    log(f"generating {n/1e9:.2f} GB genome ({n_contigs} contigs)")
    genome = markov_genome(n, seed=71, n_contigs=n_contigs)
    log("genome ready; building device index")

    p = Params.auto(k=7, l=31, density=0.01)
    tb = time.time()
    index, meta = build_index(genome, p, verbose=log)
    jax.block_until_ready(jax.tree.leaves(index))
    build_s = time.time() - tb
    n_unique = index.n
    log(f"index: {n_unique} unique k-min-mers in {build_s:.1f}s "
        f"({n / 1e6 / build_s:.1f} MB/s cold)")

    tb = time.time()
    index2, _ = build_index(genome, p)
    jax.block_until_ready(jax.tree.leaves(index2))
    steady_s = time.time() - tb
    del index2
    log(f"steady rebuild {steady_s:.1f}s ({n / 1e6 / steady_s:.1f} MB/s)")

    log(f"simulating {args.n_reads} reads")
    reads = simulate_reads(genome, args.n_reads, mean_len=24_000,
                           accuracy=0.99, seed=72)
    mapper = Mapper.from_index(index, meta, p)
    lines = list(mapper.map_reads(reads))  # includes compile
    tm = time.time()
    lines = list(mapper.map_reads(reads))
    map_s = time.time() - tm
    ev = evaluate_paf(lines, n_reads=len(reads))
    log(f"mapped {ev.n_mapped}/{ev.n_reads} ({ev.n_reads/map_s:.0f} reads/s "
        f"e2e), wrong={ev.n_wrong} q60={ev.q60_total} q60_wrong={ev.q60_wrong}")

    # steady DEVICE map_batch time against this table (VERDICT r2 item 4:
    # must stay within ~10% of the small-index number — the probe gathers
    # touch a ~2 GB table instead of a ~50 MB one)
    from mapquik_tpu.oracle.pyref import encode
    from mapquik_tpu.ops.pipeline import map_batch_flat_multi

    B, G, L, CAP = 256, 4, 1 << 15, 1 << 9
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))
    greads = simulate_reads(genome, B * G, mean_len=24_000, accuracy=0.99,
                            seed=73)
    codes = np.full((G, B, L), 4, np.uint8)
    lens = np.zeros((G, B), np.int32)
    for g in range(G):
        for j, (_, seq) in enumerate(greads[g * B : (g + 1) * B]):
            c = encode(seq)[:L]
            codes[g, j, : len(c)] = c
            lens[g, j] = len(c)
    codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)
    r = map_batch_flat_multi(codes_d, lens_d, index, ref_lens, p, CAP, G)
    np.asarray(r[0, :2])  # compile + settle
    best = 1e9
    for _ in range(3):
        tb2 = time.time()
        r = map_batch_flat_multi(codes_d, lens_d, index, ref_lens, p, CAP, G)
        np.asarray(r[0, :2])
        best = min(best, (time.time() - tb2) / G)
    map_batch_ms = best * 1000
    log(f"steady map_batch: {map_batch_ms:.2f} ms/batch at {n/1e9:.2f} GB index")

    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        hbm_in_use = int(ms.get("bytes_in_use", 0))
        hbm_limit = int(ms.get("bytes_limit", 0))
    except Exception:
        hbm_in_use = hbm_limit = 0

    table_slots = (index.keys.shape[0] // 2) if hasattr(index, "keys") else 0
    out = {
        "genome_gb": args.genome_gb,
        "n_unique_kminmers": int(n_unique),
        "build_cold_s": round(build_s, 1),
        "build_steady_s": round(steady_s, 1),
        "build_steady_mb_per_s": round(n / 1e6 / steady_s, 1),
        "table_slots": table_slots,
        "table_occupancy": round(n_unique / max(1, table_slots), 4),
        "n_reads": ev.n_reads,
        "mapped_frac": round(ev.n_mapped / ev.n_reads, 4),
        "e2e_reads_per_s": round(ev.n_reads / map_s, 1),
        "wrong": ev.n_wrong,
        "q60": ev.q60_total,
        "q60_wrong": ev.q60_wrong,
        "map_batch_ms_steady": round(map_batch_ms, 2),
        "hbm_bytes_in_use": hbm_in_use,
        "hbm_bytes_limit": hbm_limit,
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    assert ev.q60_wrong == 0 and ev.n_wrong == 0
    assert ev.n_mapped >= 0.9 * ev.n_reads
    return 0


if __name__ == "__main__":
    sys.exit(main())
