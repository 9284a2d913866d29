"""Roofline artifact: is the mapping pipeline bandwidth/latency-bound on this
tunneled v5e, and what would a bare chip do? (round-3 verdict item 9)

Measures, in ONE TPU session:
  1. the achieved elementwise HBM bandwidth ceiling (varied inputs, an
     order-dependent consumption, tiny scalar pull — the only honest recipe
     on this backend, DESIGN.md methodology),
  2. the unit cost of a [B*cap]-row gather (probe/chain stages are
     gather-LATENCY-bound, not byte-bound: measured ~1.4 ms each,
     width-independent),
  3. the in-situ truncated-pipeline stage deltas (r3_prof_map),
then derives per-stage achieved GB/s (analytic byte estimates from the known
intermediate shapes), the fraction of the measured ceiling, and a bare-v5e
projection (819 GB/s HBM, same gather latency assumed — conservative), and
writes experiments/roofline_v5e.md + .csv.

  python scripts/r4_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

T0 = time.time()
BARE_V5E_GBPS = 819.0  # v5e HBM spec bandwidth


def log(m):
    print(f"[roofline +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def measure_bw_ceiling():
    """Achieved elementwise read+write GB/s on a 256 MB int32 stream."""
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # 256 MB
    xs = [jnp.arange(n, dtype=jnp.int32) + i for i in range(4)]
    jax.block_until_ready(xs)

    @jax.jit
    def f(x):
        return x * 3 + 1

    np.asarray(f(xs[0])[:2])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        ys = [f(x) for x in xs]
        np.asarray(ys[-1][:2])
        best = min(best, (time.time() - t0) / len(xs))
    gbps = 2 * 4 * n / best / 1e9  # read + write
    log(f"elementwise ceiling: {gbps:.0f} GB/s ({best*1e3:.2f} ms / 512 MB moved)")
    return gbps


def measure_gather_unit(cap=512, B=256):
    """Unit cost of one [B*cap]-row gather from a table-sized source."""
    import jax
    import jax.numpy as jnp

    src = jnp.arange(2_000_000 * 2, dtype=jnp.int32).reshape(2_000_000, 2)
    idxs = [
        jnp.asarray(np.random.default_rng(i).integers(0, 2_000_000, (B, cap)))
        for i in range(4)
    ]
    jax.block_until_ready(idxs)

    @jax.jit
    def f(ix):
        g = jnp.take(src, ix.reshape(-1), axis=0)
        w = jnp.arange(g.shape[0], dtype=jnp.int32)[:, None]
        return jnp.sum(g * w, dtype=jnp.int32)

    np.asarray(f(idxs[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        vals = [f(ix) for ix in idxs]
        np.asarray(vals[-1])
        best = min(best, (time.time() - t0) / len(idxs))
    log(f"gather unit ([{B},{cap}] rows): {best*1e3:.2f} ms")
    return best


def stage_bytes(p, B=256, L=1 << 15, cap=1 << 9):
    """Analytic HBM traffic per 256-read batch, per stage (ESTIMATES from the
    current formulation's intermediate shapes; see ops/pallas_seeding.py,
    index/hashtable.py, ops/matching.py, ops/chaining.py)."""
    from mapquik_tpu.ops import pallas_seeding as ps

    cblk = ps._CBLK
    nblk = L // cblk
    # seeding: packed upload unpack (L/4 u8 in, L u8 out), kernel reads codes
    # once (+ halo), writes per-block compacted (hash, coord) i32 pairs; the
    # cross-block merge sort moves [B, nblk*256] x 3 operands ~ 3 passes; the
    # k-min-mer window mixing moves [B, cap] x ~8 i32 arrays.
    seed = B * (L // 4 + 2 * L + 2 * (L // cblk) * 256 * 4 * (1 + 1)
                + 3 * 3 * nblk * 256 * 4 + 8 * cap * 4)
    # probe: 2 gathers (keys [B*cap,8,2], payload hits [B*cap, 6]) — latency-
    # bound; bytes anyway:
    probe = B * cap * (8 * 2 * 4 + 6 * 4)
    # matching: [B, cap] shift-scan state, ~10 i32 arrays, log-depth passes
    match = B * cap * 4 * 10 * 4
    # chaining: bucket row sorts [B, cap] x ~6 operands x ~3 passes + 4-5 row
    # gathers
    chain = B * cap * 4 * 6 * 3
    return {"seed": seed, "+probe": probe, "+match": match, "+chain": chain}


def main():
    import jax

    log(f"device {jax.devices()[0]}")
    ceiling = measure_bw_ceiling()
    g_unit = measure_gather_unit()
    import r3_prof_map

    names, times = r3_prof_map.main()
    deltas = [times[0]] + [times[k] - times[k - 1] for k in range(1, len(times))]

    from mapquik_tpu.params import Params

    p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15,
               max_minimizers=1 << 9, batch_size=256)
    sbytes = stage_bytes(p)
    gather_counts = {"seed": 1, "+probe": 2, "+match": 0, "+chain": 5, "full": 1}

    rows = []
    for name, d in zip(names, deltas):
        by = sbytes.get(name)
        ach = (by / d / 1e9) if (by and d > 1e-5) else None
        ngath = gather_counts.get(name, 0)
        gather_ms = ngath * g_unit * 1e3
        # bare projection: bandwidth term scales by ceiling/BARE, gather
        # latency assumed unchanged (conservative: bare PCIe chips gather
        # faster)
        bw_ms = (by / (ceiling * 1e9)) * 1e3 if by else 0.0
        resid = max(0.0, d * 1e3 - bw_ms - gather_ms)
        proj = (by / (BARE_V5E_GBPS * 1e9) * 1e3 if by else 0.0) + gather_ms + resid
        rows.append((name, d * 1e3, by, ach, ngath, proj))

    total_ms = times[-1] * 1e3
    proj_ms = sum(r[5] for r in rows)
    os.makedirs("experiments", exist_ok=True)
    with open("experiments/roofline_v5e.csv", "w") as f:
        f.write("stage,ms_per_batch,bytes_est,achieved_gbps,gathers,bare_v5e_ms_proj\n")
        for name, ms, by, ach, ngath, proj in rows:
            f.write(f"{name},{ms:.2f},{by or ''},"
                    f"{f'{ach:.0f}' if ach else ''},{ngath},{proj:.2f}\n")
    with open("experiments/roofline_v5e.md", "w") as f:
        f.write(
            "# Roofline: map_batch on the tunneled v5e\n\n"
            f"Measured elementwise ceiling: **{ceiling:.0f} GB/s** "
            f"(bare v5e spec: {BARE_V5E_GBPS:.0f}).  \n"
            f"Measured [256,512]-row gather unit: **{g_unit*1e3:.2f} ms** "
            "(latency-bound, width-independent).\n\n"
            "| stage | ms/batch (in-situ delta) | est. bytes | achieved GB/s | "
            "gathers | bare-v5e ms (proj.) |\n|---|---|---|---|---|---|\n"
        )
        for name, ms, by, ach, ngath, proj in rows:
            f.write(f"| {name} | {ms:.2f} | "
                    f"{f'{by/1e6:.0f} MB' if by else '—'} | "
                    f"{f'{ach:.0f}' if ach else '—'} | {ngath} | {proj:.2f} |\n")
        f.write(
            f"\nTotal in-situ: **{total_ms:.1f} ms/batch** "
            f"({256/total_ms*1000:.0f} reads/s/chip); bare-v5e projection "
            f"(bandwidth terms scaled to {BARE_V5E_GBPS:.0f} GB/s, gather "
            f"latency held constant): **{proj_ms:.1f} ms/batch** "
            f"({256/proj_ms*1000:.0f} reads/s/chip).\n\n"
            "Byte counts are analytic estimates from the current intermediate "
            "shapes (stage_bytes in scripts/r4_roofline.py); times are "
            "measured truncated-pipeline deltas (varied inputs, "
            "order-dependent consumption, scalar pulls). A stage whose "
            "achieved GB/s is near the measured ceiling cannot be made faster "
            "on THIS tunneled chip by reformulation — only by moving fewer "
            "bytes or fewer gathers.\n"
        )
    log(f"artifact written: experiments/roofline_v5e.md "
        f"(total {total_ms:.1f} ms/batch, bare projection {proj_ms:.1f})")


if __name__ == "__main__":
    main()
