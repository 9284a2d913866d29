"""Round-5 probe: where do the ~95 ms/chunk of device index extraction go?

The r5 build profile shows extract = 1.05 s for 11 chunks at 64 MB — both on
the segment-resident path AND the old per-batch-upload path, i.e. the cost is
in the chunk PROGRAM, not the transfers. Candidates: seed_batch at the ref
shapes (cap=1024 vs the read path's 512), the [1, SEG] unpack, the [W, L]
gather, the ownership cumsum, or a fixed per-program relay execution cost.

Times, chained with varied j / varied inputs, best of 3 passes:
  a) full seg-extract program (the production chunk)
  b) gather-only variant (unpack + gather + checksum) — data movement share
  c) seed-only variant (seed_batch + ownership on pre-staged rows)
  d) seed-only at cap 512 (the read path's cap) — cap sensitivity
Run alone — the tunnel is single-tenant.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()


def log(m):
    print(f"[xcost +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome
    from mapquik_tpu.index.build import plan_windows
    from mapquik_tpu.index.device_build import META_CHUNKS, _make_seg_extract, _ownership
    from mapquik_tpu.io import native as _native
    from mapquik_tpu.ops import seeding

    p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15,
               max_minimizers=1 << 9)
    cap = p.ref_window_minimizers  # 1024
    W, L, SEG = 256, 1 << 15, 1 << 25
    log(f"device {jax.devices()[0]}; SEG {SEG>>20}MB, W={W}, L={L}, cap={cap}")
    codes = markov_genome(SEG, seed=11, n_contigs=1)[0][1]
    codes = codes if isinstance(codes, np.ndarray) else _native.encode_any(codes)
    wins = plan_windows(codes, p)
    n_chunks = min(META_CHUNKS, (len(wins) + W - 1) // W)
    log(f"{len(wins)} windows -> timing {n_chunks} chunks")

    p2_buf = np.zeros(SEG // 4, np.uint8)
    mask_buf = np.zeros(SEG // 8, np.uint8)
    _native.pack2_rows([codes], np.asarray([SEG], np.int32), SEG,
                       p2_buf.reshape(1, -1), mask_buf.reshape(1, -1))
    meta = np.zeros((META_CHUNKS, 5, W), np.int32)
    for ci in range(n_chunks):
        for bi, (cs, ce, se) in enumerate(wins[ci * W : (ci + 1) * W]):
            meta[ci] [:, bi] = (se - cs, cs, cs, ce, se)
    seg_p2 = jnp.asarray(p2_buf)
    seg_mask = jnp.zeros(SEG // 8, jnp.uint8)
    meta_d = jnp.asarray(meta)
    n_contig = np.int32(SEG)

    res = {}

    def timeit(name, call, n=n_chunks):
        out = call(0)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[:2]
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            outs = [call(j) for j in range(n)]
            jax.block_until_ready(outs)
            np.asarray(jax.tree.leaves(outs[-1])[0]).reshape(-1)[:2]
            best = min(best, time.time() - t0)
        per = best / n * 1e3
        res[name] = round(per, 2)
        log(f"{name}: {per:.2f} ms/chunk")

    # a) full production chunk program
    fn = _make_seg_extract(p, cap, L, W, SEG)
    base = jnp.zeros((), jnp.int32)
    timeit("full", lambda j: fn(seg_p2, seg_mask, np.int32(SEG), meta_d,
                                np.int32(j), n_contig, base, np.int32(0)))

    # b) gather-only: unpack + row gather + checksum
    @jax.jit
    def gather_only(j):
        m = jax.lax.dynamic_index_in_dim(meta_d, j, 0, keepdims=False)
        lens, cs_rel = m[0], m[1]
        codes_seg = seeding.unpack2(
            seg_p2[None, :], seg_mask[None, :], SEG,
            jnp.full((1,), SEG, jnp.int32))[0]
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        idx = jnp.minimum(cs_rel[:, None] + pos, SEG - 1)
        rows = jnp.take(codes_seg, idx.reshape(-1), axis=0).reshape(W, L)
        rows = jnp.where(pos < lens[:, None], rows, jnp.uint8(4))
        return rows.astype(jnp.int32).sum()

    timeit("gather_only", lambda j: gather_only(np.int32(j)))

    # c/d) seed-only on pre-staged rows at ref cap and read cap
    rows_h = np.full((W, L), 4, np.uint8)
    for bi, (cs, ce, se) in enumerate(wins[:W]):
        rows_h[bi, : se - cs] = codes[cs:se]
    lens_h = np.asarray([se - cs for (cs, ce, se) in wins[:W]]
                        + [0] * (W - min(W, len(wins))), np.int32)[:W]
    rows_d, lens_d = jnp.asarray(rows_h), jnp.asarray(lens_h)
    csa = jnp.asarray(meta[0, 2]); cea = jnp.asarray(meta[0, 3])
    sea = jnp.asarray(meta[0, 4])

    for name, c in (("seed_cap1024", cap), ("seed_cap512", 512)):
        @functools.partial(jax.jit, static_argnames=("c_",))
        def seed_only(x, c_=c):
            sb = seeding.seed_batch(rows_d, lens_d, p, c_)
            return _ownership(sb, csa, cea, sea, n_contig,
                              jnp.zeros((), jnp.int32), np.int32(0), c_)
        timeit(name, lambda j: seed_only(np.int32(j)), n=4)

    # e) W=512 chunks: halves the chunk count — wins iff the cost is a fixed
    # per-program tax rather than per-window compute
    W2 = 512
    meta2 = np.zeros((META_CHUNKS, 5, W2), np.int32)
    n2 = min(META_CHUNKS, (len(wins) + W2 - 1) // W2)
    for ci in range(n2):
        for bi, (cs, ce, se) in enumerate(wins[ci * W2 : (ci + 1) * W2]):
            meta2[ci][:, bi] = (se - cs, cs, cs, ce, se)
    meta2_d = jnp.asarray(meta2)
    fn2 = _make_seg_extract(p, cap, L, W2, SEG)
    base = jnp.zeros((), jnp.int32)
    timeit("full_W512", lambda j: fn2(seg_p2, seg_mask, np.int32(SEG), meta2_d,
                                      np.int32(j), n_contig, base, np.int32(0)),
           n=n2)
    res["note"] = "full_W512 is per 512-window chunk (2x windows of the others)"
    print(json.dumps({"extract_cost_ms_per_chunk": res}))


if __name__ == "__main__":
    main()
