"""Round-3 probe #2: G=8 unroll, CBLK=2048 seeding kernel, h2d rates, and the
native-pack e2e Mapper path — one TPU session, index cached on disk across runs.

Usage: python scripts/r3_probe2.py [g8] [cblk] [h2d] [e2e]   (default: all)
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

T0 = time.time()
CACHE = "/tmp/r3_probe_index.npz"


def log(m):
    print(f"[probe2 +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    which = set(sys.argv[1:]) or {"g8", "cblk", "h2d", "e2e"}
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.index.serialize import save_index, load_index, params_key
    from mapquik_tpu.ops import pallas_seeding
    from mapquik_tpu.ops.pipeline import (
        Mapper, map_batch_flat_multi, unflatten_map_result, format_paf,
    )
    from mapquik_tpu.oracle.pyref import encode

    B, L = 256, 1 << 15
    n_batches = 16
    p = Params(k=7, l=31, density=0.01, max_read_len=L, max_minimizers=1 << 9,
               batch_size=B)
    log(f"device {jax.devices()[0]}")
    genome = markov_genome(16_000_000, seed=11, n_contigs=4)
    reads = simulate_reads(genome, B * n_batches, mean_len=24_000, accuracy=0.99,
                           seed=12)
    pk = params_key(p)
    if os.path.exists(CACHE):
        index, meta = load_index(CACHE, pk)
        log(f"index loaded from cache: {index.n} keys")
    else:
        log("building index (host path)")
        index, meta = build_index(genome, p, device=False)
        jax.block_until_ready(jax.tree.leaves(index))
        save_index(CACHE, index, meta, pk)
        log(f"index built + cached: {index.n} keys")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    def stage_groups(G):
        groups = []
        for i in range(0, n_batches, G):
            codes = np.full((G, B, L), 4, np.uint8)
            lens = np.zeros((G, B), np.int32)
            for g in range(G):
                chunk = reads[(i + g) * B : (i + g + 1) * B]
                for j, (_, seq) in enumerate(chunk):
                    c = encode(seq)[:L]
                    codes[g, j, : len(c)] = c
                    lens[g, j] = len(c)
            groups.append((jnp.asarray(codes), jnp.asarray(lens)))
        jax.block_until_ready([g_[0] for g_ in groups])
        return groups

    def time_groups(name, G, groups):
        fn = lambda c, n: map_batch_flat_multi(c, n, index, ref_lens, p,
                                               p.max_minimizers, G)
        r = fn(*groups[0])
        np.asarray(r[0, :2])
        log(f"{name}: compiled")
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            outs = [fn(*a) for a in groups]
            jax.block_until_ready(outs)
            np.asarray(outs[-1][0, :2])
            best = min(best, time.time() - t0)
        per = best / n_batches * 1e3
        log(f"{name}: {per:.2f} ms/256-read batch ({n_batches * B / best:.0f} reads/s)")
        return outs

    CBLK = pallas_seeding._CBLK  # import-time constant (MAPQUIK_CBLK env)
    g4 = stage_groups(4)
    outs4 = time_groups(f"G=4 (CBLK={CBLK})", 4, g4)
    ref_flat = [np.asarray(o) for o in outs4]
    import hashlib

    chk = hashlib.md5(b"".join(a.tobytes() for a in ref_flat)).hexdigest()[:16]
    log(f"g4 checksum {chk}")

    if "g8" in which:
        g8 = stage_groups(8)
        time_groups(f"G=8 (CBLK={CBLK})", 8, g8)

    if "cblk" in which:
        # CBLK A/B: _CBLK and its derived block shapes (block_cap, _WC) are
        # IMPORT-TIME constants, so the alternative width runs in a re-exec'd
        # child with MAPQUIK_CBLK set (ADVICE r3: mutating the module global
        # at runtime times the wrong kernel and corrupts later stages)
        import subprocess

        alt = os.environ.get("MAPQUIK_CBLK_ALT", "4096")
        log(f"re-exec child with MAPQUIK_CBLK={alt} for the A/B")
        env = os.environ.copy()
        env["MAPQUIK_CBLK"] = alt
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "base"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        child_chk = None
        for line in r.stderr.splitlines():
            log(f"  [child] {line.split('] ', 1)[-1]}")
            if "g4 checksum" in line:
                child_chk = line.rsplit(" ", 1)[-1]
        log(f"CBLK={alt} results identical to CBLK={CBLK}: {child_chk == chk}")

    if "h2d" in which:
        pk2 = np.random.default_rng(0).integers(0, 255, (4, B, L // 4),
                                                dtype=np.uint8)
        warm = np.ascontiguousarray(pk2)
        for tag, buf in (("fresh", None), ("warm-reused", warm)):
            ts = []
            for i in range(10):
                src = (np.random.default_rng(i).integers(
                    0, 255, (4, B, L // 4), dtype=np.uint8) if buf is None else buf)
                t0 = time.time()
                d = jnp.asarray(src)
                jax.block_until_ready(d)
                ts.append(time.time() - t0)
            mb = src.nbytes / 1e6
            log(f"h2d {tag}: median {np.median(ts) * 1e3:.1f} ms for {mb:.1f} MB "
                f"({mb / np.median(ts):.0f} MB/s)")

    if "e2e" in which:
        mapper = Mapper.from_index(index, meta, p)
        n_lines = sum(1 for _ in mapper.map_reads(reads))  # warm compiles
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            n_lines = sum(1 for _ in mapper.map_reads(reads))
            best = min(best, time.time() - t0)
        log(f"e2e Mapper: {len(reads) / best:.0f} reads/s ({n_lines} PAF lines)")


if __name__ == "__main__":
    main()
