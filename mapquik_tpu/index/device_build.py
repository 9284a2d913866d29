"""Device-resident reference index build: zero bulk device->host transfers.

The host-path builder (index/build.py) pulls every window batch's seed arrays
to the host (d2h on this environment moves ~20-34 MB/s vs ~1 GB/s h2d — the
round-1 build was d2h-bound at ~9.5 MB/s steady) and dedups/places in numpy.
Here everything after the (fast) uploads stays on device:

  - per window batch, one jitted program extracts seeds (ops/seeding) and
    computes ownership + contig-global offsets via a carried base scalar;
  - batch outputs accumulate on device; a concat + sort-by-(h1,h2) program
    tombstones duplicated keys (the reference's uniqueness heuristic,
    src/index.rs:94-104, as a neighbor-equality segment op) and compacts
    unique seeds to a prefix;
  - a two-choice placement program assigns each key a slot with two segmented
    bucket sorts (first-fit b1, spill into b2's remaining capacity) and
    scatters the bucketed table (index/hashtable.py layout) — measured on
    v5e: 1D sorts run 40M elements in ~0.11 s, so placement is sort-bound.

The ONLY pulls are a handful of scalars (n_unique, overflow/halo/placement
flags). Exactness: an overflow or halo-drop flag anywhere makes this builder
return None and the caller falls back to the host builder (rare by
Params.auto sizing; the flags make silent degradation impossible); placement
failure retries with a doubled table.

Probe semantics are identical to the host-built table (same bucket functions,
same key set; verified by tests); slot ORDER within buckets may differ (the
host builder places greedily in key order, this one in bucket-rank order) —
probes are order-blind.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

from ..oracle.pyref import encode
from ..io import native as _native_enc
from ..params import Params
from .build import RefMeta, plan_windows
from .hashtable import BUCKET, HashIndex

_EMPTY = np.uint32(0xFFFFFFFF)


def _ownership(sb, cs, ce, se, n_contig, base, rid, cap):
    """Window-ownership + contig-global numbering for one extracted batch:
    a k-min-mer belongs to the window whose CORE contains its start (cores
    are disjoint and cover the contig), numbered in contig order via the
    carried `base` scalar. Shared by the per-batch-upload and the
    segment-resident extract programs so they stay bit-identical."""
    import jax.numpy as jnp

    slot = jnp.arange(cap, dtype=jnp.int32)[None, :]
    st_abs = sb.start + cs[:, None]
    owned = (slot < sb.n[:, None]) & (st_abs < ce[:, None])
    ownedf = owned.reshape(-1).astype(jnp.int32)
    offset = jnp.cumsum(ownedf) - 1 + base
    new_base = base + jnp.sum(ownedf)
    ovf = jnp.any(sb.overflow)
    drop = jnp.any((se < n_contig) & (sb.tail_start < (ce - cs)))
    of = owned.reshape(-1)
    return (
        jnp.where(of, sb.h1.reshape(-1), _EMPTY),
        jnp.where(of, sb.h2.reshape(-1), _EMPTY),
        jnp.where(of, st_abs.reshape(-1), 0),
        jnp.where(of, (sb.end + cs[:, None]).reshape(-1), 0),
        offset * ownedf,
        jnp.where(of, (rid << 1) | sb.rev.reshape(-1).astype(jnp.int32), 0),
        new_base,
        jnp.stack([ovf, drop]),
    )


@functools.lru_cache(maxsize=8)
def _make_batch_extract(p: Params, cap: int, L: int):
    """Cached: a fresh @jax.jit closure per build would recompile every
    program on every build (measured 95-154 s per WARM rebuild through the
    relay before caching)."""
    import jax

    from ..ops import seeding

    @jax.jit
    def run(p2, mask, lens, cs, ce, se, n_contig, base, rid):
        sb = seeding.seed_batch(seeding.unpack2(p2, mask, L, lens), lens, p, cap)
        return _ownership(sb, cs, ce, se, n_contig, base, rid, cap)

    return run


# chunk-metadata rows per meta block: ONE [META_CHUNKS, 5, W] int32 upload
# covers up to META_CHUNKS window batches (~24 ms of post-execution h2d
# latency PER ARRAY otherwise — five tiny arrays per chunk cost ~1.0 s of the
# 64 MB build's 2.2 s in the r5 build profile)
META_CHUNKS = 16


@functools.lru_cache(maxsize=16)
def _make_seg_extract(p: Params, cap: int, L: int, W: int, SEG: int):
    """Segment-resident extraction: window BYTES never cross the tunnel per
    batch — each contig's 2-bit-packed codes upload ONCE per SEG-base segment
    and every [W, L] window batch is GATHERED out of the device-resident
    segment (one flat 1D take; v5e runs 1D gathers at stream speed). Replaces
    the per-batch window upload, which re-sent every halo byte (~25-33%
    duplicates) over a tunnel whose post-execution h2d runs ~24-35 MB/s
    (experiments/r5_transfer_modes.md). Chunk metadata arrives as one
    [META_CHUNKS, 5, W] block (rows: lens, cs_rel, cs, ce, se) indexed by the
    scalar j, so per-chunk h2d latency is paid once per block. Output is
    bit-identical to _make_batch_extract: rows are reconstructed as
    codes[cs:se] padded with INVALID, then flow through the same seed_batch +
    _ownership."""
    import jax
    import jax.numpy as jnp

    from ..ops import seeding

    @jax.jit
    def run(seg_p2, seg_mask, seg_len, meta, j, n_contig, base, rid):
        m = jax.lax.dynamic_index_in_dim(meta, j, 0, keepdims=False)
        lens, cs_rel, cs, ce, se = (m[i] for i in range(5))
        codes_seg = seeding.unpack2(
            seg_p2[None, :], seg_mask[None, :], SEG,
            seg_len.reshape(1).astype(jnp.int32),
        )[0]
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        idx = jnp.minimum(cs_rel[:, None] + pos, SEG - 1)
        rows = jnp.take(codes_seg, idx.reshape(-1), axis=0).reshape(W, L)
        rows = jnp.where(pos < lens[:, None], rows, jnp.uint8(4))
        sb = seeding.seed_batch(rows, lens, p, cap)
        return _ownership(sb, cs, ce, se, n_contig, base, rid, cap)

    return run


def _dedup(cols):
    """Sort by (h1, h2) and tombstone duplicated keys (keep mask). Unowned
    slots carry the sentinel key; they and the duplicates stay in place (the
    placement pass keys them out) — no compaction sort needed."""
    import jax
    import jax.numpy as jnp

    # lexicographic (h1, h2) via two STABLE single-key passes (LSD radix):
    # a variadic sort with num_keys=2 falls off XLA's radix fast path into a
    # comparator network — measured 173 s to COMPILE at 131k elements vs
    # seconds for num_keys=1
    h1, h2, st, en, off, ridrc = cols
    h2, h1, st, en, off, ridrc = jax.lax.sort(
        [h2, h1, st, en, off, ridrc], dimension=0, num_keys=1, is_stable=True
    )
    h1, h2, st, en, off, ridrc = jax.lax.sort(
        [h1, h2, st, en, off, ridrc], dimension=0, num_keys=1, is_stable=True
    )
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), (h1[1:] == h1[:-1]) & (h2[1:] == h2[:-1])]
    )
    same_next = jnp.concatenate([same_prev[1:], jnp.zeros(1, bool)])
    sentinel = (h1 == _EMPTY) & (h2 == _EMPTY)
    keep = ~(same_prev | same_next | sentinel)
    return (h1, h2, st, en, off, ridrc), keep


def _segment_rank(key_sorted):
    """Rank of each element within its equal-key run (sorted input): a
    cumulative max over run-start indices (lax.cummax keeps the compiled
    graph tiny; an unrolled shift-scan here blew XLA compile time up)."""
    import jax
    import jax.numpy as jnp

    n = key_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), key_sorted[1:] != key_sorted[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(boundary, idx, -1), axis=0)
    return idx - seg_start


def _placement(S: int, h1, h2, valid):
        """Demand-balanced two-choice placement: each key aims first at the
        bucket with the smaller TOTAL demand (round-2 used first-fit-b1, which
        fills popular b1 buckets to capacity and wastes b2 headroom — it
        started failing per-mille around load 0.5, forcing the table to run at
        load 0.25). Balanced-greedy measures ZERO failures through load 0.5
        (onset ~0.52, scripts/r3_placement_load.py), so the table runs at
        0.45 — 1.8x smaller. Probe semantics unchanged (same two candidate
        buckets)."""
        import jax
        import jax.numpy as jnp

        n = h1.shape[0]
        mask = np.uint32(S - 1)
        b1 = (h1 & mask).astype(jnp.int32)
        b2 = ((h2 ^ (h1 >> 16)) & mask).astype(jnp.int32)
        big = jnp.int32(S)
        idx = jnp.arange(n, dtype=jnp.int32)
        v_i = valid.astype(jnp.int32)
        d1 = jnp.zeros(S, jnp.int32).at[jnp.where(valid, b1, 0)].add(v_i)
        d2 = jnp.zeros(S, jnp.int32).at[jnp.where(valid, b2, 0)].add(v_i)
        use2 = d2[b2] < d1[b1]
        first = jnp.where(use2, b2, b1)
        second = jnp.where(use2, b1, b2)
        # pass 1: group by first choice; the first BUCKET of each group place
        k1 = jnp.where(valid, first, big)
        k1s, perm = jax.lax.sort([k1, idx], dimension=0, num_keys=1)
        r1 = _segment_rank(k1s)
        placed1 = (r1 < BUCKET) & (k1s < big)
        slot1 = jnp.where(placed1, k1s * BUCKET + r1, -1)
        count1 = jnp.zeros(S, jnp.int32).at[jnp.where(k1s < big, k1s, 0)].add(
            placed1.astype(jnp.int32)
        )
        # pass 2: spilled keys group by their other choice, fill remaining capacity
        b2p = second[perm]
        k2 = jnp.where((k1s < big) & ~placed1, b2p, big)
        k2s, perm2 = jax.lax.sort([k2, perm], dimension=0, num_keys=1)
        r2 = _segment_rank(k2s)
        occ2 = count1[jnp.where(k2s < big, k2s, 0)]
        placed2 = (r2 < BUCKET - occ2) & (k2s < big)
        slot2 = jnp.where(placed2, k2s * BUCKET + occ2 + r2, -1)
        slot_of = jnp.full(n, -1, jnp.int32)
        slot_of = slot_of.at[perm].max(slot1)
        slot_of = slot_of.at[perm2].max(slot2)
        fail = jnp.sum((valid & (slot_of < 0)).astype(jnp.int32))
        return slot_of, fail


def _materialize(S: int, slot_of, h1, h2, st, en, off, ridrc):
    import jax
    import jax.numpy as jnp

    # unplaced/invalid rows scatter into a dump slot that is sliced off.
    # 128-lane-grouped (keys, pay) rows (index/hashtable.py): 1D scatters
    # into the flattened arrays, final zero-copy-sized reshape to [rows, 128]
    # — the round-3 [S, BUCKET, NCOL] layout's tiny minor dims got
    # tile-padded 16-21x by XLA, which tried to allocate 51.5 GB for the
    # nominally 3.2 GB CHM13-scale table.
    from .hashtable import key_lane, pay_lane

    slot = jnp.where(slot_of >= 0, slot_of, S * BUCKET)
    KR = (S // 8) * 128
    PR = (S * BUCKET // 32) * 128
    kb = key_lane(slot)
    pb = pay_lane(slot)
    keys = jnp.full(KR + 128, -1, jnp.int32)
    keys = keys.at[kb].set(jax.lax.bitcast_convert_type(h1, jnp.int32))
    keys = keys.at[kb + 1].set(jax.lax.bitcast_convert_type(h2, jnp.int32))
    pay = jnp.zeros(PR + 128, jnp.int32)
    pay = pay.at[pb].set(ridrc)
    pay = pay.at[pb + 1].set(st)
    pay = pay.at[pb + 2].set(en)
    pay = pay.at[pb + 3].set(off)
    return keys[:KR].reshape(-1, 128), pay[:PR].reshape(-1, 128)


@functools.lru_cache(maxsize=2)
def _make_dedup():
    """Concat + dedup, S-INDEPENDENT: run once per build so the per-batch
    accumulations (6+ GB at CHM13 scale) can be FREED before the
    S-parameterized placement/materialize stages — holding both through
    materialize exhausted HBM at 3.1 GB genome scale."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dedup(batch_cols):
        cols = tuple(jnp.concatenate([b[i] for b in batch_cols]) for i in range(6))
        return _dedup(cols)

    def run(batch_cols):
        from ..utils.aot import cached_program_memo

        d = cached_program_memo("ixb_dedup", dedup, (batch_cols,))
        return d(batch_cols)

    return run


@functools.lru_cache(maxsize=8)
def _make_finalize(S: int):
    """Placement + materialize at table size S (dedup runs separately, see
    _make_dedup). Split into jitted programs: one merged program mixes big
    sorts, scans and scatters and sends XLA compile time through the roof on
    this backend. Chaining them host-side costs nothing — no values are
    pulled between stages."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def place(h1, h2, keep):
        return _placement(S, h1, h2, keep)

    @jax.jit
    def mat(slot_of, h1, h2, st, en, off, ridrc, keep, fail):
        keys, pay = _materialize(S, slot_of, h1, h2, st, en, off, ridrc)
        # n_unique and fail ride out TOGETHER: each scalar d2h pull costs
        # ~30-130 ms of tunnel latency, so the caller pulls this pair once
        return keys, pay, jnp.stack([jnp.sum(keep.astype(jnp.int32)), fail])

    def run(cols, keep):
        # each stage resolves through the AOT executable cache on first use
        # (r4 cold-start finding: the warm child burned ~150 s in compiles
        # OUTSIDE the then-cached programs — these finalize stages and the
        # extract program were the uncached residue)
        from ..utils.aot import cached_program_memo

        pl = cached_program_memo(
            f"ixb_place_S{S}", place, (cols[0], cols[1], keep), S
        )
        slot_of, fail = pl(cols[0], cols[1], keep)
        m = cached_program_memo(
            f"ixb_mat_S{S}", mat, (slot_of, *cols, keep, fail), S
        )
        keys, pay, nf = m(slot_of, *cols, keep, fail)
        return keys, pay, nf

    return run


def _extract_batches(
    encoded, p: Params, cap: int, L: int, batch_windows: int,
    use_native_pack: bool, run, _bp, profiling: bool, verbose,
):
    """Round-3/4 per-batch-upload extraction (the segment path's A/B foil).

    Window batches feed through ONE native C assembly+pack pass straight
    from the contig's code buffer (io/native.pack2_rows) into reused upload
    buffers; batches feed in PHASE GROUPS of _GROUP: pack all (host), upload
    all (device idle), dispatch all (no transfers in flight), then ONE tiny
    scalar pull as the completion barrier (~30-130 ms latency, amortized
    over the group)."""
    import jax
    import jax.numpy as jnp
    from time import perf_counter as _pc

    from ..io import native as _native
    from ..ops import seeding

    batches = []
    flag_acc = jnp.zeros(2, bool)
    total_windows = 0
    _GROUP = 8
    _ring = [
        (np.zeros((batch_windows, L // 4), dtype=np.uint8),
         np.zeros((batch_windows, L // 8), dtype=np.uint8))
        for _ in range(_GROUP + 1)
    ]
    _ri = 0
    arr = None
    zmask = None
    pending: List[tuple] = []
    base = jnp.zeros((), jnp.int32)

    def flush_pending():
        """Upload every pending batch, then dispatch, then await completion."""
        nonlocal base, flag_acc, zmask
        if not pending:
            return
        ups = []
        t0 = _pc()
        for (p2_buf, mask_buf, has_n, lens, csa, cea, sea, n_contig, rid,
             new_contig) in pending:
            # N-free windows (the usual case) skip the mask upload: 1/3 of
            # the build's upload bytes on an upload-bound path
            if has_n:
                mask_d = jnp.asarray(mask_buf)
            else:
                if zmask is None:
                    zmask = jnp.zeros((batch_windows, L // 8), jnp.uint8)
                mask_d = zmask
            ups.append((
                jnp.asarray(p2_buf), mask_d, jnp.asarray(lens),
                jnp.asarray(csa), jnp.asarray(cea), jnp.asarray(sea),
                n_contig, rid, new_contig,
            ))
        pending.clear()
        if profiling:
            jax.block_until_ready([u[0] for u in ups])
        _bp("upload", t0)
        t0 = _pc()
        for p2_d, mask_d, lens_d, cs_d, ce_d, se_d, n_contig, rid, nc in ups:
            if nc:
                base = jnp.zeros((), jnp.int32)  # offsets restart per contig
            out = run(p2_d, mask_d, lens_d, cs_d, ce_d, se_d, n_contig, base,
                      np.int32(rid))
            batches.append(out[:6])
            base = out[6]
            flag_acc = flag_acc | out[7]
        np.asarray(base)  # completion barrier: next group uploads to an idle device
        _bp("extract", t0)

    for rid, (codes, wins) in enumerate(encoded):
        if not wins:
            continue
        if verbose:
            verbose(
                f"device-extracting contig ({codes.shape[0]} bp, {len(wins)} windows)"
            )
        total_windows += len(wins)
        n_contig = np.int32(codes.shape[0])
        for i in range(0, len(wins), batch_windows):
            t0 = _pc()
            chunk = wins[i : i + batch_windows]
            lens = np.zeros(batch_windows, dtype=np.int32)
            csa = np.zeros(batch_windows, dtype=np.int32)
            cea = np.zeros(batch_windows, dtype=np.int32)
            sea = np.zeros(batch_windows, dtype=np.int32)
            rows: List = [None] * batch_windows
            for bi, (cs, ce, se) in enumerate(chunk):
                rows[bi] = codes[cs:se]
                lens[bi] = se - cs
                csa[bi], cea[bi], sea[bi] = cs, ce, se
            p2_buf, mask_buf = _ring[_ri % len(_ring)]
            _ri += 1
            if use_native_pack:
                has_n = _native.pack2_rows(rows, lens, L, p2_buf, mask_buf)
                assert has_n is not None
            else:
                if arr is None:
                    arr = np.full((batch_windows, L), 4, dtype=np.uint8)
                arr[:] = 4
                for bi, r in enumerate(rows):
                    if r is not None:
                        arr[bi, : r.shape[0]] = r
                p2n, maskn = seeding.pack2_host(arr, lens)
                p2_buf[:], mask_buf[:] = p2n, maskn
                has_n = int(maskn.any())
            pending.append((
                p2_buf, mask_buf, has_n, lens, csa, cea, sea, n_contig, rid,
                i == 0,
            ))
            _bp("pack", t0)
            if len(pending) >= _GROUP:
                flush_pending()
    flush_pending()
    return batches, flag_acc, total_windows


def _extract_segments(
    encoded, p: Params, cap: int, L: int, batch_windows: int,
    use_native_pack: bool, _bp, profiling: bool, verbose,
):
    """Segment-resident extraction (r5 default): per contig, pack the codes
    once and upload them in <=64 MB-base segments; every window batch is a
    device-side gather out of the resident segment (_make_seg_extract), so
    the only per-batch h2d traffic is four tiny int32 arrays. Segment sizes
    snap to powers of two in [4 MB, 64 MB] bases to bound the compiled-shape
    count; a 2-deep buffer ring per size class keeps host packing off
    in-flight uploads. Bit-identical to _extract_batches (shared seed_batch +
    _ownership; device-vs-host equality is test-gated)."""
    import jax
    import jax.numpy as jnp
    from time import perf_counter as _pc

    from ..io import native as _native
    from ..ops import seeding
    from ..utils.aot import cached_program_memo

    MINSEG = 1 << 20   # 1 MB bases: small contigs/test genomes should not pay
                       # a multi-MB unpack+gather per chunk (1-core CPU mesh)
    MAXSEG = 1 << 26
    W = batch_windows
    batches = []
    flag_acc = jnp.zeros(2, bool)
    total_windows = 0
    rings = {}   # SEG -> ([(p2, mask), ...], next_index)
    zmasks = {}
    in_flight: set = set()  # host buffer ids with un-barriered async uploads
    base_holder = [jnp.zeros((), jnp.int32)]

    def seg_buffers(SEG):
        """3-deep ring per size class; a barrier is only taken when a buffer
        with a possibly-in-flight upload would be overwritten (uploads run
        ASYNC and overlap extraction — the r5 overlap A/B measured h2d during
        compute as safe, refuting the round-3 stall theory)."""
        ring = rings.get(SEG)
        if ring is None:
            ring = [[
                (np.zeros(SEG // 4, np.uint8), np.zeros(SEG // 8, np.uint8))
                for _ in range(3)
            ], 0]
            rings[SEG] = ring
        bufs, i = ring
        ring[1] = (i + 1) % len(bufs)
        pair = bufs[i]
        if id(pair[0]) in in_flight:
            np.asarray(base_holder[0])  # all prior extracts (and their
            in_flight.clear()           # input transfers) have completed
        return pair

    for rid, (codes, wins) in enumerate(encoded):
        if not wins:
            continue
        if verbose:
            verbose(
                f"device-extracting contig ({codes.shape[0]} bp, "
                f"{len(wins)} windows, segment-resident)"
            )
        total_windows += len(wins)
        n_contig = np.int32(codes.shape[0])
        base_holder[0] = jnp.zeros((), jnp.int32)  # offsets restart per contig
        wi = 0
        while wi < len(wins):
            seg_base = wins[wi][0] & ~3
            span = codes.shape[0] - seg_base
            SEG = 1 << int(np.ceil(np.log2(max(span, 1))))
            SEG = max(MINSEG, min(MAXSEG, SEG))
            wj = wi
            while (wj < len(wins) and wins[wj][2] - seg_base <= SEG
                   and wj - wi < META_CHUNKS * W):
                wj += 1
            assert wj > wi, "window exceeds the maximum segment size"
            seg_len = min(seg_base + SEG, codes.shape[0]) - seg_base
            t0 = _pc()
            p2_buf, mask_buf = seg_buffers(SEG)
            lens1 = np.asarray([seg_len], np.int32)
            if use_native_pack:
                has_n = _native.pack2_rows(
                    [codes[seg_base : seg_base + seg_len]], lens1, SEG,
                    p2_buf.reshape(1, -1), mask_buf.reshape(1, -1),
                )
                assert has_n is not None
            else:
                arr = np.full((1, SEG), 4, dtype=np.uint8)
                arr[0, :seg_len] = codes[seg_base : seg_base + seg_len]
                p2n, maskn = seeding.pack2_host(arr, lens1)
                p2_buf[:], mask_buf[:] = p2n[0], maskn[0]
                has_n = int(maskn.any())
            # chunk-metadata block: rows (lens, cs_rel, cs, ce, se) x chunk
            n_chunks = (wj - wi + W - 1) // W
            meta = np.zeros((META_CHUNKS, 5, W), dtype=np.int32)
            for ci in range(n_chunks):
                for bi, (cs, ce, se) in enumerate(
                    wins[wi + ci * W : wi + (ci + 1) * W]
                ):
                    meta[ci, 0, bi] = se - cs
                    meta[ci, 1, bi] = cs - seg_base
                    meta[ci, 2, bi] = cs
                    meta[ci, 3, bi] = ce
                    meta[ci, 4, bi] = se
            _bp("pack", t0)
            t0 = _pc()
            seg_p2_d = jnp.asarray(p2_buf)
            in_flight.add(id(p2_buf))
            if has_n:
                seg_mask_d = jnp.asarray(mask_buf)
            else:
                zm = zmasks.get(SEG)
                if zm is None:
                    zm = jnp.zeros(SEG // 8, jnp.uint8)
                    zmasks[SEG] = zm
                seg_mask_d = zm
            meta_d = jnp.asarray(meta)
            if profiling:
                jax.block_until_ready((seg_p2_d, seg_mask_d, meta_d))
            _bp("upload", t0)
            t0 = _pc()
            fn = _make_seg_extract(p, cap, L, W, SEG)
            for ci in range(n_chunks):
                args = (seg_p2_d, seg_mask_d, np.int32(seg_len), meta_d,
                        np.int32(ci), n_contig, base_holder[0], np.int32(rid))
                prog = cached_program_memo(
                    f"ixb_segx_c{cap}_L{L}_S{SEG}", fn, args,
                    (repr(p), cap, L, W, SEG, META_CHUNKS),
                )
                out = prog(*args)
                batches.append(out[:6])
                base_holder[0] = out[6]
                flag_acc = flag_acc | out[7]
            if profiling:
                np.asarray(base_holder[0])
            _bp("extract", t0)
            wi = wj
    return batches, flag_acc, total_windows


def build_index_device(
    contigs: Sequence[Tuple[str, bytes]],
    p: Params,
    batch_windows: int = 256,
    verbose=None,
):
    """Device-resident hash-index build. Returns (HashIndex, RefMeta), or
    None when a correctness flag fired (caller falls back to the host
    builder, which has per-batch retry machinery)."""
    import jax
    import jax.numpy as jnp

    cap = p.ref_window_minimizers
    encoded = []
    names: List[str] = []
    lengths: List[int] = []
    L = 64
    for name, seq in contigs:
        codes = (seq if isinstance(seq, np.ndarray) else
                 _native_enc.encode_any(seq))
        names.append(name)
        lengths.append(codes.shape[0])
        wins = plan_windows(codes, p)
        encoded.append((codes, wins))
        for cs, _, se in wins:
            need = 1 << int(np.ceil(np.log2(max(64, se - cs))))
            L = max(L, need)
    # share the compiled seeding program with the 32 kb FAST read bin (not
    # max_read_len — see index/build.py)
    L = max(L, min(p.max_read_len, 1 << 15))
    meta = RefMeta(names=names, lengths=np.asarray(lengths, dtype=np.int64))
    if L > (1 << 20):
        return None

    from ..io import native as _native

    use_native_pack = _native.available()
    _run_jit = _make_batch_extract(p, cap, L)

    def run(*args):
        """Extract program resolved through the AOT executable cache on first
        dispatch (args fix the shapes); memoized so steady-state rebuilds in
        one process skip the disk deserialize."""
        from ..utils.aot import cached_program_memo

        return cached_program_memo(
            f"ixb_extract_c{cap}_L{L}", _run_jit, args, (repr(p), cap, L)
        )(*args)

    import os as _os
    from time import perf_counter as _pc

    bprof = {} if _os.environ.get("MAPQUIK_BUILD_PROF") else None

    def _bp(key, t0):
        if bprof is not None:
            bprof[key] = bprof.get(key, 0.0) + (_pc() - t0)

    # Segment-resident extraction is the default (r5): each contig's packed
    # codes upload ONCE per <=64 MB segment and window batches gather on
    # device — the per-batch upload path re-sent every halo byte over a
    # tunnel whose post-execution h2d runs ~24-35 MB/s
    # (experiments/r5_transfer_modes.md). MAPQUIK_SEG_BUILD=0 restores the
    # round-3/4 per-batch upload path (the A/B foil).
    if _os.environ.get("MAPQUIK_SEG_BUILD", "1") != "0":
        batches, flag_acc, total_windows = _extract_segments(
            encoded, p, cap, L, batch_windows, use_native_pack, _bp,
            bprof is not None, verbose,
        )
    else:
        batches, flag_acc, total_windows = _extract_batches(
            encoded, p, cap, L, batch_windows, use_native_pack, run, _bp,
            bprof is not None, verbose,
        )

    if not batches:
        return None

    # pad the batch list to a power of two (dummy batches carry sentinel keys
    # and dedup away) so concat/dedup compiles for few distinct shapes.
    # Pad to a multiple of 64 batches, NOT a power of two: pow2 padding
    # nearly DOUBLED the concatenated columns at CHM13 scale (540 real
    # batches -> 1024 = +3 GB of dead rows, an HBM-exhaustion contributor),
    # while 64-steps keep the distinct compile shapes bounded.
    n_pad = (-len(batches)) % 64 if len(batches) > 16 else (
        (1 << int(np.ceil(np.log2(max(1, len(batches)))))) - len(batches)
    )
    if n_pad:
        dummy = tuple(
            jnp.full_like(c, _EMPTY) if c.dtype == jnp.uint32 else jnp.zeros_like(c)
            for c in batches[0]
        )
        batches.extend([dummy] * n_pad)

    if verbose:
        verbose(f"dispatched {len(batches)} batches; dedup")
    t0 = _pc()
    # dedup is S-independent: run it ONCE, then FREE the per-batch
    # accumulations before the S-sized placement/materialize (holding both
    # through materialize exhausted HBM at 3.1 GB genome scale)
    cols, keep = _make_dedup()(batches)
    batches.clear()
    _bp("finalize", t0)

    # table size from an a-priori UPPER bound on unique k-min-mers (<= one
    # per density-selected position: genome_len * density + margin), so the
    # whole finalize chain runs with no mid-build pulls; a placement failure
    # retries with a doubled table.
    # load factor 0.45: demand-balanced two-pass placement (see _placement)
    # measures zero failures through load 0.5; 0.45 leaves margin so a retry
    # (a placement recompile through the slow relay) stays vanishingly rare.
    g_total = int(sum(lengths))
    n_bound = int(1.1 * g_total * p.density) + (1 << 12)
    S = 1 << max(4, int(np.ceil(np.log2(n_bound / (BUCKET * 0.45)))))
    while True:
        if verbose:
            verbose(f"finalizing (S={S})")
        t0 = _pc()
        keys, pay, nf_d = _make_finalize(S)(cols, keep)
        nf = np.asarray(nf_d)  # ONE pull for (n_unique, fail)
        n_unique, fail = int(nf[0]), int(nf[1])
        _bp("finalize", t0)
        if fail == 0:
            break
        S *= 2
    ovf, drop = (bool(x) for x in np.asarray(flag_acc))
    if verbose:
        verbose(
            f"device build: {n_unique} unique k-min-mers ({total_windows} windows, "
            f"table {S}x{BUCKET})"
        )
    if ovf or drop:
        if verbose:
            verbose("overflow/halo flag on device path; falling back to host build")
        return None
    idx = HashIndex(keys=keys, pay=pay)
    jax.block_until_ready(idx.keys)
    if bprof is not None:
        import sys as _sys

        print(
            "[build-prof] "
            + "  ".join(f"{k} {v:.3f}s" for k, v in sorted(bprof.items())),
            file=_sys.stderr, flush=True,
        )
    return idx, meta
