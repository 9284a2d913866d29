"""Batched on-device seeding: codes -> k-min-mers, fixed shapes, XLA/TPU-friendly.

Replaces the reference's hot loop A (external crate rust-seq2kminmers — AVX-512 minimizer
scan + ntHash + HPC + k-min-mer assembly; SURVEY.md §2.2) with an array formulation:

  1. HPC run compaction via cumsum + one flat scatter (no data-dependent shapes).
  2. Rolling canonical 32-bit ntHash of every l-mer via the prefix-XOR identity:
     the window XOR of per-base rotated seeds equals a rotate of a prefix-XOR
     difference — one associative XOR scan over the batch, no sequential rolling.
  3. Density predicate (hash < density * 2^32) -> minimizer set; compacted to a fixed
     per-read cap via top_k on positions.
  4. k-window lexicographic canonicalization + FNV/murmur mixing -> strand-canonical
     (h1, h2) uint32-pair k-min-mer keys with base-space [start, end) spans.

Bit-exact vs the oracle (mapquik_tpu.oracle.pyref) by construction — shared constants,
shared formulas. Everything here is shape-static and jit/vmap/shard_map compatible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle.pyref import SEED32, SEED32C, INVALID
from ..params import Params

_FNV_OFFSET = np.uint32(0x811C9DC5)
_FNV_PRIME = np.uint32(0x01000193)
_MIX2_OFFSET = np.uint32(0x9747B28C)
_MIX2_PRIME = np.uint32(0x85EBCA6B)

_BIG_I32 = np.int32(0x7FFFFFFF)


def pack4_host(codes: np.ndarray) -> np.ndarray:
    """Host-side 4-bit packing (2 bases/byte) for host->device transfer (halves
    the upload). Lossless for codes 0..4 (INVALID rides along). L must be even.

    Implemented over a little-endian uint16 view of adjacent byte pairs: the
    strided `codes[:, 0::2] | codes[:, 1::2] << 4` formulation costs ~28 ms per
    8 MB batch in numpy; the contiguous u16 pass is ~4x faster (hot in the
    index-build feed loop)."""
    if not codes.flags.c_contiguous:
        codes = np.ascontiguousarray(codes)
    v = codes.view(np.uint16)
    return ((v & np.uint16(0x0F)) | ((v >> np.uint16(8)) << np.uint16(4))).astype(
        np.uint8
    )


def unpack4(packed: jax.Array, L: int) -> jax.Array:
    """Device-side inverse of pack4_host: [B, L//2] -> [B, L] uint8."""
    lo = packed & np.uint8(0xF)
    hi = packed >> np.uint8(4)
    return jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], L)


def pack2_host(codes: np.ndarray, lengths: Optional[np.ndarray] = None):
    """2-bit pack + non-ACGT bitmask: 2.25 bits/base total. The h2d tunnel
    bounds streaming throughput, so upload bytes matter; this is 3.5x smaller
    than raw codes. L must divide by 8.

    With `lengths` given, the mask marks ONLY in-read non-ACGT bases (padding
    is reconstructed on-device by unpack2 from the lengths) — all-zero for
    N-free batches, so callers can skip its upload entirely. Without lengths
    the mask also covers padding (legacy layout, still accepted by unpack2
    when paired with full lengths).

    Returns (p2 u8 [B, L//4], mask u8 [B, L//8] packbits-big-endian)."""
    if not codes.flags.c_contiguous:
        codes = np.ascontiguousarray(codes)
    v = codes.view(np.uint32)  # little-endian groups of 4 adjacent bases
    p2 = (
        (v & np.uint32(3))
        | ((v >> np.uint32(8)) & np.uint32(3)) << np.uint32(2)
        | ((v >> np.uint32(16)) & np.uint32(3)) << np.uint32(4)
        | ((v >> np.uint32(24)) & np.uint32(3)) << np.uint32(6)
    ).astype(np.uint8)
    bad = codes >= 4
    if lengths is not None:
        bad &= np.arange(codes.shape[1])[None, :] < np.asarray(lengths)[:, None]
    mask = np.packbits(bad, axis=1)
    return p2, mask


def unpack2(
    p2: jax.Array, mask: jax.Array, L: int, lengths: Optional[jax.Array] = None
) -> jax.Array:
    """Device-side inverse of pack2_host: -> [B, L] uint8 codes (0..4).

    `lengths` marks positions >= length INVALID (padding no longer rides in
    the mask — see pack2_host); the mask then only carries in-read N bases."""
    B = p2.shape[0]
    shifts = np.arange(4, dtype=np.uint8) * np.uint8(2)
    c = ((p2[:, :, None] >> shifts[None, None, :]) & np.uint8(3)).reshape(B, L)
    bshifts = np.arange(7, -1, -1, dtype=np.uint8)
    m = ((mask[:, :, None] >> bshifts[None, None, :]) & np.uint8(1)).reshape(B, L)
    bad = m != 0
    if lengths is not None:
        bad = bad | (
            jnp.arange(L, dtype=jnp.int32)[None, :] >= lengths[:, None]
        )
    return jnp.where(bad, np.uint8(INVALID), c)


class SeedBatch(NamedTuple):
    """Fixed-shape per-read k-min-mer arrays. Slot j holds the k-min-mer with offset j;
    slots >= n are padding (fields zeroed/cleared)."""

    h1: jax.Array     # uint32 [B, M]
    h2: jax.Array     # uint32 [B, M]
    start: jax.Array  # int32  [B, M] base-space start
    end: jax.Array    # int32  [B, M] base-space end (exclusive)
    rev: jax.Array    # bool   [B, M]
    n: jax.Array      # int32  [B] number of valid k-min-mers (clipped to cap)
    overflow: jax.Array  # bool [B] True if the minimizer cap clipped this sequence
                         # (the reference has no cap — callers must detect & retry)
    tail_start: jax.Array = None  # int32 [B] base-space start of the first minimizer
                                  # whose k-min-mer was NOT emitted (ordinal n), or
                                  # 2^31-1 if none. The index builder uses it to
                                  # detect halo-dropped window-spanning k-min-mers:
                                  # a window truncated by the halo (not contig end)
                                  # with tail_start < core_end dropped an owned seed.


def _rol32(x: jax.Array, r: jax.Array) -> jax.Array:
    x = x.astype(jnp.uint32)
    r = (r % 32).astype(jnp.uint32)
    return (x << r) | (x >> ((np.uint32(32) - r) % np.uint32(32)))


def _prefix_xor(a: jax.Array, block: int = 512) -> jax.Array:
    """Inclusive XOR scan along axis 1, two-level blocked Hillis-Steele.

    Deliberately NOT jax.lax.associative_scan: its recursive odd-even graph makes the
    TPU (Mosaic) compiler blow up when composed with sorts/gathers in one program
    (measured 236s -> 6.6s compile for the minimizer path on v5e by switching).

    Blocked because the pipeline is HBM-bandwidth-bound (23 GB accessed per
    256-read batch measured via cost_analysis): a flat scan over L=32768 costs 15
    full-array passes; intra-block scan (log2(block) passes) + a tiny block-level
    scan + one broadcast pass costs ~log2(block)+1."""
    B, L = a.shape
    if L <= block:
        s = 1
        while s < L:
            shifted = jnp.concatenate([jnp.zeros((B, s), a.dtype), a[:, :-s]], axis=1)
            a = a ^ shifted
            s *= 2
        return a
    nb = L // block
    x = a.reshape(B, nb, block)
    s = 1
    while s < block:
        shifted = jnp.concatenate(
            [jnp.zeros((B, nb, s), a.dtype), x[:, :, :-s]], axis=2
        )
        x = x ^ shifted
        s *= 2
    # exclusive block-prefix of per-block totals (tiny [B, nb] scan)
    tot = x[:, :, -1]
    s = 1
    bp = jnp.concatenate([jnp.zeros((B, 1), a.dtype), tot[:, :-1]], axis=1)
    while s < nb:
        shifted = jnp.concatenate([jnp.zeros((B, s), a.dtype), bp[:, :-s]], axis=1)
        bp = bp ^ shifted
        s *= 2
    return (x ^ bp[:, :, None]).reshape(B, L)


def _fmix32(h: jax.Array) -> jax.Array:
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def hpc_compact(codes: jax.Array, lengths: jax.Array):
    """Batched homopolymer compression.

    codes: uint8 [B, L] (padding may be anything; it is forced to INVALID).
    Returns (hcodes u8 [B, L], run_start i32 [B, L], run_end i32 [B, L], hpc_len i32 [B]).
    Positions >= hpc_len hold INVALID / sentinel values.

    Compaction is one 2-operand sort: the key is the run-start position (BIG for
    non-run-starts), so sorting moves run starts to the row prefix in order and the
    sorted key array IS run_start. (On TPU a row sort is several times cheaper than
    the equivalent scatter; measured on v5e.)
    """
    B, L = codes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    inb = pos < lengths[:, None]
    codes = jnp.where(inb, codes, np.uint8(INVALID))
    prev = jnp.concatenate([jnp.full((B, 1), 255, dtype=codes.dtype), codes[:, :-1]], axis=1)
    keep = (codes != prev) & inb
    hpc_len = jnp.sum(keep.astype(jnp.int32), axis=1)
    # single-operand sort: key packs (position, code) into one int32 — positions are
    # unique per row so the order equals position order (multi-operand sorts cost
    # proportionally more HBM traffic at this width)
    key = jnp.where(keep, (pos << 3) | codes.astype(jnp.int32), _BIG_I32)
    skey = rowsort(key)
    valid = skey != _BIG_I32
    hcodes = jnp.where(valid, skey & 7, np.int32(INVALID)).astype(jnp.uint8)
    run_start = jnp.where(valid, skey >> 3, lengths[:, None].astype(jnp.int32))
    run_end = jnp.concatenate(
        [run_start[:, 1:], lengths[:, None].astype(jnp.int32)], axis=1
    )
    return hcodes, run_start, run_end, hpc_len


def nthash32_batch(codes: jax.Array, l: int):
    """Canonical 32-bit ntHash of every l-mer, batched.

    codes: uint8 [B, L] (INVALID marks non-ACGT / padding).
    Returns (canon u32 [B, L], valid bool [B, L]); positions with i > L - l are invalid.
    Mirrors oracle nthash32 exactly (same prefix-XOR formulation).
    """
    B, L = codes.shape
    seed = jnp.asarray(SEED32)
    seedc = jnp.asarray(SEED32C)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    a = _rol32(seed[codes], (l - 1 - pos) % 32)
    b = _rol32(seedc[codes], pos % 32)
    pa = _prefix_xor(a)
    pb = _prefix_xor(b)
    # window xor over [i, i+l): prefix[i+l-1] ^ prefix[i-1]
    zeros = jnp.zeros((B, 1), dtype=jnp.uint32)
    pa = jnp.concatenate([zeros, pa], axis=1)  # pa[:, i] = xor of a[:, :i]
    pb = jnp.concatenate([zeros, pb], axis=1)
    # shift so wa[:, i] = pa[:, i+l] ^ pa[:, i]; out-of-range -> garbage, masked by valid
    pad = jnp.zeros((B, l), dtype=jnp.uint32)
    pa_hi = jnp.concatenate([pa[:, l:], pad], axis=1)[:, :L]
    pb_hi = jnp.concatenate([pb[:, l:], pad], axis=1)[:, :L]
    fwd = _rol32(pa_hi ^ pa[:, :L], pos % 32)
    rev = _rol32(pb_hi ^ pb[:, :L], (-pos) % 32)
    canon = jnp.minimum(fwd, rev)
    bad = (codes == INVALID).astype(jnp.int32)
    cbad = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(bad, axis=1)], axis=1
    )
    cbad_hi = jnp.concatenate([cbad[:, l:], jnp.zeros((B, l), jnp.int32)], axis=1)[:, :L]
    in_range = pos <= (L - l)
    valid = in_range & ((cbad_hi - cbad[:, :L]) == 0)
    return canon, valid


def take_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-row gather x[b, idx[b, j], ...] via ONE flat global gather.

    ~20% faster than take_along_axis on v5e (the per-row gather HLO is
    latency-bound; the flattened form amortizes better). x: [B, M, ...];
    idx: int32 [B, K] with values in [0, M)."""
    B, M = x.shape[0], x.shape[1]
    rowbase = jnp.arange(B, dtype=jnp.int32)[:, None] * np.int32(M)
    flat = x.reshape((B * M,) + x.shape[2:])
    out = flat[(rowbase + idx).reshape(-1)]
    return out.reshape((B, idx.shape[1]) + x.shape[2:])


_SORT_CHUNK = 256


def rowsort(operands, num_keys: int = 1, is_stable: bool = False):
    """lax.sort along axis 1, executed in <= _SORT_CHUNK-row chunks.

    Row sorts at [512+, M] are superlinear-worse on this backend (measured
    rounds 1-3: a flat [1024, M] group batch lost ~0.8 ms/batch to its sorts
    while its gathers got cheaper), so group-flattened [G*B, M] stages sort
    per 256-row chunk — identical results (rows sort independently), fast-path
    shapes. Single operand in -> single array out; list in -> list out."""
    single = not isinstance(operands, (list, tuple))
    ops = [operands] if single else list(operands)
    B = ops[0].shape[0]
    if B <= _SORT_CHUNK:
        out = jax.lax.sort(ops, dimension=1, num_keys=num_keys, is_stable=is_stable)
    else:
        chunks = [
            jax.lax.sort(
                [o[i : i + _SORT_CHUNK] for o in ops],
                dimension=1, num_keys=num_keys, is_stable=is_stable,
            )
            for i in range(0, B, _SORT_CHUNK)
        ]
        out = [jnp.concatenate(parts, axis=0) for parts in zip(*chunks)]
    return out[0] if single else out


def _compact_positions(sel: jax.Array, cap: int):
    """Positions of True entries of sel [B, L], compacted to [B, cap] (ascending);
    invalid slots hold 0. Returns (positions i32 [B, cap], count i32 [B]).

    One single-operand row sort (cheaper than scatter or top_k on TPU)."""
    B, L = sel.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    key = jnp.where(sel, pos, _BIG_I32)
    skey = rowsort(key)[:, : min(cap, L)]
    n = jnp.sum(sel.astype(jnp.int32), axis=1)
    out = jnp.where(skey != _BIG_I32, skey, 0)
    if cap > L:
        out = jnp.pad(out, ((0, 0), (0, cap - L)))
    return out, jnp.minimum(n, cap)


def _pack_ck(codes: jax.Array, lengths: jax.Array, p: Params) -> jax.Array:
    """Pack (code | run_start_flag << 3) bytes for the compaction kernel, with
    an INVALID right pad of pallas_seeding._H lanes. The INVALID padding run
    starts exactly at each row's length, so the kernel's end-coordinate and
    sequence-end handling need no separate length input."""
    from .pallas_seeding import _H

    B, L = codes.shape
    ext = jnp.concatenate(
        [codes, jnp.full((B, _H), np.uint8(INVALID), codes.dtype)], axis=1
    )
    pos = jnp.arange(L + _H, dtype=jnp.int32)[None, :]
    inb = pos < lengths[:, None]
    ext = jnp.where(inb, ext, np.uint8(INVALID))
    if p.use_hpc:
        prev = jnp.concatenate(
            [jnp.full((B, 1), 255, dtype=ext.dtype), ext[:, :-1]], axis=1
        )
        keep = ext != prev
    else:
        # every in-bounds position is its own run, plus the padding run at len
        keep = pos <= lengths[:, None]
    return ext | (keep.astype(jnp.uint8) << np.uint8(3))


def _minimizers_compact_pallas(codes, lengths, p: Params, cap: int):
    """Kernel-compacted minimizer path: HPC + ntHash + density selection in one
    block-parallel Pallas pass; no [B, L] sort, no [B, L] u32 plane anywhere."""
    from . import pallas_seeding
    from .pallas_seeding import _MARKER, seed_select_compact

    B, L = codes.shape
    ck = _pack_ck(codes, lengths, p)
    canon, pse = seed_select_compact(
        ck, p.l, p.hash_threshold, L,
        interpret=pallas_seeding._INTERPRET,
    )
    # pse is both the packed coords and the position sort key (pos<<16 is the
    # high half; empty/marker fills sort last). (A sort-free cross-block
    # log-shift merge was A/B'd on v5e and REJECTED: -0.07 ms = noise;
    # experiments/toggles_ab_v5e.txt, DESIGN.md rejected list.)
    ps, ch = rowsort([pse, canon])
    nbK = ps.shape[1]
    take = min(cap, nbK)
    psc, chc = ps[:, :take], ch[:, :take]
    if cap > nbK:
        pad = ((0, 0), (0, cap - nbK))
        psc = jnp.pad(psc, pad, constant_values=_BIG_I32)
        chc = jnp.pad(chc, pad)
    validk = psc < _MARKER
    mhash = chc
    mstart = jnp.where(validk, psc >> 16, 0)
    mend = jnp.where(validk, psc & np.int32(0xFFFF), 0)
    n_sel = jnp.sum((pse < _MARKER).astype(jnp.int32), axis=1)
    block_ovf = jnp.any(pse == _MARKER, axis=1)
    mn = jnp.minimum(n_sel, cap)
    # a block-compaction overflow (> block_cap(threshold) selected in one
    # _CBLK-lane block — only satellite-like repeats do this) forces retry, which
    # falls back to the uncompacted path (use_pallas=False) for exactness
    mn_true = jnp.where(block_ovf, np.int32(cap + 1), n_sel)
    return mhash, mstart, mend, mn, mn_true


def minimizers_batch(
    codes: jax.Array, lengths: jax.Array, p: Params, cap: int, use_pallas: bool = True
):
    """Density-selected minimizers, compacted to [B, cap].

    Returns (mhash u32, mstart i32, mend i32, mn i32[B]).
    """
    B, L = codes.shape
    from .pallas_seeding import compact_available, nthash_sel_pallas, pallas_available

    if use_pallas and compact_available(B, L, p.l):
        return _minimizers_compact_pallas(codes, lengths, p, cap)
    if p.use_hpc:
        hcodes, run_start, _, _ = hpc_compact(codes, lengths)
    else:
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        inb = pos < lengths[:, None]
        hcodes = jnp.where(inb, codes, np.uint8(INVALID))
        run_start = jnp.broadcast_to(pos, (B, L))

    if use_pallas and pallas_available(B, L, p.l):
        # fused Pallas path (TPU): canon + density-selected sort key in one pass
        canon, selkey = nthash_sel_pallas(hcodes, p.l, p.hash_threshold)
        skey = rowsort(selkey)[:, : min(cap, L)]
        mpos = jnp.where(skey != _BIG_I32, skey, 0)
        if cap > L:
            mpos = jnp.pad(mpos, ((0, 0), (0, cap - L)))
        n_sel = jnp.sum((selkey != _BIG_I32).astype(jnp.int32), axis=1)
        mn = jnp.minimum(n_sel, cap)
        sel_count_true = n_sel
    else:
        canon, valid = nthash32_batch(hcodes, p.l)
        sel = valid & (canon < np.uint32(p.hash_threshold))
        mpos, mn = _compact_positions(sel, cap)
        sel_count_true = jnp.sum(sel.astype(jnp.int32), axis=1)
    # end of the minimizer whose first HPC char is at q = run_end[q + l - 1]
    # = run_start[q + l] (next run's start), tail-filled with the sequence length.
    # The pipeline is bandwidth-bound: base-space start/end both fit 16 bits
    # (L <= 32768 guaranteed by Params), so pack them into ONE int32 plane and
    # gather (canon, packed) with two skinny gathers instead of materializing a
    # [B, L, 3] stack (~400 MB/batch — measured slower than the extra gather).
    fill = jnp.broadcast_to(lengths[:, None].astype(jnp.int32), (B, p.l))
    run_start_l = jnp.concatenate([run_start[:, p.l :], fill], axis=1)
    mhash = take_rows(canon, mpos)
    if L <= (1 << 15):  # both coords fit 16 bits (end may be exactly 32768)
        packed_se = (run_start << 16) | run_start_l
        g_se = take_rows(packed_se, mpos)
        mstart = g_se >> 16
        mend = g_se & np.int32(0xFFFF)
    else:  # long-sequence fallback: two separate coordinate gathers
        mstart = take_rows(run_start, mpos)
        mend = take_rows(run_start_l, mpos)
    mn_true = sel_count_true
    return mhash, mstart, mend, mn, mn_true


def _shift_left(x: jax.Array, i: int, fill):
    """x[:, j] -> x[:, j + i], padding the tail with `fill`."""
    if i == 0:
        return x
    B = x.shape[0]
    pad = jnp.full((B, i), fill, dtype=x.dtype)
    return jnp.concatenate([x[:, i:], pad], axis=1)


@functools.partial(jax.jit, static_argnames=("p", "cap", "L", "use_pallas"))
def seed_batch_packed_flat(
    packed: jax.Array, lengths: jax.Array, p: Params, cap: int, L: int,
    use_pallas: bool = True,
) -> jax.Array:
    """Transfer-optimized extraction: 4-bit-packed codes in, ONE flat int32
    [B, 5*cap + 3] array out ([h1, h2, start, end, rev] columns then n, overflow,
    tail_start). Device->host pulls cost ~300-400ms latency each through this
    environment's tunnel, so the index builder pulls exactly one array per window
    batch."""
    sb = seed_batch(unpack4(packed, L), lengths, p, cap, use_pallas)
    flat = jnp.concatenate(
        [
            sb.h1.astype(jnp.int32), sb.h2.astype(jnp.int32),
            sb.start, sb.end, sb.rev.astype(jnp.int32),
            sb.n[:, None], sb.overflow.astype(jnp.int32)[:, None],
            sb.tail_start[:, None],
        ],
        axis=1,
    )
    return flat


@functools.lru_cache(maxsize=None)
def _seed_flat_program_fn(p: Params, cap: int, L: int, use_pallas: bool = True):
    """Statics-closed jit of seed_batch_packed_flat for the AOT executable
    cache (utils/aot.py): the index builder's extraction program is one of the
    two programs every cold CLI run waits 10-300 s on."""

    @jax.jit
    def fn(packed, lengths):
        return seed_batch_packed_flat(packed, lengths, p, cap, L, use_pallas)

    return fn


def unflatten_seed_batch(flat: np.ndarray, cap: int):
    """Host-side inverse of seed_batch_packed_flat's layout."""
    h1 = flat[:, 0 * cap : 1 * cap].astype(np.uint32)
    h2 = flat[:, 1 * cap : 2 * cap].astype(np.uint32)
    start = flat[:, 2 * cap : 3 * cap]
    end = flat[:, 3 * cap : 4 * cap]
    rev = flat[:, 4 * cap : 5 * cap].astype(bool)
    n = flat[:, 5 * cap]
    overflow = flat[:, 5 * cap + 1].astype(bool)
    tail_start = flat[:, 5 * cap + 2]
    return h1, h2, start, end, rev, n, overflow, tail_start


@functools.partial(jax.jit, static_argnames=("p", "cap", "use_pallas"))
def seed_batch(
    codes: jax.Array, lengths: jax.Array, p: Params, cap: int,
    use_pallas: bool = True,
) -> SeedBatch:
    """codes u8 [B, L], lengths i32 [B] -> SeedBatch with M = cap slots.

    Slot j is the k-min-mer with offset j (reference: ordinal in the sequence's
    k-min-mer list). Matches oracle `kminmers` exactly for reads whose minimizer
    count fits the cap. use_pallas=False forces the pure-XLA path (used by
    overflow retries: the kernel block compaction caps per-block seeds).
    """
    k = p.k
    mhash, mstart, mend, mn, mn_true = minimizers_batch(
        codes, lengths, p, cap, use_pallas
    )
    # window views W_i[:, j] = mhash[:, j + i]
    W = [_shift_left(mhash, i, 0) for i in range(k)]
    # lexicographic fwd-vs-reversed comparison
    rev = jnp.zeros(mhash.shape, dtype=bool)
    decided = jnp.zeros(mhash.shape, dtype=bool)
    for i in range(k):
        wr = W[k - 1 - i]
        neq = W[i] != wr
        use = neq & ~decided
        rev = jnp.where(use, W[i] > wr, rev)
        decided = decided | neq
    # FNV-1a / murmur-flavored mixing over the canonical orientation
    h1 = jnp.full(mhash.shape, _FNV_OFFSET, dtype=jnp.uint32)
    h2 = jnp.full(mhash.shape, _MIX2_OFFSET, dtype=jnp.uint32)
    for i in range(k):
        v = jnp.where(rev, W[k - 1 - i], W[i])
        h1 = (h1 ^ v) * _FNV_PRIME
        h2 = (h2 ^ v) * _MIX2_PRIME
        h2 = (h2 << 13) | (h2 >> 19)
    h1 = _fmix32(h1)
    h2 = _fmix32(h2)
    kend = _shift_left(mend, k - 1, 0)
    n = jnp.maximum(mn - (k - 1), 0)
    n = jnp.where(lengths >= p.min_seq_len, n, 0)
    slot = jnp.arange(cap, dtype=jnp.int32)[None, :]
    ok = slot < n[:, None]
    zero32 = jnp.zeros_like(h1)
    # start of the first UNemitted k-min-mer (minimizer ordinal n): masked min over
    # the last min(k-1, mn) minimizer slots (starts are ascending, so the min over
    # ordinals [max(mn-k+1,0), mn) is the ordinal-(mn-k+1) start) — elementwise +
    # reduce, no gather (gathers cost ~1.4 ms each on this device)
    tail_lo = jnp.maximum(mn - (k - 1), 0)[:, None]
    tail_mask = (slot >= tail_lo) & (slot < mn[:, None])
    tail_start = jnp.min(jnp.where(tail_mask, mstart, _BIG_I32), axis=1)
    return SeedBatch(
        h1=jnp.where(ok, h1, zero32),
        h2=jnp.where(ok, h2, zero32),
        start=jnp.where(ok, mstart, 0),
        end=jnp.where(ok, kend, 0),
        rev=ok & rev,
        n=n,
        overflow=mn_true > cap,
        tail_start=tail_start,
    )
