"""Pseudo-chaining + best-reference selection + coordinate projection, batched.

Replicates src/chain.rs + src/mers.rs:77-183 with run-segmented array ops:

  1. Sort each read's Matches by (ref id, query order) -> per-ref buckets become
     contiguous runs preserving insertion order (the reference iterates each bucket's
     Vec in insertion order).
  2. Per bucket: anchor = first Match with the largest count (chain.rs:93-104);
     keep Matches pairwise-compatible with the anchor (chain.rs:43-75, 123-129);
     score/len/coords/MAPQ per chain.rs:147-169.
  3. Per read: emit the unique top-score bucket; a tie of the two largest scores
     leaves the read unmapped (mers.rs:104-129).
  4. Project to full read length clamped at contig bounds (find_coords,
     mers.rs:131-183).

Segment reductions use flat scatter-min/max/add over (read, bucket-slot) — O(B*M),
no data-dependent shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from .matching import MatchBatch
from .seeding import _compact_positions, rowsort, take_rows

_BIG_I32 = np.int32(0x7FFFFFFF)


class MapResult(NamedTuple):
    """Per-read mapping record; host formats the PAF line from this + names."""

    mapped: jax.Array   # bool [B]
    rc: jax.Array       # bool [B]
    q_start: jax.Array  # int32 [B] final (projected) query start
    q_end: jax.Array    # int32 [B] final query end (inclusive-style, as reference)
    rid: jax.Array      # int32 [B]
    r_start: jax.Array  # int32 [B]
    r_end: jax.Array    # int32 [B]
    score: jax.Array    # int32 [B]
    mapq: jax.Array     # int32 [B]
    overflow: jax.Array = None  # bool [B]: seed cap clipped this read (exactness
                                # not guaranteed; host should warn/requeue)


def _seg_prefix(vals: jax.Array, head: jax.Array, op, identity) -> jax.Array:
    """Segmented inclusive prefix reduction along axis 1 over contiguous segments
    whose starts are marked by `head`. Log-depth shift-scan of (value, boundary)
    pairs: (vA,fA)+(vB,fB) = (fB ? vB : op(vA,vB), fA|fB). Scatters cost ~6ms each
    on v5e while elementwise shifts are ~free (measured), so all segment reductions
    here are scan+gather based."""
    B, M = vals.shape
    v, f = vals, head
    s = 1
    while s < M:
        pv = jnp.concatenate([jnp.full((B, s), identity, v.dtype), v[:, :-s]], axis=1)
        pf = jnp.concatenate([jnp.zeros((B, s), bool), f[:, :-s]], axis=1)
        v = jnp.where(f, v, op(pv, v))
        f = f | pf
        s *= 2
    return v


def _seg_end(valid: jax.Array, head: jax.Array) -> jax.Array:
    """Per-element index of the LAST element of its segment (suffix analog)."""
    B, M = valid.shape
    idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    # element i is a segment end if next is a head / invalid / last slot
    nhead = jnp.concatenate([head[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    nvalid = jnp.concatenate([valid[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    is_end = valid & (nhead | ~nvalid)
    # nearest end at-or-right-of each element ("first true to the right"): the own
    # segment's end always precedes any later segment's, so nearest is correct.
    v = jnp.where(is_end, idx, np.int32(-1))
    f = is_end
    s = 1
    while s < M:
        nv = jnp.concatenate([v[:, s:], jnp.full((B, s), -1, jnp.int32)], axis=1)
        nf = jnp.concatenate([f[:, s:], jnp.zeros((B, s), bool)], axis=1)
        v = jnp.where(f, v, nv)
        f = f | nf
        s *= 2
    return v


def _seg_total(vals: jax.Array, head: jax.Array, op, identity) -> jax.Array:
    """Whole-segment reduction broadcast to EVERY element, no gather:
    inclusive prefix scan + inclusive suffix scan (op must be idempotent —
    min/max; use _seg_total_add for sums). The suffix pass runs the prefix
    machinery over reversed planes (lax.rev is an elementwise-cost op here,
    unlike gathers at ~1.4 ms each)."""
    B, M = vals.shape
    pre = _seg_prefix(vals, head, op, identity)
    tail = jnp.concatenate([head[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    suf = jnp.flip(
        _seg_prefix(jnp.flip(vals, 1), jnp.flip(tail, 1), op, identity), 1
    )
    return op(pre, suf)


def _seg_total_add(vals: jax.Array, head: jax.Array) -> jax.Array:
    """Segment SUM broadcast to every element (self counted once)."""
    B, M = vals.shape
    pre = _seg_prefix(vals, head, lambda a, b: a + b, np.int32(0))
    tail = jnp.concatenate([head[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    suf = jnp.flip(
        _seg_prefix(
            jnp.flip(vals, 1), jnp.flip(tail, 1), lambda a, b: a + b,
            np.int32(0),
        ),
        1,
    )
    return pre + suf - vals


def _seg_total_bykey(key: jax.Array, vals, head: jax.Array, take_max: bool):
    """For each element: (extreme key over its segment, the carried values at
    that extreme element). Keys must be unique within a segment (callers
    encode tiebreaks into the key). One log-depth pass per direction carrying
    all value planes — replaces a per-row gather at the winning position."""
    B, M = key.shape
    ident = np.int32(-0x7FFFFFFF - 1) if take_max else _BIG_I32

    def sweep(k, vs, f):
        s = 1
        while s < M:
            pk = jnp.concatenate(
                [jnp.full((B, s), ident, k.dtype), k[:, :-s]], axis=1
            )
            pvs = [
                jnp.concatenate([jnp.zeros((B, s), v.dtype), v[:, :-s]], axis=1)
                for v in vs
            ]
            pf = jnp.concatenate([jnp.zeros((B, s), bool), f[:, :-s]], axis=1)
            better = (pk > k) if take_max else (pk < k)
            nk = jnp.where(better, pk, k)
            nvs = [jnp.where(better, pv, v) for pv, v in zip(pvs, vs)]
            k = jnp.where(f, k, nk)
            vs = [jnp.where(f, v, nv) for v, nv in zip(vs, nvs)]
            f = f | pf
            s *= 2
        return k, vs

    kf, vf = sweep(key, list(vals), head)
    tail = jnp.concatenate([head[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    kbr, vbr = sweep(
        jnp.flip(key, 1), [jnp.flip(v, 1) for v in vals], jnp.flip(tail, 1)
    )
    kb = jnp.flip(kbr, 1)
    vb = [jnp.flip(v, 1) for v in vbr]
    use_b = (kb > kf) if take_max else (kb < kf)
    ktot = jnp.where(use_b, kb, kf)
    vtot = [jnp.where(use_b, b, a) for a, b in zip(vf, vb)]
    return ktot, vtot


def chain_and_select_v2(mb: MatchBatch, p: Params) -> tuple:
    """Gather-free chain_and_select: identical output, zero take_rows.

    Every per-bucket summary (anchor fields, chain score/length, endpoint
    fields) is broadcast to its elements by forward+backward segmented
    shift-scans instead of being gathered at representative positions —
    gathers cost ~0.5-1.4 ms each in-situ on this device while shift-scans
    are elementwise (DESIGN.md cost model). Also drops the bucket-slot
    compaction sort (_compact_positions) the gather formulation needed.
    Semantics per src/chain.rs + src/mers.rs:104-129 as v1."""
    B, M = mb.count.shape
    idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))

    ops = [mb.bucket, idx, mb.count, mb.q_start, mb.q_end, mb.r_start,
           mb.r_end, mb.rc.astype(jnp.int32)]
    s = rowsort(ops, is_stable=True)
    bucket, _, count, q_s, q_e, r_s, r_e, rc_i = s
    rc = rc_i.astype(bool)
    valid = bucket != _BIG_I32

    prev_bucket = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), bucket[:, :-1]], axis=1
    )
    bhead = valid & (bucket != prev_bucket)
    nb = jnp.sum(bhead.astype(jnp.int32), axis=1)

    # anchor per bucket: unique composite key (count-major, early-idx
    # tiebreak), fields carried by the by-key scan — no gather
    key = jnp.where(valid, count * np.int32(M + 1) + (np.int32(M) - idx), -1)
    _, avals = _seg_total_bykey(
        key, [count, q_s, q_e, r_s, r_e, rc_i], bhead, take_max=True
    )
    a_count, a_qs, a_qe, a_rs, a_re, a_rc_i = avals
    a_rc = a_rc_i.astype(bool)

    # compatibility with the anchor (chain.rs:43-63) — identical to v1
    eq = (
        (a_qs == q_s) & (a_qe == q_e) & (a_rs == r_s) & (a_re == r_e)
        & (a_count == count) & (a_rc == rc)
    )
    same_strand = a_rc == rc
    a_first = a_qs < q_s
    u_qe = jnp.where(a_first, a_qe, q_e)
    u_rs = jnp.where(a_first, a_rs, r_s)
    u_re = jnp.where(a_first, a_re, r_e)
    u_rc = jnp.where(a_first, a_rc, rc)
    v_qs = jnp.where(a_first, q_s, a_qs)
    v_rs = jnp.where(a_first, r_s, a_rs)
    v_re = jnp.where(a_first, r_e, a_re)
    g1 = v_qs - u_qe
    g2_fwd = v_rs - u_re
    g2_rc = u_rs - v_re
    ok_fwd = (v_rs > u_rs) & (jnp.abs(g1 - g2_fwd) <= np.int32(p.g))
    ok_rc = (u_rs > v_rs) & (jnp.abs(g1 - g2_rc) <= np.int32(p.g))
    compat = eq | (same_strand & jnp.where(u_rc, ok_rc, ok_fwd))
    surv = valid & compat

    # per-bucket chain stats, broadcast to every element
    score_t = _seg_total_add(jnp.where(surv, count, 0), bhead)
    len_t = _seg_total_add(surv.astype(jnp.int32), bhead)
    # endpoint fields: survivors' first (min idx) and last (max idx) carried
    # by two by-key scans
    fkey = jnp.where(surv, idx, _BIG_I32)
    _, fvals = _seg_total_bykey(
        fkey, [rc_i, q_s, r_s, r_e], bhead, take_max=False
    )
    lkey = jnp.where(surv, idx, -1)
    _, lvals = _seg_total_bykey(lkey, [q_e, r_s, r_e], bhead, take_max=True)
    c_rc = fvals[0].astype(bool)
    use_rc_coords = c_rc & (len_t > 1)  # chain.rs:165-168
    c_qs = fvals[1]
    c_qe = lvals[0] - 1
    c_rs = jnp.where(use_rc_coords, lvals[1], fvals[2])
    c_re = jnp.where(use_rc_coords, fvals[3], lvals[2]) - 1
    c_rid = bucket
    mapq_on = (p.s != 0) and (p.c != 0)
    c_mapq = jnp.where(
        mapq_on & ((len_t >= np.int32(p.c)) | (score_t >= np.int32(p.s))),
        np.int32(60),
        np.int32(0),
    )

    # best bucket per read over HEAD elements; top-2 tie -> unmapped
    # (mers.rs:104-129). argmax picks the first max = earliest bucket, as v1.
    hs = jnp.where(bhead, score_t, -1)
    best = jnp.argmax(hs, axis=1).astype(jnp.int32)
    max1 = jnp.max(hs, axis=1)
    max2 = jnp.max(jnp.where(idx == best[:, None], -1, hs), axis=1)
    mapped = (nb >= 1) & (max1 != max2)

    selm = idx == best[:, None]
    pick = lambda a: jnp.sum(jnp.where(selm, a, 0), axis=1)
    return (
        mapped, pick(fvals[0]).astype(bool), pick(c_qs), pick(c_qe),
        pick(c_rs), pick(c_re), pick(score_t), pick(c_mapq), pick(c_rid),
    )


def chain_and_select(mb: MatchBatch, p: Params) -> tuple:
    """Returns per-read best-chain record fields (before coordinate projection):
    (mapped, rc, q_start, q_end(excl-1 applied), r_start, r_end, score, mapq, rid)."""
    if getattr(p, "chain_scan", False):
        return chain_and_select_v2(mb, p)
    B, M = mb.count.shape
    idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    valid_in = idx < mb.n[:, None]

    # --- 1. bucket grouping: sort by (bucket, query order) --- the query-order
    # tiebreak comes free from ONE stable single-key pass (inputs are already
    # in query order); a num_keys=2 variadic sort leaves XLA's fast sort path
    # for a comparator network (measured on the 1D dedup sorts)
    ops = [mb.bucket, idx, mb.count, mb.q_start, mb.q_end, mb.r_start, mb.r_end,
           mb.rc.astype(jnp.int32)]
    s = rowsort(ops, is_stable=True)
    bucket, _, count, q_s, q_e, r_s, r_e, rc_i = s
    rc = rc_i.astype(bool)
    valid = bucket != _BIG_I32

    prev_bucket = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), bucket[:, :-1]], axis=1)
    bhead = valid & (bucket != prev_bucket)
    nb = jnp.sum(bhead.astype(jnp.int32), axis=1)
    # per-element index of its bucket's last element: whole-segment reductions are
    # (segmented prefix scan) gathered at the segment end — no scatters anywhere
    # (a single [B, M] scatter costs ~6ms on v5e; these scans are ~30us)
    send_e = jnp.clip(_seg_end(valid, bhead), 0, M - 1)
    gend = lambda a: take_rows(a, send_e)

    # --- 2. anchor per bucket: max count, earliest position on ties ---
    # key encodes (count, M - idx); the unique segment max IS the anchor and its
    # position decodes from the key value
    key = count * np.int32(M + 1) + (np.int32(M) - idx)  # count-major, early-idx tiebreak
    kmax_g = gend(_seg_prefix(jnp.where(valid, key, -1), bhead, jnp.maximum, np.int32(-1)))
    apos_g = np.int32(M) - (kmax_g % np.int32(M + 1))
    # anchor fields: one stacked gather (separate gathers cost ~1.4ms each on v5e)
    elem_fields = jnp.stack([count, q_s, q_e, r_s, r_e, rc.astype(jnp.int32)], axis=-1)
    anc = take_rows(elem_fields, jnp.maximum(apos_g, 0))
    a_count, a_qs, a_qe, a_rs, a_re = (anc[:, :, i] for i in range(5))
    a_rc = anc[:, :, 5].astype(bool)

    # --- compatibility with the anchor (chain.rs:43-63) ---
    eq = (
        (a_qs == q_s) & (a_qe == q_e) & (a_rs == r_s) & (a_re == r_e)
        & (a_count == count) & (a_rc == rc)
    )
    same_strand = a_rc == rc
    a_first = a_qs < q_s  # (u, v) ordering: u = anchor iff anchor.q_start < m.q_start
    u_qe = jnp.where(a_first, a_qe, q_e)
    u_rs = jnp.where(a_first, a_rs, r_s)
    u_re = jnp.where(a_first, a_re, r_e)
    u_rc = jnp.where(a_first, a_rc, rc)
    v_qs = jnp.where(a_first, q_s, a_qs)
    v_rs = jnp.where(a_first, r_s, a_rs)
    v_re = jnp.where(a_first, r_e, a_re)
    g1 = v_qs - u_qe
    g2_fwd = v_rs - u_re
    g2_rc = u_rs - v_re
    ok_fwd = (v_rs > u_rs) & (jnp.abs(g1 - g2_fwd) <= np.int32(p.g))
    ok_rc = (u_rs > v_rs) & (jnp.abs(g1 - g2_rc) <= np.int32(p.g))
    compat = eq | (same_strand & jnp.where(u_rc, ok_rc, ok_fwd))
    surv = valid & compat

    # --- 3. per-bucket chain stats over survivors (scans + stacked gathers) ---
    add = lambda a, b: a + b
    stats = jnp.stack(
        [
            _seg_prefix(jnp.where(surv, count, 0), bhead, add, np.int32(0)),
            _seg_prefix(surv.astype(jnp.int32), bhead, add, np.int32(0)),
            _seg_prefix(jnp.where(surv, idx, _BIG_I32), bhead, jnp.minimum, _BIG_I32),
            _seg_prefix(jnp.where(surv, idx, -1), bhead, jnp.maximum, np.int32(-1)),
        ],
        axis=-1,
    )
    # segment totals live at the segment end; slot b's end = (slot b+1's start) - 1,
    # or the last valid element for the final bucket — derived from spos by a shift,
    # no gather needed
    spos, _ = _compact_positions(bhead, M)
    nvalid = jnp.sum(valid.astype(jnp.int32), axis=1)
    next_start = jnp.concatenate([spos[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    slot = jnp.arange(M, dtype=jnp.int32)[None, :]
    end_of_slot = jnp.where(
        slot + 1 < nb[:, None], next_start - 1, jnp.maximum(nvalid[:, None] - 1, 0)
    )
    end_of_slot = jnp.clip(end_of_slot, 0, M - 1)
    st = take_rows(stats, end_of_slot)
    score, lenf, fpos, lpos = (st[:, :, i] for i in range(4))
    # chain endpoint fields: BOTH endpoints in one gather (concat fpos|lpos indices;
    # gather cost is latency-dominated, so one 2x-wide gather beats two)
    e_fields = jnp.stack(
        [rc.astype(jnp.int32), q_s, q_e, r_s, r_e, bucket], axis=-1
    )
    both = jnp.concatenate(
        [jnp.clip(fpos, 0, M - 1), jnp.clip(lpos, 0, M - 1)], axis=1
    )
    fl = take_rows(e_fields, both)
    ff, lf = fl[:, :M], fl[:, M:]
    c_rc = ff[:, :, 0].astype(bool)
    use_rc_coords = c_rc & (lenf > 1)  # chain.rs:165-168
    c_qs = ff[:, :, 1]
    c_qe = lf[:, :, 2] - 1
    c_rs = jnp.where(use_rc_coords, lf[:, :, 3], ff[:, :, 3])
    c_re = jnp.where(use_rc_coords, ff[:, :, 4], lf[:, :, 4]) - 1
    c_rid = ff[:, :, 5]
    mapq_on = (p.s != 0) and (p.c != 0)
    c_mapq = jnp.where(
        mapq_on & ((lenf >= np.int32(p.c)) | (score >= np.int32(p.s))),
        np.int32(60),
        np.int32(0),
    )
    bslot_valid = idx < nb[:, None]
    c_score = jnp.where(bslot_valid, score, -1)

    # --- 4. best bucket per read; top-2 tie -> unmapped (mers.rs:104-129) ---
    best = jnp.argmax(c_score, axis=1)  # first max
    max1 = jnp.take_along_axis(c_score, best[:, None], axis=1)[:, 0]
    masked = jnp.where(idx == best[:, None], -1, c_score)
    max2 = jnp.max(masked, axis=1)
    mapped = (nb >= 1) & (max1 != max2)

    out_fields = jnp.stack(
        [c_rc.astype(jnp.int32), c_qs, c_qe, c_rs, c_re, score, c_mapq, c_rid], axis=-1
    )
    ob = take_rows(out_fields, best[:, None])[:, 0]
    return (mapped, ob[:, 0].astype(bool), ob[:, 1], ob[:, 2], ob[:, 3], ob[:, 4],
            ob[:, 5], ob[:, 6], ob[:, 7])


def project_coords(sel: tuple, q_len: jax.Array, ref_lens: jax.Array) -> MapResult:
    """find_coords (src/mers.rs:131-183): extend chain span to full read length,
    clamped at contig boundaries; int32 throughout."""
    mapped, rc, q_s, q_e, r_s, r_e, score, mapq, rid = sel
    r_len = ref_lens[jnp.clip(rid, 0, ref_lens.shape[0] - 1)].astype(jnp.int32)
    q_len = q_len.astype(jnp.int32)
    tail = q_len - q_e - 1

    # forward branch
    f_rs_f = jnp.where(r_s >= q_s, r_s - q_s, 0)
    exc_s_f = jnp.where(r_s >= q_s, q_s, r_s)
    fits_e = r_e + tail <= r_len - 1
    f_re_f = jnp.where(fits_e, r_e + tail, r_len - 1)
    exc_e_f = jnp.where(fits_e, tail, r_len - r_e - 1)
    # rc branch
    fits_s = r_e + q_s <= r_len - 1
    f_re_r = jnp.where(fits_s, r_e + q_s, r_len - 1)
    exc_s_r = jnp.where(fits_s, q_s, r_len - r_e - 1)
    f_rs_r = jnp.where(r_s >= tail, r_s - tail, 0)
    exc_e_r = jnp.where(r_s >= tail, tail, r_s)

    f_rs = jnp.where(rc, f_rs_r, f_rs_f)
    f_re = jnp.where(rc, f_re_r, f_re_f)
    exc_s = jnp.where(rc, exc_s_r, exc_s_f)
    exc_e = jnp.where(rc, exc_e_r, exc_e_f)
    return MapResult(
        mapped=mapped,
        rc=rc,
        q_start=q_s - exc_s,
        q_end=q_e + exc_e,
        rid=rid,
        r_start=f_rs,
        r_end=f_re,
        score=score,
        mapq=mapq,
    )
