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


def _seg_scatter(op: str, vals, seg, valid, init):
    """Per-(read, segment) reduction: returns [B, M] array indexed by segment id."""
    B, M = vals.shape
    row = jnp.arange(B, dtype=jnp.int32)[:, None] * M
    flat = jnp.where(valid, row + seg, np.int32(B * M))
    out = jnp.full((B * M,), init, dtype=vals.dtype)
    updater = getattr(out.at[flat.reshape(-1)], op)
    return updater(vals.reshape(-1), mode="drop").reshape(B, M)


def chain_and_select(mb: MatchBatch, p: Params) -> tuple:
    """Returns per-read best-chain record fields (before coordinate projection):
    (mapped, rc, q_start, q_end(excl-1 applied), r_start, r_end, score, mapq, rid)."""
    B, M = mb.count.shape
    idx = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    valid_in = idx < mb.n[:, None]

    # --- 1. bucket grouping: stable sort by (bucket, query order) ---
    ops = [mb.bucket, idx, mb.count, mb.q_start, mb.q_end, mb.r_start, mb.r_end,
           mb.rc.astype(jnp.int32)]
    s = jax.lax.sort(ops, num_keys=2, dimension=1)
    bucket, _, count, q_s, q_e, r_s, r_e, rc_i = s
    rc = rc_i.astype(bool)
    valid = bucket != _BIG_I32

    prev_bucket = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), bucket[:, :-1]], axis=1)
    bhead = valid & (bucket != prev_bucket)
    seg = jnp.cumsum(bhead.astype(jnp.int32), axis=1) - 1
    nb = jnp.sum(bhead.astype(jnp.int32), axis=1)

    # --- 2. anchor per bucket: max count, earliest position on ties ---
    key = count * np.int32(M + 1) + (np.int32(M) - idx)  # count-major, early-idx tiebreak
    kmax = _seg_scatter("max", key, seg, valid, np.int32(-1))
    kmax_g = jnp.take_along_axis(kmax, jnp.maximum(seg, 0), axis=1)
    apos = _seg_scatter(
        "max", jnp.where(valid & (key == kmax_g), idx, -1), seg, valid, np.int32(-1)
    )
    apos_g = jnp.take_along_axis(apos, jnp.maximum(seg, 0), axis=1)
    ga = lambda a: jnp.take_along_axis(a, jnp.maximum(apos_g, 0), axis=1)
    a_count, a_qs, a_qe, a_rs, a_re = ga(count), ga(q_s), ga(q_e), ga(r_s), ga(r_e)
    a_rc = jnp.take_along_axis(rc, jnp.maximum(apos_g, 0), axis=1)

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

    # --- 3. per-bucket chain stats over survivors ---
    score = _seg_scatter("add", jnp.where(surv, count, 0), seg, valid, np.int32(0))
    lenf = _seg_scatter("add", surv.astype(jnp.int32), seg, valid, np.int32(0))
    fpos = _seg_scatter("min", jnp.where(surv, idx, _BIG_I32), seg, valid, _BIG_I32)
    lpos = _seg_scatter("max", jnp.where(surv, idx, -1), seg, valid, np.int32(-1))
    # bucket-slot arrays (slot b in [0, nb)): gather chain endpoints
    gf = lambda a: jnp.take_along_axis(a, jnp.clip(fpos, 0, M - 1), axis=1)
    gl = lambda a: jnp.take_along_axis(a, jnp.clip(lpos, 0, M - 1), axis=1)
    c_rc = gf(rc)
    use_rc_coords = c_rc & (lenf > 1)  # chain.rs:165-168
    c_qs = gf(q_s)
    c_qe = gl(q_e) - 1
    c_rs = jnp.where(use_rc_coords, gl(r_s), gf(r_s))
    c_re = jnp.where(use_rc_coords, gf(r_e), gl(r_e)) - 1
    c_rid = gf(bucket)
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

    gb = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    return (mapped, gb(c_rc), gb(c_qs), gb(c_qe), gb(c_rs), gb(c_re),
            gb(score), gb(c_mapq), gb(c_rid))


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
