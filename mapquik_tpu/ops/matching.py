"""Match extension as a batched scan: probe hits -> maximal consecutive-seed runs.

Replicates the reference's recursive Match::extend (src/match.rs:45-58) as run
segmentation over the per-read k-min-mer axis:

  - a hit starts a new Match unless it extends the immediately preceding hit's run;
  - the extension predicate replicates Match::check's precedence behavior
    (src/match.rs:39-43): forward runs only require ref-offset delta +1 (the quirk —
    ref-id and strand conjuncts are bypassed); rc runs require same ref, strand
    consistency, and offset delta -1;
  - an index miss terminates the current run (the reference also consumes the miss,
    which is observationally identical to skipping it — it could never start a Match);
  - Match fields: forward runs extend r_end, rc runs extend r_start
    (src/match.rs:31-37); the bucket is the FIRST entry's ref id (src/mers.rs:68).

The per-position scan carries only (prev-hit, prev-entry, segment-rc) lanes across the
k-min-mer axis; everything else is recovered with cumulative ops + compaction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.lookup import ProbeResult
from ..params import Params
from .seeding import SeedBatch, _compact_positions

_BIG_I32 = np.int32(0x7FFFFFFF)


class MatchBatch(NamedTuple):
    """Per-read Match records, slot i = i-th Match in query order. [B, M] arrays."""

    count: jax.Array    # int32: number of consecutive k-min-mer matches
    q_start: jax.Array  # int32
    q_end: jax.Array    # int32
    r_start: jax.Array  # int32
    r_end: jax.Array    # int32
    rc: jax.Array       # bool
    bucket: jax.Array   # int32: ref id of the first entry (grouping key)
    n: jax.Array        # int32 [B]: number of Matches


def find_matches(sb: SeedBatch, pr: ProbeResult, p: Params) -> MatchBatch:
    B, M = sb.h1.shape
    slot = jnp.arange(M, dtype=jnp.int32)[None, :]
    in_seq = slot < sb.n[:, None]
    hit = pr.hit & in_seq
    rc_new = sb.rev != pr.rc  # strand of a Match starting at this position

    def step(state, xs):
        prev_hit, prev_eid, prev_eoff, seg_rc = state
        hit_j, eid_j, eoff_j, rc_new_j = xs
        if p.fix_check_bug:
            link0 = (eid_j == prev_eid) & (~rc_new_j) & (eoff_j - prev_eoff == 1)
        else:
            # quirk: forward extension checks offset delta only (match.rs:39-43)
            link0 = eoff_j - prev_eoff == 1
        link1 = (eid_j == prev_eid) & rc_new_j & (prev_eoff - eoff_j == 1)
        link = jnp.where(seg_rc, link1, link0)
        head_j = hit_j & ~(prev_hit & link)
        seg_rc_next = jnp.where(hit_j, jnp.where(head_j, rc_new_j, seg_rc), seg_rc)
        return (hit_j, eid_j, eoff_j, seg_rc_next), head_j

    init = (
        jnp.zeros(B, bool),
        jnp.full(B, -1, jnp.int32),
        jnp.full(B, -2, jnp.int32),
        jnp.zeros(B, bool),
    )
    xs = (hit.T, pr.rid.T, pr.offset.T, rc_new.T)
    _, head_t = jax.lax.scan(step, init, xs)
    head = head_t.T
    hit_next = jnp.concatenate([hit[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    head_next = jnp.concatenate([head[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    last = hit & (~hit_next | head_next)

    hpos, n_seg = _compact_positions(head, M)
    lpos, _ = _compact_positions(last, M)
    g = lambda a, idx: jnp.take_along_axis(a, idx, axis=1)
    rc = g(rc_new, hpos)
    mb = MatchBatch(
        count=lpos - hpos + 1,
        q_start=g(sb.start, hpos),
        q_end=g(sb.end, lpos),
        r_start=jnp.where(rc, g(pr.start, lpos), g(pr.start, hpos)),
        r_end=jnp.where(rc, g(pr.end, hpos), g(pr.end, lpos)),
        rc=rc,
        bucket=g(pr.rid, hpos),
        n=n_seg,
    )
    # clear padding slots
    ok = jnp.arange(M, dtype=jnp.int32)[None, :] < n_seg[:, None]
    return MatchBatch(
        count=jnp.where(ok, mb.count, 0),
        q_start=jnp.where(ok, mb.q_start, 0),
        q_end=jnp.where(ok, mb.q_end, 0),
        r_start=jnp.where(ok, mb.r_start, 0),
        r_end=jnp.where(ok, mb.r_end, 0),
        rc=ok & mb.rc,
        bucket=jnp.where(ok, mb.bucket, _BIG_I32),
        n=mb.n,
    )
