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
from .seeding import SeedBatch, _compact_positions, rowsort

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

    # The reference walks k-min-mers sequentially carrying the current Match's strand
    # (recursive Match::extend). The only genuinely sequential state is that ONE bit —
    # seg_rc, the strand of the segment containing the previous position — so the
    # whole pass is an associative composition of per-position 1-bit transition
    # functions g_j: seg_rc -> seg_rc', encoded as the pair (g_j(0), g_j(1)) and
    # combined in log depth. Everything else (link predicates, head recovery) is
    # position-local.
    prev_hit = jnp.concatenate([jnp.zeros((B, 1), bool), hit[:, :-1]], axis=1)
    prev_eid = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), pr.rid[:, :-1]], axis=1)
    prev_eoff = jnp.concatenate([jnp.full((B, 1), -2, jnp.int32), pr.offset[:, :-1]], axis=1)
    if p.fix_check_bug:
        link0 = (pr.rid == prev_eid) & (~rc_new) & (pr.offset - prev_eoff == 1)
    else:
        # quirk: forward extension checks offset delta only (match.rs:39-43)
        link0 = pr.offset - prev_eoff == 1
    link1 = (pr.rid == prev_eid) & rc_new & (prev_eoff - pr.offset == 1)
    # head_j as a function of incoming seg_rc s: head(s) = hit & !(prev_hit & link_s)
    head_if0 = hit & ~(prev_hit & link0)
    head_if1 = hit & ~(prev_hit & link1)
    # outgoing state: s' = hit ? (head(s) ? rc_new : s) : s
    g0 = jnp.where(hit, jnp.where(head_if0, rc_new, False), False)
    g1 = jnp.where(hit, jnp.where(head_if1, rc_new, True), True)

    def compose(f0, f1, g0_, g1_):
        # (g ∘ f): state s -> g(f(s)); f applied first (earlier positions)
        return jnp.where(f0, g1_, g0_), jnp.where(f1, g1_, g0_)

    # Hillis-Steele inclusive scan of the function composition (associativity is all
    # it needs). Manual shift-scan, NOT lax.associative_scan — see seeding._prefix_xor
    # for why (TPU compile-time blowup when scans fuse with sorts/gathers).
    G0, G1 = g0, g1
    s = 1
    while s < M:
        # prefix ending at i-s, padded with the identity function (f(0)=0, f(1)=1)
        P0 = jnp.concatenate([jnp.zeros((B, s), bool), G0[:, :-s]], axis=1)
        P1 = jnp.concatenate([jnp.ones((B, s), bool), G1[:, :-s]], axis=1)
        G0, G1 = compose(P0, P1, G0, G1)
        s *= 2
    # state BEFORE position j = composition of g_1..g_{j-1} applied to s0 = 0
    s_in = jnp.concatenate([jnp.zeros((B, 1), bool), G0[:, :-1]], axis=1)
    head = jnp.where(s_in, head_if1, head_if0)
    hit_next = jnp.concatenate([hit[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    head_next = jnp.concatenate([head[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
    last = hit & (~hit_next | head_next)

    # Compact head/last fields via multi-operand sorts keyed on (flag ? pos : BIG):
    # the fields ride along as sort operands, so no per-field gathers are needed
    # (one [B, M] gather costs ~1.4-4ms on v5e; a multi-operand sort at M=512 is one).
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    hkey = jnp.where(head, pos, _BIG_I32)
    lkey = jnp.where(last, pos, _BIG_I32)
    # (a sort-free log-shift compaction here was A/B'd on v5e and REJECTED:
    # +0.07 ms = noise; experiments/toggles_ab_v5e.txt, DESIGN.md rejected list)
    hpos, rc_h, qs_h, rs_h, re_h, rid_h = rowsort(
        [hkey, rc_new.astype(jnp.int32), sb.start, pr.start, pr.end, pr.rid]
    )
    lpos, qe_l, rs_l, re_l = rowsort([lkey, sb.end, pr.start, pr.end])
    n_seg = jnp.sum(head.astype(jnp.int32), axis=1)
    rc = rc_h.astype(bool)
    mb = MatchBatch(
        count=lpos - hpos + 1,
        q_start=qs_h,
        q_end=qe_l,
        r_start=jnp.where(rc, rs_l, rs_h),
        r_end=jnp.where(rc, re_h, re_l),
        rc=rc,
        bucket=rid_h,
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
