"""Bucketed two-choice hash table: the fast device index backend.

Replaces the sorted-array binary search (26 *dependent* gathers per probe) with a
constant-depth probe. This is the TPU-native analog of the reference's DashMap
keyed by the k-min-mer hash itself (identity hasher, src/index.rs:12-39,73-76):
our keys are already avalanche-mixed, so bucket indices are just masked key bits.

Layout (v4, r5): two 128-lane-grouped int32 arrays —
  keys [ceil(S/8), 128]: 8 buckets per row; slot s occupies lanes
      (s & 63)*2 .. +2 with (h1, h2);
  pay  [ceil(S*8/32), 128]: 32 slots per row; slot s occupies lanes
      (s & 31)*4 .. +4 with (ridrc, start, end, offset).
Two constraints force exactly this shape (both measured on v5e):
  1. TPU tile padding: the round-3 fused [S, 8, 6] layout's tiny minor dims
     get padded to the (8, 128) tile — 16-21x HBM inflation; the CHM13-scale
     materialize tried to allocate 51.5 GB for a nominally 3.2 GB table.
     A 128-int minor dimension tiles with ZERO padding at any S.
  2. Gather cost scales with INDEX COUNT, not fetch width (DESIGN.md): a
     per-element flat-index probe ([..., 2M, 8, 2] indices) ran the map
     batch 6.4x slower than row gathers. Here the probe stays at TWO row
     gathers with the ORIGINAL index counts; the bucket membership test is
     an in-register compare over the fetched row, and the payload extraction
     is a one-hot contraction — no second gather, no dynamic slice.

Exactness: a key is found iff present (both candidate buckets are always checked);
build fails over to a larger table until every key fits, so no seed is ever silently
dropped. The (0xFFFFFFFF, 0xFFFFFFFF) key is reserved as the empty-slot sentinel; a
real key colliding with it is dropped at build with a warning (probability 2^-64 per
key; the reference has no analogous slot so this is the one semantic epsilon).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .lookup import ProbeResult

BUCKET = 8
_EMPTY = np.uint32(0xFFFFFFFF)
_EMPTY_I = np.int32(-1)  # 0xFFFFFFFF as int32


NCOL = 6  # logical slot columns: h1, h2, ridrc, start, end, offset


class HashIndex(NamedTuple):
    """128-lane-grouped slot arrays (module docstring); values are int32
    (h1/h2 bit-cast; ridrc = rid << 1 | rc — packing the 1-bit strand into
    the contig id keeps the table at 24 B/slot, which matters at CHM13
    scale: ~40M keys -> the table is the dominant HBM resident). Empty slots
    carry h1 == h2 == -1."""

    keys: jax.Array  # int32 [S // 8, 128]   (8 buckets per row)
    pay: jax.Array   # int32 [S * BUCKET // 32, 128]  (32 slots per row)

    @property
    def n_buckets(self) -> int:
        return self.keys.shape[0] * 8

    @property
    def n(self) -> int:
        """Stored key count: non-sentinel slots, counted ON DEVICE (pulling
        the full table costs seconds through this environment's ~25 MB/s d2h
        tunnel; the scalar pull is ~0.1 s)."""
        pairs = self.keys.reshape(-1, 2)
        return int(jnp.sum(~((pairs[:, 0] == _EMPTY_I) & (pairs[:, 1] == _EMPTY_I))))


def _buckets(h1: np.ndarray, h2: np.ndarray, mask: int):
    b1 = h1 & mask
    # independent second choice from the other key word (keys are pre-avalanched)
    b2 = (h2 ^ (h1 >> 16)) & mask
    return b1.astype(np.int64), b2.astype(np.int64)


def key_lane(slot_of):
    """Flat lane of slot i's h1 within the flattened keys array."""
    return (slot_of >> 6) * 128 + (slot_of & 63) * 2


def pay_lane(slot_of):
    """Flat lane of slot i's ridrc within the flattened pay array."""
    return (slot_of >> 5) * 128 + (slot_of & 31) * 4


def pack_slots(S: int, slot_of, h1, h2, rid, start, end, offset, rc):
    """Host-side grouped-row (keys, pay) assembly from flat placements."""
    keys = np.full((S // 8) * 128, _EMPTY_I, dtype=np.int32)
    pay = np.zeros((S * BUCKET // 32) * 128, dtype=np.int32)
    kb = key_lane(slot_of)
    pb = pay_lane(slot_of)
    keys[kb] = h1.astype(np.int64).astype(np.int32)
    keys[kb + 1] = h2.astype(np.int64).astype(np.int32)
    pay[pb] = (np.asarray(rid, np.int32) << 1) | np.asarray(rc, np.int32)
    pay[pb + 1] = start
    pay[pb + 2] = end
    pay[pb + 3] = offset
    return keys.reshape(-1, 128), pay.reshape(-1, 128)


def build_hash_index(
    h1: np.ndarray, h2: np.ndarray, rid, start, end, offset, rc,
    load: float = 0.5,
) -> HashIndex:
    """Host-side build. Inputs are the deduped unique-seed columns."""
    n = int(h1.shape[0])
    sentinel = (h1 == _EMPTY) & (h2 == _EMPTY)
    if sentinel.any():
        keep = ~sentinel
        h1, h2 = h1[keep], h2[keep]
        rid, start, end, offset, rc = (a[keep] for a in (rid, start, end, offset, rc))
        n = int(h1.shape[0])
    S = 1 << max(4, int(np.ceil(np.log2(max(1, n) / (BUCKET * load)))))
    while True:
        placed_slot = _try_place(h1, h2, S)
        if placed_slot is not None:
            break
        S *= 2
    keys, pay = pack_slots(
        S, placed_slot, h1, h2,
        np.asarray(rid, dtype=np.int32), np.asarray(start, dtype=np.int32),
        np.asarray(end, dtype=np.int32), np.asarray(offset, dtype=np.int32),
        np.asarray(rc, dtype=np.int32),
    )
    return HashIndex(keys=jnp.asarray(keys), pay=jnp.asarray(pay))


def _try_place(h1: np.ndarray, h2: np.ndarray, S: int):
    """Vectorized greedy placement rounds: for each (choice, slot-offset) pair, the
    first unplaced claimant of each free slot wins. Each key aims FIRST at the
    choice with the smaller total demand (plain first-fit-b1 fails per-mille of
    keys at load 0.5 and forces a 2x table; demand-balanced greedy measures zero
    failures through 0.5 — scripts/r3_placement_load.py). Returns flat slot per
    key or None if some keys could not be placed at this size."""
    n = h1.shape[0]
    mask = S - 1
    b1, b2 = _buckets(h1, h2, mask)
    d1 = np.bincount(b1, minlength=S)
    d2 = np.bincount(b2, minlength=S)
    use2 = d2[b2] < d1[b1]
    first = np.where(use2, b2, b1)
    second = np.where(use2, b1, b2)
    slot_of = np.full(n, -1, dtype=np.int64)
    taken = np.zeros(S * BUCKET, dtype=bool)
    for bb in (first, second):
        for off in range(BUCKET):
            un = slot_of < 0
            if not un.any():
                break
            cand = bb[un] * BUCKET + off
            free = ~taken[cand]
            idx_un = np.nonzero(un)[0][free]
            cand = cand[free]
            # first claimant per slot wins
            uniq, first = np.unique(cand, return_index=True)
            winners = idx_un[first]
            slot_of[winners] = uniq
            taken[uniq] = True
    if (slot_of < 0).any():
        return None
    return slot_of


def probe_hash(index: HashIndex, qh1: jax.Array, qh2: jax.Array) -> ProbeResult:
    """Constant-depth lookup: one KEY row gather covering both candidate
    buckets plus one payload row gather at the matching slot — the ORIGINAL
    (round-2-measured-optimal) index counts. The fetched 128-lane rows stay
    in registers: bucket membership is a lane-mask compare and the payload
    quad comes out via a one-hot contraction, so no further gathers."""
    S = index.n_buckets
    mask = np.uint32(S - 1)
    b1 = (qh1 & mask).astype(jnp.int32)
    b2 = ((qh2 ^ (qh1 >> 16)) & mask).astype(jnp.int32)
    cat_b = jnp.concatenate([b1, b2], axis=-1)          # [..., 2M]
    r = index.keys[cat_b >> 3]                          # [..., 2M, 128]
    pairs = r.reshape(r.shape[:-1] + (64, 2))
    r1, r2 = jnp.split(pairs, 2, axis=-3)               # [..., M, 64, 2]
    lane = jnp.arange(64, dtype=jnp.int32)
    lb = lane >> 3                                      # bucket-in-row per lane
    q1 = jax.lax.bitcast_convert_type(qh1, jnp.int32)[..., None]
    q2 = jax.lax.bitcast_convert_type(qh2, jnp.int32)[..., None]
    m1 = (r1[..., 0] == q1) & (r1[..., 1] == q2) & (lb == (b1 & 7)[..., None])
    m2 = (r2[..., 0] == q1) & (r2[..., 1] == q2) & (lb == (b2 & 7)[..., None])
    hit = jnp.any(m1, axis=-1) | jnp.any(m2, axis=-1)
    s1 = (b1 >> 3)[..., None] * 64 + lane               # flat slot ids per lane
    s2 = (b2 >> 3)[..., None] * 64 + lane
    slot = jnp.max(
        jnp.concatenate(
            [jnp.where(m1, s1, -1), jnp.where(m2, s2, -1)], axis=-1
        ),
        axis=-1,
    )
    sp = jnp.maximum(slot, 0)
    rp = index.pay[sp >> 5]                             # [..., M, 128]
    oh = ((sp & 31)[..., None] == jnp.arange(32, dtype=jnp.int32))
    pay = jnp.sum(
        rp.reshape(rp.shape[:-1] + (32, 4)) * oh[..., None].astype(jnp.int32),
        axis=-2,
    )                                                   # [..., M, 4]
    return ProbeResult(
        hit=hit,
        rid=pay[..., 0] >> 1,
        start=pay[..., 1],
        end=pay[..., 2],
        offset=pay[..., 3],
        rc=(pay[..., 0] & 1).astype(bool),
    )
