"""Bucketed two-choice hash table: the fast device index backend.

Replaces the sorted-array binary search (26 *dependent* gathers per probe) with a
constant-depth probe. This is the TPU-native analog of the reference's DashMap
keyed by the k-min-mer hash itself (identity hasher, src/index.rs:12-39,73-76):
our keys are already avalanche-mixed, so bucket indices are just masked key bits.

Layout (v4, r5): two FLAT int32 arrays — `keys` [S*BUCKET*2] with (h1, h2)
interleaved per slot, and `pay` [S*BUCKET*4] with (ridrc, start, end, offset)
interleaved per slot. The round-3 fused [S, BUCKET, 6] layout hit XLA's TPU
tiling: arrays whose minor dimension is tiny get padded to the (8, 128) tile,
inflating the table 16-21x on HBM — at CHM13 scale (S = 2^24) the materialize
scatter tried to allocate 51.5 GB for a nominally 3.2 GB table. Flat 1D arrays
tile with negligible padding at ANY size, and the probe still costs exactly
TWO gather ops (key check, then payload at the matching slot) — gathers here
are latency-bound, so op COUNT is what matters (DESIGN.md).

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
    """keys[i*2:(i+1)*2] = (h1, h2) and pay[i*4:(i+1)*4] = (ridrc, start, end,
    offset) for flat slot i, as int32 (h1/h2 bit-cast; ridrc = rid << 1 | rc —
    packing the 1-bit strand into the contig id keeps the table at 24 B/slot,
    which matters at CHM13 scale: ~40M keys -> the table is the dominant HBM
    resident). Empty slots carry h1 == h2 == -1."""

    keys: jax.Array  # int32 [S * BUCKET * 2]
    pay: jax.Array   # int32 [S * BUCKET * 4]

    @property
    def n_buckets(self) -> int:
        return self.keys.shape[0] // (BUCKET * 2)

    @property
    def n(self) -> int:
        """Stored key count: non-sentinel slots, counted ON DEVICE (pulling
        the full table costs seconds through this environment's ~25 MB/s d2h
        tunnel; the scalar pull is ~0.1 s)."""
        h1 = self.keys[0::2]
        h2 = self.keys[1::2]
        return int(jnp.sum(~((h1 == _EMPTY_I) & (h2 == _EMPTY_I))))


def _buckets(h1: np.ndarray, h2: np.ndarray, mask: int):
    b1 = h1 & mask
    # independent second choice from the other key word (keys are pre-avalanched)
    b2 = (h2 ^ (h1 >> 16)) & mask
    return b1.astype(np.int64), b2.astype(np.int64)


def pack_slots(S: int, slot_of, h1, h2, rid, start, end, offset, rc):
    """Host-side flat (keys, pay) assembly from placements (slot_of int64 [n])."""
    keys = np.full(S * BUCKET * 2, _EMPTY_I, dtype=np.int32)
    pay = np.zeros(S * BUCKET * 4, dtype=np.int32)
    keys[slot_of * 2] = h1.astype(np.int64).astype(np.int32)
    keys[slot_of * 2 + 1] = h2.astype(np.int64).astype(np.int32)
    pay[slot_of * 4] = (np.asarray(rid, np.int32) << 1) | np.asarray(rc, np.int32)
    pay[slot_of * 4 + 1] = start
    pay[slot_of * 4 + 2] = end
    pay[slot_of * 4 + 3] = offset
    return keys, pay


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
    """Constant-depth lookup: one KEY gather covering both candidate buckets
    plus one payload gather at the matching slot. Gathers here are
    latency-bound; fetching keys+payload fused for all 16 candidate slots
    measured ~1.8 ms/batch slower than this split (round 2)."""
    S = index.n_buckets
    mask = np.uint32(S - 1)
    b1 = (qh1 & mask).astype(jnp.int32)
    b2 = ((qh2 ^ (qh1 >> 16)) & mask).astype(jnp.int32)
    lane = jnp.arange(BUCKET, dtype=jnp.int32)
    slot12 = jnp.concatenate([b1, b2], axis=-1)[..., None] * BUCKET + lane
    kidx = slot12[..., None] * 2 + jnp.arange(2, dtype=jnp.int32)
    r12 = index.keys[kidx]                      # [..., 2M, BUCKET, 2]
    r1, r2 = jnp.split(r12, 2, axis=-3)
    s1, s2 = jnp.split(slot12, 2, axis=-2)
    q1 = jax.lax.bitcast_convert_type(qh1, jnp.int32)[..., None]
    q2 = jax.lax.bitcast_convert_type(qh2, jnp.int32)[..., None]
    m1 = (r1[..., 0] == q1) & (r1[..., 1] == q2)
    m2 = (r2[..., 0] == q1) & (r2[..., 1] == q2)
    hit = jnp.any(m1, axis=-1) | jnp.any(m2, axis=-1)
    slot = jnp.max(
        jnp.concatenate(
            [jnp.where(m1, s1, -1), jnp.where(m2, s2, -1)], axis=-1
        ),
        axis=-1,
    )
    pidx = jnp.maximum(slot, 0)[..., None] * 4 + jnp.arange(4, dtype=jnp.int32)
    pay = index.pay[pidx]                       # [..., 4]
    return ProbeResult(
        hit=hit,
        rid=pay[..., 0] >> 1,
        start=pay[..., 1],
        end=pay[..., 2],
        offset=pay[..., 3],
        rc=(pay[..., 0] & 1).astype(bool),
    )
