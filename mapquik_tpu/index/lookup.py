"""Device-resident unique-seed index: sorted (h1, h2) key pairs + payload columns.

The reference stores k-min-mers in a sharded concurrent hash map keyed by the hash
itself with duplicate-insertion tombstoning (src/index.rs:73-126). Here the index is an
immutable sorted array built by sort + adjacent-duplicate removal (dedup as a segment
operation — SURVEY.md §2.3 TPU plan), probed with a vectorized pair-key binary search.
Removing every key that occurs more than once is exactly the reference's
tombstone-then-filter semantics (only k-min-mers unique in the whole reference match).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class RefIndex(NamedTuple):
    """Sorted-unique key columns + payload columns (reference Entry fields)."""

    h1: jax.Array      # uint32 [N] sorted by (h1, h2)
    h2: jax.Array      # uint32 [N]
    rid: jax.Array     # int32  [N] reference (contig) id
    start: jax.Array   # int32  [N]
    end: jax.Array     # int32  [N]
    offset: jax.Array  # int32  [N] ordinal in the contig's k-min-mer list
    rc: jax.Array      # bool   [N]

    @property
    def n(self) -> int:
        return self.h1.shape[0]


class ProbeResult(NamedTuple):
    hit: jax.Array     # bool  [...]
    rid: jax.Array     # int32 [...]
    start: jax.Array   # int32 [...]
    end: jax.Array     # int32 [...]
    offset: jax.Array  # int32 [...]
    rc: jax.Array      # bool  [...]


def dedup_host(h1: np.ndarray, h2: np.ndarray, rid, start, end, offset, rc):
    """Sort by (h1, h2) and drop every key occurring more than once.

    This is the whole-reference uniqueness filter: the reference implements it as
    insert-then-tombstone (src/index.rs:94-104) + tombstone filtering at lookup
    (src/index.rs:118-126); as a batch operation it is sort + neighbor-equality."""
    # single u64 sort (measurably faster than lexsort on two u32 keys at the
    # human-genome scale of ~40M entries)
    packed = (h1.astype(np.uint64) << np.uint64(32)) | h2.astype(np.uint64)
    order = np.argsort(packed, kind="stable")
    packed = packed[order]
    h1, h2 = h1[order], h2[order]
    rid, start, end, offset, rc = (a[order] for a in (rid, start, end, offset, rc))
    if h1.shape[0] > 0:
        same_prev = np.zeros(h1.shape[0], dtype=bool)
        same_prev[1:] = packed[1:] == packed[:-1]
        dup = same_prev.copy()
        dup[:-1] |= same_prev[1:]
        keep = ~dup
        h1, h2 = h1[keep], h2[keep]
        rid, start, end, offset, rc = (a[keep] for a in (rid, start, end, offset, rc))
    return h1, h2, rid, start, end, offset, rc


def from_host_arrays(
    h1: np.ndarray, h2: np.ndarray, rid, start, end, offset, rc, dedup: bool = True
) -> RefIndex:
    """Sorted-array backend from raw (possibly duplicated) host columns."""
    if dedup:
        h1, h2, rid, start, end, offset, rc = dedup_host(h1, h2, rid, start, end, offset, rc)
    else:
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        rid, start, end, offset, rc = (a[order] for a in (rid, start, end, offset, rc))
    return RefIndex(
        h1=jnp.asarray(h1.astype(np.uint32)),
        h2=jnp.asarray(h2.astype(np.uint32)),
        rid=jnp.asarray(rid.astype(np.int32)),
        start=jnp.asarray(start.astype(np.int32)),
        end=jnp.asarray(end.astype(np.int32)),
        offset=jnp.asarray(offset.astype(np.int32)),
        rc=jnp.asarray(rc.astype(bool)),
    )


def probe_sortjoin(index: RefIndex, qh1: jax.Array, qh2: jax.Array) -> ProbeResult:
    """Merge-join probe: sort (table keys + query keys) together, carry the
    last table element forward, gather its payload, sort back to query order.

    VERDICT r2 Next #6 experiment: replaces the per-read latency-bound gathers
    of the hash probe with three 1D sorts of (n_table + n_query) elements —
    1D sorts run at radix/stream speed on this device (40M in ~0.11 s), so
    this can win when the table is small relative to the gather count.
    Exactness: identical hit/payload semantics to probe() (pure lookup).
    Scales with table size, so callers choose it only for small tables."""
    nt = index.n
    shape = qh1.shape
    if nt == 0:
        z = jnp.zeros(shape, jnp.int32)
        return ProbeResult(jnp.zeros(shape, bool), z, z, z, z, jnp.zeros(shape, bool))
    q1 = qh1.reshape(-1)
    q2 = qh2.reshape(-1)
    nq = q1.shape[0]
    h1c = jnp.concatenate([index.h1, q1])
    h2c = jnp.concatenate([index.h2, q2])
    ident = jnp.arange(nt + nq, dtype=jnp.int32)  # 0..nt-1 table, nt.. queries
    # lexicographic (h1, h2) via two STABLE single-key passes; table elements
    # sort BEFORE equal-key queries (stable + table-first concat)
    h2s, h1s, ids = jax.lax.sort([h2c, h1c, ident], num_keys=1, is_stable=True)
    h1s, h2s, ids = jax.lax.sort([h1s, h2s, ids], num_keys=1, is_stable=True)
    # carry the most recent table element forward: table ids ascend with key
    # order, so a plain cummax is the segment carry
    cand = jax.lax.cummax(jnp.where(ids < nt, ids, -1), axis=0)
    candc = jnp.clip(cand, 0, nt - 1)
    hit_s = (cand >= 0) & (index.h1[candc] == h1s) & (index.h2[candc] == h2s)
    # payload gather at the candidate (table-sized 1D gathers, stream speed)
    pay_s = jnp.stack(
        [
            index.rid[candc], index.start[candc], index.end[candc],
            index.offset[candc], index.rc[candc].astype(jnp.int32),
        ],
        axis=-1,
    )
    pay_s = jnp.where(hit_s[:, None], pay_s, 0)
    # back to query order: one stable sort by id; first nt rows are the table
    ids2, hit_q, p0, p1, p2, p3, p4 = jax.lax.sort(
        [ids, hit_s.astype(jnp.int32)] + [pay_s[:, i] for i in range(5)],
        num_keys=1, is_stable=True,
    )
    sl = slice(nt, nt + nq)
    return ProbeResult(
        hit=(hit_q[sl] > 0).reshape(shape),
        rid=p0[sl].reshape(shape),
        start=p1[sl].reshape(shape),
        end=p2[sl].reshape(shape),
        offset=p3[sl].reshape(shape),
        rc=(p4[sl] > 0).reshape(shape),
    )


def probe(index: RefIndex, qh1: jax.Array, qh2: jax.Array) -> ProbeResult:
    """Vectorized binary search for pair keys. Any input shape; exact membership.

    ~log2(N) dependent gathers per query (the reference's hot loop C — random hash-map
    probes, src/index.rs:118-126). A Pallas open-addressing backend can replace this
    without touching callers.
    """
    n = index.n
    shape = qh1.shape
    if n == 0:
        z = jnp.zeros(shape, jnp.int32)
        return ProbeResult(jnp.zeros(shape, bool), z, z, z, z, jnp.zeros(shape, bool))
    lo = jnp.zeros(shape, jnp.int32)
    hi = jnp.full(shape, n, jnp.int32)
    steps = max(1, int(np.ceil(np.log2(max(2, n)))) + 1)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) >> 1
        mh1 = index.h1[mid]
        mh2 = index.h2[mid]
        less = (mh1 < qh1) | ((mh1 == qh1) & (mh2 < qh2))
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.minimum(lo, n - 1)
    hit = (lo < n) & (index.h1[pos] == qh1) & (index.h2[pos] == qh2)
    return ProbeResult(
        hit=hit,
        rid=index.rid[pos],
        start=index.start[pos],
        end=index.end[pos],
        offset=index.offset[pos],
        rc=index.rc[pos],
    )
