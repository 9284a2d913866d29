"""Hash-sharded index: the scale-out backend for references too large to replicate.

The default multi-device mode replicates the index (human-scale ~640 MB fits HBM;
parallel/mesh.py). For references whose unique-seed table exceeds per-chip HBM,
this mode shards the two-choice hash table by hash range across the mesh's "dp"
axis (SURVEY.md §2.3 "shard by hash range across hosts ... with an all-to-all hit
exchange"). The probe becomes:

  1. all_gather the query (h1, h2) streams over dp              (ICI, 2*B*M*4 B)
  2. every device probes its own shard for ALL queries, masking
     hits to keys it owns (owner = h1 % D — keys are avalanche-mixed)
  3. psum_scatter the masked payload back to the owning query slice
     (each key exists in exactly ONE shard, so the sum IS the hit)

Everything else (seeding, matching, chaining) stays data-parallel on the local
read slice. Exactness: identical ProbeResult to a replicated probe (asserted in
tests/test_sharded_index.py on a virtual mesh).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.hashtable import BUCKET, NCOL, HashIndex, build_hash_index
from ..index.lookup import ProbeResult
from ..ops.chaining import MapResult, chain_and_select, project_coords
from ..ops.matching import find_matches
from ..ops.seeding import seed_batch
from ..params import Params


class ShardedHashIndex:
    """Host-side container: per-shard tables stacked with a leading shard axis."""

    def __init__(self, slots: jax.Array, n_shards: int, n: int):
        self.slots = slots      # int32 [D, S*BUCKET*NCOL] flat fused slots
        self.n_shards = n_shards
        self.n = n              # total stored keys


def build_sharded_index(
    h1: np.ndarray, h2: np.ndarray, rid, start, end, offset, rc, n_shards: int
) -> ShardedHashIndex:
    """Split deduped unique-seed columns by owner shard (h1 % D) and build one
    two-choice table per shard, padded to a common bucket count. Slots are
    FLAT fused int32 [S*BUCKET*NCOL] per shard (hashtable.py v4 rationale:
    tiny-minor-dim arrays get tile-padded 16-21x on TPU)."""
    owner = h1 % np.uint32(n_shards)
    tables: List[HashIndex] = []
    for s in range(n_shards):
        m = owner == s
        tables.append(
            build_hash_index(h1[m], h2[m], rid[m], start[m], end[m], offset[m], rc[m])
        )
    S = max(t.n_buckets for t in tables)
    slots = np.zeros((n_shards, S * BUCKET * NCOL), dtype=np.int32)
    slots[:, 0::NCOL] = -1
    slots[:, 1::NCOL] = -1
    for s, t in enumerate(tables):
        tS = t.n_buckets
        # interleave the shard's grouped-row (keys, pay) into fused per-slot rows
        from ..index.hashtable import key_lane, pay_lane

        tk = np.empty(tS * BUCKET * NCOL, dtype=np.int32)
        keys = np.asarray(t.keys).reshape(-1)
        pay = np.asarray(t.pay).reshape(-1)
        si = np.arange(tS * BUCKET, dtype=np.int64)
        kb, pb = key_lane(si), pay_lane(si)
        tk[0::NCOL] = keys[kb]
        tk[1::NCOL] = keys[kb + 1]
        for c in range(4):
            tk[2 + c :: NCOL] = pay[pb + c]
        # replicate the table so (key & (S-1)) probing still lands on the key's
        # bucket: bucket index b in the small table maps to b + j*tS copies
        reps = S // tS
        span = tS * BUCKET * NCOL
        for j in range(reps):
            slots[s, j * span : (j + 1) * span] = tk
    n = int(sum(t.n for t in tables))
    return ShardedHashIndex(jnp.asarray(slots), n_shards, n)


def _probe_shard(slots, qh1, qh2, shard_id, n_shards):
    """Probe one shard's table for all queries; miss for keys it doesn't own.
    One fused element gather (keys+payload) from the flat slot array."""
    S = slots.shape[0] // (BUCKET * NCOL)
    mask = np.uint32(S - 1)
    b1 = (qh1 & mask).astype(jnp.int32)
    b2 = ((qh2 ^ (qh1 >> 16)) & mask).astype(jnp.int32)
    lane = jnp.arange(BUCKET, dtype=jnp.int32)
    slot12 = jnp.concatenate([b1, b2], axis=-1)[..., None] * BUCKET + lane
    idx = slot12[..., None] * NCOL + jnp.arange(NCOL, dtype=jnp.int32)
    r12 = slots[idx]                                 # [..., 2M, 8, NCOL]
    r1, r2 = jnp.split(r12, 2, axis=-3)
    q1 = jax.lax.bitcast_convert_type(qh1, jnp.int32)[..., None]
    q2 = jax.lax.bitcast_convert_type(qh2, jnp.int32)[..., None]
    m1 = (r1[..., 0] == q1) & (r1[..., 1] == q2)
    m2 = (r2[..., 0] == q1) & (r2[..., 1] == q2)
    owned = (qh1 % np.uint32(n_shards)) == shard_id.astype(jnp.uint32)
    hit = (jnp.any(m1, axis=-1) | jnp.any(m2, axis=-1)) & owned

    def pick(field):
        a = jnp.max(jnp.where(m1, r1[..., field], np.int32(-1)), axis=-1)
        b = jnp.max(jnp.where(m2, r2[..., field], np.int32(-1)), axis=-1)
        return jnp.maximum(jnp.maximum(a, b), 0)

    # columns: ridrc, start, end, offset (hashtable.py NCOL layout)
    pay = jnp.stack([pick(2), pick(3), pick(4), pick(5)], axis=-1)
    pay = jnp.where(hit[..., None], pay, 0)
    return hit, pay


@functools.partial(jax.jit, static_argnames=("p", "cap", "mesh"))
def _map_batch_hash_sharded(codes, lengths, slots, ref_lens, p: Params,
                            cap: int, mesh: Mesh):
    D = mesh.devices.size

    def per_device(codes_s, lengths_s, slots_s, ref_lens_r):
        slots_s = slots_s[0]      # [S*BUCKET*NCOL] local shard (flat fused)
        shard_id = jax.lax.axis_index("dp")
        sb = seed_batch(codes_s, lengths_s, p, cap)
        # all-to-all hit exchange: gather every device's queries, probe the local
        # shard, then reduce the (disjoint) hits back to the owning slice
        gh1 = jax.lax.all_gather(sb.h1, "dp", tiled=True)  # [B, M]
        gh2 = jax.lax.all_gather(sb.h2, "dp", tiled=True)
        hit, pay = _probe_shard(slots_s, gh1, gh2, shard_id, D)
        combined = jnp.concatenate(
            [hit[..., None].astype(jnp.int32), pay], axis=-1
        )  # [B, M, 5]
        local = jax.lax.psum_scatter(combined, "dp", scatter_dimension=0, tiled=True)
        pr = ProbeResult(
            hit=local[..., 0] > 0,
            rid=local[..., 1] >> 1, start=local[..., 2], end=local[..., 3],
            offset=local[..., 4], rc=(local[..., 1] & 1).astype(bool),
        )
        mb = find_matches(sb, pr, p)
        sel = chain_and_select(mb, p)
        return project_coords(sel, lengths_s, ref_lens_r)._replace(overflow=sb.overflow)

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P("dp"), P()),
        out_specs=P("dp"),
        check_vma=False,
    )(codes, lengths, slots, ref_lens)


def map_batch_hash_sharded(
    mesh: Mesh, codes, lengths, sidx: ShardedHashIndex, ref_lens, p: Params, cap: int
) -> MapResult:
    """Map a read batch with the index hash-sharded over the mesh."""
    B = codes.shape[0]
    D = mesh.devices.size
    if B % D:
        raise ValueError(f"batch size {B} not divisible by mesh size {D}")
    if sidx.n_shards != D:
        raise ValueError(f"index built for {sidx.n_shards} shards, mesh has {D}")
    dp2 = NamedSharding(mesh, P("dp", None))
    dp1 = NamedSharding(mesh, P("dp"))
    codes_d = jax.device_put(np.asarray(codes), dp2)
    lens_d = jax.device_put(np.asarray(lengths), dp1)
    slots_d = jax.device_put(sidx.slots, NamedSharding(mesh, P("dp", None)))
    ref_r = jax.device_put(jnp.asarray(ref_lens), NamedSharding(mesh, P()))
    return _map_batch_hash_sharded(codes_d, lens_d, slots_d, ref_r, p, cap, mesh)
