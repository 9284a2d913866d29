"""Per-read candidate-locus statistics (device op).

TPU-native equivalent of the reference's gated stats module (src/stats.rs:63-94):
for each read, collect the (ref id, r_start) of every index hit, sort, and count
"loci" — consecutive sorted locations more than 48kb apart (2x mean read length) or
on different references each start a new locus. The reference sorts by
(fxhash32(id), start); since every id group stays contiguous under any id ordering
and the first element of a group always counts as a jump, the locus count is
identical when sorting by (id, start) directly (modulo 2^-32 hash collisions).

The reference compile-gates this off (src/stats.rs:12); here it is a runtime flag
(`--read-stats`) running as a separate small jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params

# expected minimal distance between unrelated regions, 2x average HiFi read length
# (src/stats.rs:78)
LOCUS_DIST = 48_000

_BIG_I32 = np.int32(0x7FFFFFFF)


def count_loci(hit: jax.Array, rid: jax.Array, start: jax.Array, valid: jax.Array):
    """nb_loci per read. hit/valid bool [B, M]; rid/start int32 [B, M]."""
    use = hit & valid
    B = hit.shape[0]
    rkey = jnp.where(use, rid.astype(jnp.int32), _BIG_I32)
    skey = jnp.where(use, start.astype(jnp.int32), _BIG_I32)
    # (rid, start) lexicographic via two stable single-key radix passes
    # (num_keys=2 leaves XLA's fast sort path)
    skey, rkey = jax.lax.sort([skey, rkey], num_keys=1, dimension=1, is_stable=True)
    s_rid, s_start = jax.lax.sort([rkey, skey], num_keys=1, dimension=1, is_stable=True)
    p_rid = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), s_rid[:, :-1]], axis=1)
    p_start = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), s_start[:, :-1]], axis=1)
    is_hit = s_rid != _BIG_I32
    jump = is_hit & (
        (s_rid != p_rid) | (s_start - p_start > np.int32(LOCUS_DIST))
    )
    return jnp.sum(jump.astype(jnp.int32), axis=1)


@functools.partial(jax.jit, static_argnames=("p", "cap"))
def read_stats_batch(codes, lengths, index, p: Params, cap: int) -> jax.Array:
    """nb_loci int32 [B] for a read batch (recomputes seeding + probe; debug path)."""
    from ..index.hashtable import HashIndex, probe_hash
    from ..index.lookup import probe
    from .seeding import seed_batch

    sb = seed_batch(codes, lengths, p, cap)
    if isinstance(index, HashIndex):
        pr = probe_hash(index, sb.h1, sb.h2)
    else:
        pr = probe(index, sb.h1, sb.h2)
    slot = jnp.arange(sb.h1.shape[1], dtype=jnp.int32)[None, :]
    valid = slot < sb.n[:, None]
    return count_loci(pr.hit, pr.rid, pr.start, valid)


class StatsWriter:
    """`{prefix}.read_stats` line writer, format `{q_id}: {nb_loci}`
    (src/stats.rs:88)."""

    def __init__(self, output_prefix: str):
        self.path = output_prefix + ".read_stats"
        self._f = open(self.path, "w")
        print("Stats module initialized.")

    def write_batch(self, names, nb_loci) -> None:
        loci = np.asarray(nb_loci)
        for i, name in enumerate(names):
            self._f.write(f"{name}: {int(loci[i])}\n")

    def close(self) -> None:
        self._f.close()
