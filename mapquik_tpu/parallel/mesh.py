"""Multi-device execution: device meshes, sharded mapping, sharded index build.

The reference's parallelism is a CPU worker-thread pool over reads plus a concurrent
index (src/closures.rs:183-205, SURVEY.md §2.10). The TPU-native equivalents:

  - data parallelism over reads: read batches sharded over the mesh's "dp" axis via
    shard_map; no cross-device traffic per read (a read fits on one chip), so the only
    collective is an optional psum of mapping statistics;
  - index-build parallelism over genome *windows* (works even for single-contig
    genomes, unlike the reference's per-contig threading): window batches sharded over
    "dp", extracted with the same seeding program, k-min-mer columns all_gathered;
  - the index is replicated per device (human-scale index ~40M entries * 24B ≈ 1GB
    fits HBM comfortably; hash-range sharding with all-to-all probe exchange is the
    planned alternative for larger references).

Multi-host: each host feeds its own read shard through `map_batch_sharded` on its
local mesh slice and writes its own PAF shard — mapping is embarrassingly parallel
across hosts once the index is replicated (jax.distributed handles process grouping).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.lookup import RefIndex
from ..ops.chaining import MapResult
from ..ops.pipeline import map_batch
from ..params import Params


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_reads(mesh: Mesh, codes: np.ndarray, lengths: np.ndarray):
    """Place a [B, L] read batch sharded over dp (B must divide by mesh size)."""
    s = NamedSharding(mesh, P("dp", None))
    s1 = NamedSharding(mesh, P("dp"))
    return jax.device_put(codes, s), jax.device_put(lengths, s1)


def replicate(mesh: Mesh, tree):
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


@functools.partial(jax.jit, static_argnames=("p", "cap", "mesh"))
def _map_batch_shmap(codes, lengths, index, ref_lens, p: Params, cap: int, mesh: Mesh):
    """shard_map over dp: each device maps its read shard against the replicated
    index; a psum'd mapped-read count exercises the collective path."""

    def per_device(codes_s, lengths_s, index_r, ref_lens_r):
        res = map_batch(codes_s, lengths_s, index_r, ref_lens_r, p, cap)
        n_mapped = jax.lax.psum(jnp.sum(res.mapped.astype(jnp.int32)), "dp")
        return res, n_mapped

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P(), P()),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )(codes, lengths, index, ref_lens)


def map_batch_sharded(
    mesh: Mesh,
    codes: np.ndarray,
    lengths: np.ndarray,
    index: RefIndex,
    ref_lens,
    p: Params,
    cap: int,
) -> Tuple[MapResult, jax.Array]:
    """Map a read batch data-parallel over the mesh. Returns (MapResult, n_mapped)."""
    B = codes.shape[0]
    n = mesh.devices.size
    if B % n:
        raise ValueError(f"batch size {B} not divisible by mesh size {n}")
    codes_d, lens_d = shard_reads(mesh, np.asarray(codes), np.asarray(lengths))
    index_r = replicate(mesh, index)
    ref_lens_r = replicate(mesh, jnp.asarray(ref_lens))
    return _map_batch_shmap(codes_d, lens_d, index_r, ref_lens_r, p, cap, mesh)


@functools.partial(jax.jit, static_argnames=("p", "cap", "mesh"))
def _extract_shmap(codes, lengths, p: Params, cap: int, mesh: Mesh):
    """Sharded window extraction + all_gather of per-window k-min-mer columns."""
    from ..ops.seeding import seed_batch

    def per_device(codes_s, lengths_s):
        sb = seed_batch(codes_s, lengths_s, p, cap)
        out = jax.tree.map(lambda x: jax.lax.all_gather(x, "dp", tiled=True), sb)
        return out

    return jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp")),
        out_specs=P(),
        check_vma=False,
    )(codes, lengths)


def extract_windows_sharded(
    mesh: Mesh, codes: np.ndarray, lengths: np.ndarray, p: Params, cap: int
):
    """Run the seeding program over a [W, L] window batch sharded across the mesh;
    returns the fully-gathered SeedBatch (identical on every device)."""
    W = codes.shape[0]
    n = mesh.devices.size
    if W % n:
        raise ValueError(f"window count {W} not divisible by mesh size {n}")
    codes_d, lens_d = shard_reads(mesh, np.asarray(codes), np.asarray(lengths))
    return _extract_shmap(codes_d, lens_d, p, cap, mesh)
