"""Pallas TPU kernels: fused canonical ntHash + density predicate.

Reference analog: the AVX-512/AVX2 fast path of the rust-seq2kminmers crate's
minimizer scan (SURVEY.md §2.2; selected by `HashMode::Simd`, src/mers.rs:22-26) —
the hand-vectorized hot loop of the reference, rebuilt as Mosaic kernels.

Why kernels here: the XLA formulation of the rolling-hash scan materializes its
pad/slice/select steps to HBM — 6.5 GB of instruction outputs per 256-read batch
measured from the compiled HLO — and its cost in the full seeding program is far
above its isolated cost (fusion interactions with the surrounding sorts). These
kernels keep the per-block pipeline (seed lookup, per-position rotation,
prefix-XOR scan, window difference, rotation to position phase) in VMEM and
stream each [32, 512] block once.

Two kernels (one per strand) rather than one: Mosaic crashes (SIGABRT in the
compile helper, no diagnostic) when a single kernel contains two xor shift-scans,
and when an int32 value derived from the lookahead-width iota flows into an
output store — both bugs found by bisection on v5e; the strand-split + fresh
block-width iota shapes compile. The light combine (min, validity, density
predicate) runs in XLA.

Exactness: bit-identical to ops/seeding.nthash32_batch for all valid positions
(differential-tested in interpret mode on CPU and compiled on TPU).

  grid = (B/32, L/512); the L dimension iterates fastest, carrying the running
  prefix-XOR (and invalid-count) in VMEM scratch. Each step reads its 512-lane
  block plus a 128-lane lookahead (the l-mer window ends up to l-1 < 128 lanes
  into the next block) as a second BlockSpec view of the same padded input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..oracle.pyref import SEED32, SEED32C, INVALID

_SUB = 32     # sublane rows per block (u8 tiles need >= 32 sublanes)
_BLK = 512    # lanes per block
_LOOK = 128   # lookahead lanes (>= l - 1 for any l <= 32)
_BIG = np.int32(0x7FFFFFFF)
_W = _BLK + _LOOK


def _lane(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _rol32(x, r):
    x = x.astype(jnp.uint32)
    r = (r % 32).astype(jnp.uint32)
    return (x << r) | (x >> ((np.uint32(32) - r) % np.uint32(32)))


def _xor_scan(a, lane):
    s = 1
    while s < _W:
        a = a ^ jnp.where(lane >= s, pltpu.roll(a, s, axis=1), jnp.zeros_like(a))
        s *= 2
    return a


def _window(x, lane, carry_col, l):
    """window xor over [t, t+l): prefix[t+l-1] ^ prefix[t-1] (carry at t=0)."""
    hi = pltpu.roll(x, _W - (l - 1), axis=1)
    lo = jnp.where(lane >= 1, pltpu.roll(x, 1, axis=1), carry_col)
    return hi, lo


def _seed_select(c32, table):
    s = jnp.zeros(c32.shape, jnp.uint32)
    for v in range(5):
        s = jnp.where(c32 == v, jnp.uint32(int(table[v])), s)
    return s


def _kernel_fwd(l: int, codes_ref, look_ref, wa_ref, nbad_ref, ca, cd):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ca[:, :] = jnp.zeros((_SUB, 128), jnp.uint32)
        cd[:, :] = jnp.zeros((_SUB, 128), jnp.int32)

    codes = jnp.concatenate([codes_ref[:, :], look_ref[:, :]], axis=1)
    lane = _lane((_SUB, _W))
    gpos = lane + j * _BLK
    c32 = codes.astype(jnp.int32)
    a = _rol32(_seed_select(c32, SEED32), (l - 1 - gpos) % 32)
    pa = _xor_scan(a, lane) ^ ca[:, :1]
    hi, lo = _window(pa, lane, ca[:, :1], l)
    wa = _rol32(hi ^ lo, gpos % 32)
    bad = (c32 == INVALID).astype(jnp.int32)
    s = 1
    x = bad
    while s < _W:
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, axis=1), jnp.zeros_like(x))
        s *= 2
    cb_ = x + cd[:, :1]
    hib, lob = _window(cb_, lane, cd[:, :1], l)
    wa_ref[:, :] = wa[:, :_BLK]
    nbad_ref[:, :] = (hib - lob)[:, :_BLK]
    ca[:, :] = jnp.broadcast_to(pa[:, _BLK - 1 : _BLK], (_SUB, 128))
    cd[:, :] = jnp.broadcast_to(cb_[:, _BLK - 1 : _BLK], (_SUB, 128))


def _kernel_rev(l: int, codes_ref, look_ref, wb_ref, cb):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        cb[:, :] = jnp.zeros((_SUB, 128), jnp.uint32)

    codes = jnp.concatenate([codes_ref[:, :], look_ref[:, :]], axis=1)
    lane = _lane((_SUB, _W))
    gpos = lane + j * _BLK
    c32 = codes.astype(jnp.int32)
    b = _rol32(_seed_select(c32, SEED32C), gpos % 32)
    pb = _xor_scan(b, lane) ^ cb[:, :1]
    hi, lo = _window(pb, lane, cb[:, :1], l)
    wb_ref[:, :] = _rol32(hi ^ lo, (-gpos) % 32)[:, :_BLK]
    cb[:, :] = jnp.broadcast_to(pb[:, _BLK - 1 : _BLK], (_SUB, 128))


def _specs():
    ispec = [
        pl.BlockSpec((_SUB, _BLK), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((_SUB, _LOOK), lambda i, j: (i, (j * _BLK + _BLK) // _LOOK),
                     memory_space=pltpu.VMEM),
    ]
    ospec = pl.BlockSpec((_SUB, _BLK), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    return ispec, ospec


@functools.partial(jax.jit, static_argnames=("l", "threshold", "interpret"))
def nthash_sel_pallas(hcodes: jax.Array, l: int, threshold: int, interpret: bool = False):
    """canon u32 [B, L], selkey i32 [B, L] (pos if selected valid minimizer, else
    0x7FFFFFFF — exactly the key `_compact_positions` sorts).

    hcodes: uint8 [B, L] HPC-compacted codes (INVALID marks padding/non-ACGT);
    B % 32 == 0, L % 512 == 0, 4 <= l <= 32."""
    B, L = hcodes.shape
    assert B % _SUB == 0 and L % _BLK == 0 and 4 <= l <= 32
    padded = jnp.concatenate(
        [hcodes, jnp.full((B, _LOOK), np.uint8(INVALID), jnp.uint8)], axis=1
    )
    grid = (B // _SUB, L // _BLK)
    ispec, ospec = _specs()
    wa, nbad = pl.pallas_call(
        functools.partial(_kernel_fwd, l),
        grid=grid, in_specs=ispec, out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((_SUB, 128), jnp.uint32),
                        pltpu.VMEM((_SUB, 128), jnp.int32)],
        interpret=interpret,
    )(padded, padded)
    wb = pl.pallas_call(
        functools.partial(_kernel_rev, l),
        grid=grid, in_specs=ispec, out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((_SUB, 128), jnp.uint32)],
        interpret=interpret,
    )(padded, padded)
    canon = jnp.minimum(wa, wb)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    valid = (nbad == 0) & (pos <= (L - l))
    sel = valid & (canon < np.uint32(threshold))
    return canon, jnp.where(sel, pos, _BIG)


def pallas_available(B: int, L: int, l: int) -> bool:
    """Shapes this kernel supports, on a TPU backend."""
    try:
        import jax as _jax

        if _jax.default_backend() not in ("tpu",):
            return False
    except Exception:
        return False
    return B % _SUB == 0 and L % _BLK == 0 and 4 <= l <= 32
