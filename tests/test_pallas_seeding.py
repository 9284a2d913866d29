"""Pallas fused ntHash kernel: interpret-mode differential tests vs the XLA
formulation (which is itself oracle-gated). On TPU the same kernels compile
natively and are exercised by every seed_batch call (pallas_available)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapquik_tpu.ops.pallas_seeding import nthash_sel_pallas
from mapquik_tpu.ops.seeding import nthash32_batch
from mapquik_tpu.params import Params


@pytest.mark.parametrize("l,density", [(17, 0.05), (31, 0.01), (16, 0.02)])
def test_kernel_matches_xla(l, density):
    rng = np.random.default_rng(l)
    B, L = 32, 2048
    p = Params(k=5, l=l, density=density)
    hc = rng.integers(0, 4, (B, L)).astype(np.uint8)
    hc[0, 100:130] = 4          # N run
    hc[1, L - 40 :] = 4         # trailing padding
    hc[2, 0:5] = 4              # leading invalid
    canon_ref, valid_ref = (np.asarray(x) for x in nthash32_batch(jnp.asarray(hc), l))
    sel = valid_ref & (canon_ref < p.hash_threshold)
    key_ref = np.where(sel, np.arange(L)[None, :], 0x7FFFFFFF).astype(np.int32)
    canon_k, key_k = (
        np.asarray(x)
        for x in nthash_sel_pallas(jnp.asarray(hc), l, p.hash_threshold, interpret=True)
    )
    np.testing.assert_array_equal(canon_k[valid_ref], canon_ref[valid_ref])
    np.testing.assert_array_equal(key_k, key_ref)


def test_block_boundary_carries():
    """Windows spanning the 512-lane block boundary must be exact (the carry +
    lookahead machinery)."""
    rng = np.random.default_rng(9)
    B, L, l = 32, 1536, 31
    p = Params(k=7, l=l, density=0.2)  # high density -> many selected keys
    hc = rng.integers(0, 4, (B, L)).astype(np.uint8)
    canon_ref, valid_ref = (np.asarray(x) for x in nthash32_batch(jnp.asarray(hc), l))
    sel = valid_ref & (canon_ref < p.hash_threshold)
    key_ref = np.where(sel, np.arange(L)[None, :], 0x7FFFFFFF).astype(np.int32)
    canon_k, key_k = (
        np.asarray(x)
        for x in nthash_sel_pallas(jnp.asarray(hc), l, p.hash_threshold, interpret=True)
    )
    # positions straddling block boundaries: 512-l..512+l etc.
    for b in (512, 1024):
        span = slice(b - l, min(b + l, L))
        np.testing.assert_array_equal(key_k[:, span], key_ref[:, span])
    np.testing.assert_array_equal(canon_k[valid_ref], canon_ref[valid_ref])
