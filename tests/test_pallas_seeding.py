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


class TestSeedSelectCompact:
    """Kernel-side compaction path (seed_select_compact + _minimizers_compact_pallas)
    vs the pure-XLA path, interpret mode. On TPU the same kernels compile natively
    and are the default seed_batch path (compact_available)."""

    @pytest.fixture(autouse=True)
    def force_interpret(self):
        from mapquik_tpu.ops import pallas_seeding

        pallas_seeding._INTERPRET = True
        yield
        pallas_seeding._INTERPRET = False
        jax.clear_caches()

    def _compare(self, p, codes, lens, cap):
        from mapquik_tpu.ops.seeding import seed_batch

        codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)
        sb_k = seed_batch(codes_d, lens_d, p, cap, use_pallas=True)
        sb_x = seed_batch(codes_d, lens_d, p, cap, use_pallas=False)
        n_k, n_x = np.asarray(sb_k.n), np.asarray(sb_x.n)
        np.testing.assert_array_equal(n_k, n_x)
        np.testing.assert_array_equal(
            np.asarray(sb_k.overflow), np.asarray(sb_x.overflow)
        )
        np.testing.assert_array_equal(
            np.asarray(sb_k.tail_start), np.asarray(sb_x.tail_start)
        )
        for field in ("h1", "h2", "start", "end", "rev"):
            a = np.asarray(getattr(sb_k, field))
            b = np.asarray(getattr(sb_x, field))
            for i in range(a.shape[0]):
                np.testing.assert_array_equal(
                    a[i, : n_x[i]], b[i, : n_x[i]], err_msg=f"{field} row {i}"
                )

    @pytest.mark.parametrize(
        "l,density,use_hpc,k",
        [(17, 0.05, True, 5), (31, 0.01, True, 7), (16, 0.02, False, 8),
         (13, 0.08, True, 4)],
    )
    def test_matches_xla_path(self, l, density, use_hpc, k):
        rng = np.random.default_rng(l * 7 + k)
        B, L = 32, 2048
        p = Params(k=k, l=l, density=density, use_hpc=use_hpc,
                   max_read_len=L, max_minimizers=512)
        codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
        codes[0, 100:130] = 4                      # N run
        codes[1, 700:720] = codes[1, 700]          # homopolymer run
        lens = np.full(B, L, np.int32)
        lens[2] = 900                              # short row
        lens[3] = l + k - 2                        # below min_seq_len
        lens[4] = 0
        self._compare(p, codes, lens, cap=512)

    def test_block_overflow_marker_forces_overflow(self):
        """> block_cap selected minimizers in one _CBLK-lane block
        (satellite-like) must flag overflow so callers retry on the
        uncompacted path."""
        from mapquik_tpu.ops.seeding import seed_batch

        from mapquik_tpu.ops import pallas_seeding

        B, L = 32, pallas_seeding._CBLK
        p = Params(k=4, l=4, density=0.5, use_hpc=False, max_read_len=L,
                   max_minimizers=L, ref_window_minimizers=L)
        rng = np.random.default_rng(0)
        codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
        lens = np.full(B, L, np.int32)
        sb_k = seed_batch(jnp.asarray(codes), jnp.asarray(lens), p, L,
                          use_pallas=True)
        sb_x = seed_batch(jnp.asarray(codes), jnp.asarray(lens), p, L,
                          use_pallas=False)
        # the XLA path has capacity for every seed (cap == L) -> no overflow;
        # the kernel path's per-block cap must detect and report
        assert not np.asarray(sb_x.overflow).any()
        assert np.asarray(sb_k.overflow).all()


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
