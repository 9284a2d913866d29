"""Mapping parameters.

Mirrors the reference CLI contract (reference: src/main.rs:33-47,174-217): same knobs,
same defaults (k=5, l=31, density=0.01, c=4, s=11, g=2000, HPC on).

TPU-specific additions (batch shapes, caps, window sizes) live here too because every
jitted program is specialized on them; they are *capacity* knobs, not semantic ones —
provided the caps are large enough to never clip, output is independent of them.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Params:
    # --- semantic parameters (reference parity; src/main.rs:174-188) ---
    k: int = 5            # k-min-mer length (number of consecutive minimizers)
    l: int = 31           # minimizer (l-mer) length
    density: float = 0.01  # density threshold: l-mer is a minimizer iff hash < density * 2^32
    c: int = 4            # minimum chain length (num Matches) for MAPQ 60
    s: int = 11           # minimum chain score (num matching k-min-mers) for MAPQ 60
    g: int = 2000         # max |gap difference| for chain colinearity
    use_hpc: bool = True  # homopolymer-compress before hashing
    # `use_simd` in the reference selects an equivalent fast path; on TPU the Pallas
    # kernel path plays that role and is controlled by `backend` below.
    fix_check_bug: bool = False  # replicate reference Match::check precedence quirk
                                 # (src/match.rs:39-43) by default; True = "fixed" semantics

    # --- capacity / batching knobs (TPU-only; no semantic effect unless clipped) ---
    max_read_len: int = 1 << 16      # padded length ceiling; reads beyond it are
                                     # truncated WITH a warning. 64 kb covers real
                                     # HiFi tails (~50 kb); the reference has no cap
                                     # (src/mers.rs:41-54), so truncation is the
                                     # exception, not the default behavior.
    length_bins: tuple = (24576, 1 << 15)
                                     # padded-length bins below max_read_len: reads
                                     # route to the smallest fitting bin. 24 kb
                                     # covers the HiFi mean at the honest per-bin
                                     # seed cap for the SAME cost as the round-2
                                     # 32k/512 config (12.8 vs 12.7 ms/batch,
                                     # scripts/r3_probe4.py); <=32 kb bins are the
                                     # Pallas fast path; longer reads take the XLA
                                     # path at 64 kb instead of being truncated.
    max_minimizers: int = 1 << 11    # CEILING on per-sequence minimizer capacity;
                                     # per-bin caps derive from _seed_cap (the true
                                     # selection rate is ~2*density per HPC position
                                     # — see _seed_cap — so a 32 kb read needs ~896)
    batch_size: int = 256            # reads per device batch
    dispatch_group: int = 4          # sub-batches unrolled per compiled program:
                                     # amortizes the ~3-6 ms per-program dispatch
                                     # floor of the remote relay (no semantic
                                     # effect; 27.6 -> 11.2 ms/batch measured at
                                     # G=1 -> 4, scripts/r3_dispatch_probe.py)
    # Reference windows default to (core + halo) == max_read_len and the same
    # minimizer cap as reads, so index build and read mapping share ONE compiled
    # seeding program (compiles go through a slow relay on this TPU environment;
    # one shape, one compile).
    ref_window: int = (1 << 15) - 8192  # reference extraction window (bases, core)
    ref_halo: int = 8192             # right halo so window-spanning k-min-mers are seen;
                                     # must exceed the k-min-mer span ((k-1)/density + l
                                     # HPC chars, inflated to base space) — validated in
                                     # __post_init__, derived in Params.auto, and
                                     # runtime-checked (SeedBatch.tail_start drop
                                     # detection in index/build.py retries with 2x halo)
    ref_window_minimizers: int = 1 << 10  # minimizer cap per reference window
                                     # (full 32 kb windows select ~485 mean at
                                     # d=0.01 — 512 sat at +1.3 sigma and fired
                                     # the doubled-cap retry/recompile on real
                                     # builds; 1024 is +25 sigma)
    chain_scan: bool = True          # gather-free chaining (ops/chaining v2):
                                     # segment scans broadcast bucket summaries
                                     # instead of 5 per-row gathers; bit-identical
                                     # output (differential-tested). ADOPTED on
                                     # the in-situ v5e A/B: 9.33 -> 6.37 ms/batch
                                     # (-32%, experiments/toggles_ab_v5e.txt).
                                     # False = the round-2 gather formulation
                                     # (kept as the differential foil).
    # seed_merge_scan / match_compact_scan were REJECTED on the same A/B
    # (-0.07 ms / +0.07 ms = noise) and deleted; see DESIGN.md's rejected list.

    def __post_init__(self):
        if self.k < 2:
            raise ValueError("k must be >= 2")
        if self.l < 4 or self.l > 32:
            raise ValueError("l must be in [4, 32] (rolling 32-bit ntHash)")
        if not (0.0 < self.density <= 1.0):
            raise ValueError("density must be in (0, 1]")
        if self.max_minimizers < self.k:
            raise ValueError("max_minimizers must be >= k")
        if self.max_read_len % 8:
            raise ValueError("max_read_len must be a multiple of 8 (2-bit packing)")
        # bins >= the ceiling are redundant (the ceiling IS the last bin):
        # drop them so a small explicit max_read_len composes with the default
        # 32 kb fast-path bin
        if any(b >= self.max_read_len for b in self.length_bins):
            object.__setattr__(
                self,
                "length_bins",
                tuple(b for b in self.length_bins if b < self.max_read_len),
            )
        for b in self.length_bins:
            if b > 512 and b % 512:
                raise ValueError("length bins must be multiples of 512 (scan blocking)")
            if b % 8:
                raise ValueError("length bins must be multiples of 8 (2-bit packing)")
        if self.ref_halo < self.min_ref_halo:
            raise ValueError(
                f"ref_halo={self.ref_halo} is below the mean k-min-mer span "
                f"{self.min_ref_halo} at k={self.k} density={self.density:g}: "
                "window-spanning k-min-mers would be dropped from the index. "
                "Use Params.auto (derives ref_halo) or raise ref_halo."
            )

    @property
    def min_ref_halo(self) -> int:
        """Mean base-space k-min-mer span: (k-1)/density inter-minimizer gaps + l,
        in HPC chars (base-space spans are >= HPC spans). A halo below this drops
        roughly half of all window-boundary k-min-mers — reject outright."""
        return int((self.k - 1) / self.density) + self.l

    @property
    def safe_ref_halo(self) -> int:
        """Halo sized so a window-spanning k-min-mer drop is vanishingly rare:
        4x the mean HPC-space span (the (k-1)-fold geometric gap sum has
        P[span > 4*mean] < ~1e-9 at default k) times 2 for HPC->base inflation
        (expected run length on DNA is ~4/3; 2x covers skewed composition).
        Residual risk is runtime-checked: index/build.py detects any actual drop
        via SeedBatch.tail_start and retries the contig with a doubled halo."""
        import math

        hpc_span = 4.0 * (self.k - 1) / self.density + self.l
        return max(8192, 1 << math.ceil(math.log2(2.0 * hpc_span)))

    @property
    def min_seq_len(self) -> int:
        """Minimum base-space sequence length to yield any k-min-mer.

        Reference guard (src/mers.rs:18,44): sequences shorter than l + k - 1 produce
        nothing.
        """
        return self.l + self.k - 1

    @classmethod
    def auto(cls, **kw) -> "Params":
        """Params with capacity knobs derived from the semantic knobs.

        The reference has no caps (SURVEY.md §7 hard part (b)); here the per-sequence
        minimizer caps are sized so the Binomial(L, density) seed count exceeds them
        with negligible probability (mean + 6σ + headroom, rounded up to a power of
        two). Runtime overflow detection (SeedBatch.overflow) catches the residue."""
        semantic = {
            k_: v for k_, v in kw.items()
            if k_ in ("k", "l", "density", "use_hpc", "max_read_len")
        }
        probe = cls(**{**semantic, "ref_halo": 1 << 30, "ref_window": 1 << 30})
        if "ref_halo" not in kw:
            kw["ref_halo"] = probe.safe_ref_halo
        if "ref_window" not in kw:
            # keep (core + halo) == the FAST length bin (<= 32 kb Pallas path)
            # so index build and read mapping share one compiled seeding
            # program; at very low density the halo outgrows that and the
            # window must widen with it
            fast_bin = min(probe.max_read_len, 1 << 15)
            kw["ref_window"] = max(fast_bin - kw["ref_halo"], kw["ref_halo"])
        probe2 = cls(**kw)
        if "max_minimizers" not in kw:
            kw["max_minimizers"] = _seed_cap(probe2.max_read_len, probe2.density, probe2.k)
        if "ref_window_minimizers" not in kw:
            kw["ref_window_minimizers"] = _seed_cap(
                probe2.ref_window + probe2.ref_halo, probe2.density, probe2.k
            )
        return cls(**kw)

    @property
    def hash_threshold(self) -> int:
        """uint32 threshold for the density predicate."""
        t = int(self.density * 4294967296.0)
        return min(t, 0xFFFFFFFF)


def _seed_cap(length: int, density: float, k: int) -> int:
    """Minimizer capacity covering mean + 6σ of the selected count, rounded up
    to a multiple of 128 (the TPU lane tile).

    The selection RATE per HPC position is ~2*density, not density: the
    predicate tests the CANONICAL hash (min of the forward and reverse-strand
    hashes), and P(min of two u32 hashes < t) ~ 2t/2^32 (measured 0.0148 per
    raw base at d=0.01 incl. the ~0.75 HPC fraction). Round 2 sized caps at
    d*L, so FULL-length reads overflowed ~10% of the time and silently took
    the slow retry path. No HPC discount here: worst-case composition
    compresses nothing, and use_hpc=False is a supported config.

    Power-of-two rounding produced a 2x throughput CLIFF in density sweeps
    (VERDICT r2 Weak #5); 128-steps keep map time within ~1.15x of the
    no-slack cost at any density."""
    import math

    m = min(2.0 * density, 1.0) * length
    need = m + 6.0 * math.sqrt(max(m, 1.0)) + 16 + k
    return max(128, 128 * math.ceil(need / 128.0))


def default_output_prefix(p: Params) -> str:
    """Reference default output prefix format (src/main.rs:216)."""
    d = f"{p.density:g}"
    return f"mapquik-k{p.k}-d{d}-l{p.l}"
