"""Reference index construction: windowed device extraction + global sort/dedup.

The reference indexes per *contig* on CPU worker threads (src/closures.rs:83-90 —
a single-contig genome indexes serially, a real bottleneck noted in SURVEY.md §5).
Here every contig is split into fixed windows that extract in device batches, so index
build parallelizes within a contig regardless of contig count:

  - Window cores are disjoint; each window scans its core plus a right halo so
    k-min-mers spanning the boundary are seen by their owning window.
  - Core boundaries are snapped forward to homopolymer-run starts so window-local HPC
    equals whole-contig HPC (no run is split across a core boundary).
  - A k-min-mer is owned by the window containing its first minimizer's start; owned
    k-min-mers are a prefix of the window's output (starts are nondecreasing), and
    global offsets are window-prefix sums — identical numbering to whole-contig
    extraction (offset = ordinal in the contig's k-min-mer list, src/index.rs:47).

A k-min-mer whose minimizer span would exceed the halo (sub-astronomical probability
at Params.auto-derived halos) is DETECTED at runtime — every window reports the start
of its first unemitted k-min-mer (SeedBatch.tail_start); if that start is owned by a
halo-truncated window, the contig is re-extracted with a doubled halo, so no
window-spanning k-min-mer is ever silently dropped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from ..oracle.pyref import encode
from ..io import native as _native_enc
from ..ops import seeding
from ..ops.seeding import seed_batch
from ..params import Params
from .lookup import RefIndex, from_host_arrays


@dataclass
class RefMeta:
    names: List[str]
    lengths: np.ndarray  # int64 [n_refs]


def _snap_to_run_start(codes: np.ndarray, pos: int) -> int:
    """Advance pos to the next index where a new homopolymer run begins."""
    n = codes.shape[0]
    while 0 < pos < n and codes[pos] == codes[pos - 1]:
        pos += 1
    return pos


def plan_windows(codes: np.ndarray, p: Params) -> List[Tuple[int, int, int]]:
    """[(core_start, core_end, slice_end)] covering the contig; cores disjoint,
    snapped to run starts; slice extends core by the halo (clamped)."""
    n = codes.shape[0]
    if n < p.min_seq_len:
        return []
    out = []
    core_start = 0
    while core_start < n:
        core_end = core_start + p.ref_window
        if core_end < n:
            core_end = _snap_to_run_start(codes, core_end)
        core_end = min(core_end, n)
        # cap the slice at exactly ref_window + halo: run-start snapping would
        # otherwise push a few windows past the power-of-two padded length,
        # doubling L for the whole build (and disabling the Pallas seeding
        # path). The few snapped bases come out of the halo margin; actual
        # halo-drop remains runtime-checked via SeedBatch.tail_start. A
        # pathological giant homopolymer (snap > halo/2) keeps the full halo
        # and lets L grow instead — correctness before shape reuse.
        cap_end = core_start + p.ref_window + p.ref_halo
        if core_end + p.ref_halo // 2 <= cap_end:
            slice_end = min(core_end + p.ref_halo, n, cap_end)
        else:
            slice_end = min(core_end + p.ref_halo, n)
        out.append((core_start, core_end, slice_end))
        core_start = core_end
    return out


class _HaloDrop(Exception):
    """A halo-truncated window dropped an owned k-min-mer (span > ref_halo)."""


def extract_contig_kminmers(
    codes: np.ndarray, p: Params, batch_windows: int = 256, verbose=None
) -> Tuple[np.ndarray, ...]:
    """All k-min-mers of one contig as host arrays (h1, h2, start, end, offset, rev),
    ordered and numbered exactly as whole-contig extraction. Retries with a doubled
    halo if drop detection fires (exactness beats the rare recompile)."""
    import dataclasses

    while True:
        try:
            return _extract_contig_once(codes, p, batch_windows, verbose)
        except _HaloDrop:
            newp = dataclasses.replace(
                p,
                ref_halo=p.ref_halo * 2,
                ref_window=max(p.ref_window, p.ref_halo * 2),
            )
            if verbose:
                verbose(
                    f"halo drop detected: retrying contig with ref_halo="
                    f"{newp.ref_halo}"
                )
            p = newp


def _extract_contig_once(
    codes: np.ndarray, p: Params, batch_windows: int = 256, verbose=None
) -> Tuple[np.ndarray, ...]:
    import jax.numpy as jnp

    wins = plan_windows(codes, p)
    if verbose:
        verbose(f"extracting contig ({codes.shape[0]} bp, {len(wins)} windows)")
    if not wins:
        z32 = np.zeros(0, dtype=np.uint32)
        zi = np.zeros(0, dtype=np.int64)
        return z32, z32, zi, zi, zi, np.zeros(0, dtype=bool)
    # pad L to a power of two and B to batch_windows to bound jit specializations;
    # with default params L == p.max_read_len, so this is the same program shape
    # as read mapping (one compile serves both)
    L = 1 << int(np.ceil(np.log2(max(64, max(se - cs for cs, _, se in wins)))))
    # share the compiled seeding program with the 32 kb FAST read bin (not
    # max_read_len: the 64 kb long-read ceiling would double window width and
    # leave the Pallas gate, which caps at 2^15 lanes)
    L = max(L, min(p.max_read_len, 1 << 15))
    # small genomes (tests, bacteria) round B down to the window count's power of
    # two instead of padding to 256 rows of dead work
    batch_windows = min(batch_windows, 1 << int(np.ceil(np.log2(len(wins)))))
    cap = p.ref_window_minimizers
    parts = []
    prog = [None]  # AOT-cached extraction program (first batch resolves it)

    def make_batch(i):
        chunk = wins[i : i + batch_windows]
        arr = np.full((batch_windows, L), 4, dtype=np.uint8)
        lens = np.zeros(batch_windows, dtype=np.int32)
        for bi, (cs, _, se) in enumerate(chunk):
            arr[bi, : se - cs] = codes[cs:se]
            lens[bi] = se - cs
        packed = jnp.asarray(seeding.pack4_host(arr))
        lens_d = jnp.asarray(lens)
        if prog[0] is None:
            from ..utils.aot import cached_program

            prog[0] = cached_program(
                f"seed_extract_c{cap}_L{L}",
                seeding._seed_flat_program_fn(p, cap, L),
                (packed, lens_d), statics_key=(repr(p), cap, L),
            )
        flat_d = prog[0](packed, lens_d)
        return chunk, packed, lens_d, flat_d

    n_contig = codes.shape[0]

    def consume(item):
        chunk, packed, lens_d, flat_d = item
        bcap = cap
        attempt = 0
        while True:
            flat = np.asarray(flat_d)
            h1, h2, st, en, rv, n, ovf, tail = seeding.unflatten_seed_batch(flat, bcap)
            if not ovf.any():
                break
            # cap clipped a window (possible when density far exceeds the params'
            # sizing assumptions) — retry this batch with a doubled cap; exactness
            # beats the recompile cost of a rare event. From the second retry on,
            # also force the uncompacted seeding path: the overflow may be the
            # Pallas per-block compaction cap, which no seed cap can fix.
            bcap *= 2
            attempt += 1
            flat_d = seeding.seed_batch_packed_flat(
                packed, lens_d, p, bcap, L, attempt < 2
            )
        for bi, (cs, ce, se) in enumerate(chunk):
            # a window truncated by the halo (not by contig end) whose first
            # UNemitted k-min-mer starts before core_end dropped an owned seed
            if se < n_contig and tail[bi] < ce - cs:
                raise _HaloDrop()
        for bi, (cs, ce, _) in enumerate(chunk):
            nk = int(n[bi])
            # owned = prefix with absolute start < core_end
            st_abs = st[bi, :nk].astype(np.int64) + cs
            n_owned = int(np.searchsorted(st_abs, ce, side="left"))
            parts.append(
                (
                    h1[bi, :n_owned],
                    h2[bi, :n_owned],
                    st_abs[:n_owned],
                    en[bi, :n_owned].astype(np.int64) + cs,
                    rv[bi, :n_owned],
                )
            )

    # sliding pipeline: keep a few batches in flight so device compute and the
    # (latency-bound) transfers overlap instead of serializing per batch
    DEPTH = 4
    inflight = []
    for i in range(0, len(wins), batch_windows):
        inflight.append(make_batch(i))
        if len(inflight) >= DEPTH:
            consume(inflight.pop(0))
    while inflight:
        consume(inflight.pop(0))
    h1 = np.concatenate([x[0] for x in parts])
    h2 = np.concatenate([x[1] for x in parts])
    st = np.concatenate([x[2] for x in parts])
    en = np.concatenate([x[3] for x in parts])
    rv = np.concatenate([x[4] for x in parts])
    off = np.arange(h1.shape[0], dtype=np.int64)
    return h1, h2, st, en, off, rv


def build_index(
    contigs: Sequence[Tuple[str, bytes]],
    p: Params,
    batch_windows: int = 256,
    backend: str = "hash",
    verbose=None,
    device: bool = None,
) -> Tuple[object, RefMeta]:
    """Full reference index from (name, seq) contigs. Returns (index, metadata).

    backend: "hash" (bucketed two-choice table; constant-depth probe, default) or
    "sorted" (sorted pair-key array; binary-search probe).

    device: build fully device-resident (index/device_build.py — the fast path:
    d2h here is ~25 MB/s, so the host path's per-window pulls dominate).
    Default (None) = auto: device path on a TPU backend for the hash backend;
    falls back to this host path when the device builder flags
    overflow/halo-drop (its exactness guards)."""
    from .hashtable import build_hash_index
    from .lookup import dedup_host

    if backend == "hash" and device is not False:
        import jax

        if device or jax.default_backend() == "tpu":
            from .device_build import build_index_device

            got = build_index_device(contigs, p, batch_windows, verbose)
            if got is not None:
                return got
            if verbose:
                verbose("device build declined; using host build path")

    names: List[str] = []
    lengths: List[int] = []
    cols = {k: [] for k in ("h1", "h2", "rid", "start", "end", "off", "rc")}
    for rid, (name, seq) in enumerate(contigs):
        names.append(name)
        codes = (seq if isinstance(seq, np.ndarray) else
                 _native_enc.encode_any(seq))
        lengths.append(codes.shape[0])
        h1, h2, st, en, off, rv = extract_contig_kminmers(codes, p, batch_windows, verbose)
        cols["h1"].append(h1)
        cols["h2"].append(h2)
        cols["rid"].append(np.full(h1.shape[0], rid, dtype=np.int64))
        cols["start"].append(st)
        cols["end"].append(en)
        cols["off"].append(off)
        cols["rc"].append(rv)
    cat = {k: np.concatenate(v) if v else np.zeros(0) for k, v in cols.items()}
    args = (
        cat["h1"].astype(np.uint32),
        cat["h2"].astype(np.uint32),
        cat["rid"].astype(np.int64),
        cat["start"].astype(np.int64),
        cat["end"].astype(np.int64),
        cat["off"].astype(np.int64),
        cat["rc"].astype(bool),
    )
    meta = RefMeta(names=names, lengths=np.asarray(lengths, dtype=np.int64))
    if backend == "hash":
        h1, h2, rid_, st, en, off, rc_ = dedup_host(*args)
        return (
            build_hash_index(
                h1, h2,
                rid_.astype(np.int32), st.astype(np.int32), en.astype(np.int32),
                off.astype(np.int32), rc_,
            ),
            meta,
        )
    return from_host_arrays(*args), meta
