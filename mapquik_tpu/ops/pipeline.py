"""End-to-end jitted mapping: [B, L] read batch -> per-read mapping records.

One XLA program per (B, L, params) specialization fusing the reference's hot loops
A-D (SURVEY.md §3.2): seeding scan, index probe, match segmentation, chaining,
best-hit selection and coordinate projection. The host only pads batches in and
formats PAF text out (src/mers.rs:181 line layout).
"""

from __future__ import annotations

import functools
import os
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.build import RefMeta, build_index
from ..index.hashtable import HashIndex, probe_hash
from ..index.lookup import RefIndex, probe
from ..oracle.pyref import _ENCODE_LUT, encode
from ..params import Params

_TRANS = bytes(_ENCODE_LUT)


def encode_fast(seq) -> np.ndarray:
    """encode() via bytes.translate (C speed): the numpy-LUT oracle encode
    costs ~0.16 ms per 24 kb read on this single-core host — a measurable
    fraction of end-to-end throughput. Bit-identical to oracle encode."""
    if isinstance(seq, np.ndarray):
        return seq
    if isinstance(seq, str):
        seq = seq.encode()
    return np.frombuffer(bytes(seq).translate(_TRANS), dtype=np.uint8)
from .chaining import MapResult, chain_and_select, project_coords
from .matching import find_matches
from .seeding import seed_batch


class _E2EProf:
    """Per-phase wall-time accumulators for Mapper.map_reads, enabled via
    MAPQUIK_E2E_PROF=1 (report printed to stderr when the read stream ends).
    Worker-thread phases (upload/dispatch/pull) and main-thread phases
    (encode/pack/format) are disjoint threads, so their sums can legitimately
    exceed the wall clock; `wall` minus main-thread work is the overlap win."""

    def __init__(self):
        import collections

        self.t = collections.defaultdict(float)
        self.n = collections.defaultdict(int)
        self.each = collections.defaultdict(list)
        self.waves: List[int] = []

    def add(self, key: str, dt: float):
        self.t[key] += dt
        self.n[key] += 1
        if os.environ.get("MAPQUIK_E2E_PROF") == "2":
            self.each[key].append(round(dt * 1e3, 1))

    def report(self, wall: float, n_reads: int):
        import sys

        lines = [f"[e2e-prof] wall {wall:.3f}s  reads {n_reads}  "
                 f"({n_reads / max(wall, 1e-9):.0f} reads/s)"]
        for k in sorted(self.t):
            lines.append(
                f"[e2e-prof]   {k:<14} {self.t[k]:7.3f}s  x{self.n[k]:<5}"
                f" ({self.t[k] / max(wall, 1e-9) * 100:4.1f}% of wall)"
            )
        if self.waves:
            lines.append(f"[e2e-prof]   wave sizes     {self.waves}")
        for k in sorted(self.each):
            lines.append(f"[e2e-prof]   {k} ms each: {self.each[k]}")
        print("\n".join(lines), file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("p", "cap", "use_pallas"))
def map_batch(
    codes: jax.Array,     # uint8 [B, L]
    lengths: jax.Array,   # int32 [B]
    index: RefIndex,
    ref_lens: jax.Array,  # int32/int64 [n_refs]
    p: Params,
    cap: int,
    use_pallas: bool = True,
) -> MapResult:
    sb = seed_batch(codes, lengths, p, cap, use_pallas)
    if isinstance(index, HashIndex):
        pr = probe_hash(index, sb.h1, sb.h2)
    else:
        pr = probe(index, sb.h1, sb.h2)
    mb = find_matches(sb, pr, p)
    sel = chain_and_select(mb, p)
    return project_coords(sel, lengths, ref_lens)._replace(overflow=sb.overflow)


def _flatten_map_result(res: MapResult) -> jax.Array:
    """ONE flat int32 [B, 10] result (single d2h pull). Columns: mapped, rc,
    q_start, q_end, rid, r_start, r_end, score, mapq, overflow."""
    return jnp.stack(
        [
            res.mapped.astype(jnp.int32), res.rc.astype(jnp.int32),
            res.q_start, res.q_end, res.rid, res.r_start, res.r_end,
            res.score, res.mapq, res.overflow.astype(jnp.int32),
        ],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("p", "cap", "L", "use_pallas"))
def map_batch_packed(
    packed: jax.Array,    # uint8 [B, L//2] (4-bit packed codes, pack4_host)
    lengths: jax.Array,   # int32 [B]
    index,
    ref_lens: jax.Array,
    p: Params,
    cap: int,
    L: int,
    use_pallas: bool = True,
) -> jax.Array:
    """map_batch over 4-bit-packed codes with a flat [B, 10] result."""
    from .seeding import unpack4

    res = map_batch(unpack4(packed, L), lengths, index, ref_lens, p, cap, use_pallas)
    return _flatten_map_result(res)


@functools.partial(jax.jit, static_argnames=("p", "cap", "use_pallas"))
def map_batch_flat(
    codes: jax.Array,     # uint8 [B, L]
    lengths: jax.Array,
    index,
    ref_lens: jax.Array,
    p: Params,
    cap: int,
    use_pallas: bool = True,
) -> jax.Array:
    """map_batch over raw codes with a flat [B, 10] result."""
    res = map_batch(codes, lengths, index, ref_lens, p, cap, use_pallas)
    return _flatten_map_result(res)


@functools.partial(jax.jit, static_argnames=("p", "cap", "L", "use_pallas"))
def map_batch_packed2(
    p2: jax.Array,        # uint8 [B, L//4] 2-bit packed codes
    mask: jax.Array,      # uint8 [B, L//8] non-ACGT bitmask
    lengths: jax.Array,
    index,
    ref_lens: jax.Array,
    p: Params,
    cap: int,
    L: int,
    use_pallas: bool = True,
) -> jax.Array:
    """The streaming driver's entry: 2-bit + bitmask upload (<=2.25 bits/base —
    the h2d tunnel bounds streamed throughput; the mask upload is skipped for
    N-free batches, see pack2_host) with a flat [B, 10] result."""
    from .seeding import unpack2

    res = map_batch(
        unpack2(p2, mask, L, lengths), lengths, index, ref_lens, p, cap,
        use_pallas,
    )
    return _flatten_map_result(res)


@functools.partial(jax.jit, static_argnames=("p", "cap", "L", "G", "use_pallas"))
def map_batch_packed2_multi(
    p2: jax.Array,        # uint8 [G, B, L//4]
    mask: jax.Array,      # uint8 [G, B, L//8]
    lengths: jax.Array,   # int32 [G, B]
    index,
    ref_lens: jax.Array,
    p: Params,
    cap: int,
    L: int,
    G: int,
    use_pallas: bool = True,
) -> jax.Array:
    """G independent 256-read batches UNROLLED into one compiled program,
    flat [G, B, 10] result. Dispatching one program per batch through this
    environment's remote relay costs ~3-6 ms of fixed overhead per program
    (measured: 27.6 -> 11.2 ms/batch going G=1 -> G=4 in one session,
    scripts/r3_dispatch_probe.py); unrolling keeps every inner shape at the
    [256, *] sweet spot (a flat B=512 batch is superlinear-worse in the row
    sorts) while paying the dispatch floor once per G batches. The reference's
    analog is its zero-overhead per-thread inner loop (src/closures.rs:183-187).
    """
    from .seeding import unpack2

    outs = []
    for g in range(G):
        res = map_batch(
            unpack2(p2[g], mask[g], L, lengths[g]), lengths[g], index,
            ref_lens, p, cap, use_pallas,
        )
        outs.append(_flatten_map_result(res))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("p", "cap", "G", "use_pallas"))
def map_batch_flat_multi(
    codes: jax.Array,     # uint8 [G, B, L]
    lengths: jax.Array,   # int32 [G, B]
    index,
    ref_lens: jax.Array,
    p: Params,
    cap: int,
    G: int,
    use_pallas: bool = True,
) -> jax.Array:
    """Raw-codes variant of map_batch_packed2_multi (bench / pre-staged data)."""
    outs = []
    for g in range(G):
        res = map_batch(codes[g], lengths[g], index, ref_lens, p, cap, use_pallas)
        outs.append(_flatten_map_result(res))
    return jnp.stack(outs)


@functools.lru_cache(maxsize=None)
def _group_program_fn(p: Params, cap: int, L: int, G: int):
    """Statics-closed jit of map_batch_packed2_multi, AOT-cacheable (utils.aot
    needs a signature with array args only)."""

    @jax.jit
    def fn(p2, mask, lengths, index, ref_lens):
        return map_batch_packed2_multi(
            p2, mask, lengths, index, ref_lens, p, cap, L, G
        )

    return fn


@functools.lru_cache(maxsize=None)
def _single_program_fn(p: Params, cap: int, L: int):
    @jax.jit
    def fn(p2, mask, lengths, index, ref_lens):
        return map_batch_packed2(p2, mask, lengths, index, ref_lens, p, cap, L)

    return fn


@functools.lru_cache(maxsize=None)
def _flat_multi_program_fn(p: Params, cap: int, G: int):
    """Statics-closed jit of map_batch_flat_multi for AOT resolution (bench /
    pre-staged raw-code paths)."""

    @jax.jit
    def fn(codes, lengths, index, ref_lens):
        return map_batch_flat_multi(codes, lengths, index, ref_lens, p, cap, G)

    return fn


def unflatten_map_result(flat: np.ndarray) -> MapResult:
    """Host-side inverse of map_batch_packed's flat layout."""
    return MapResult(
        mapped=flat[:, 0].astype(bool), rc=flat[:, 1].astype(bool),
        q_start=flat[:, 2], q_end=flat[:, 3], rid=flat[:, 4],
        r_start=flat[:, 5], r_end=flat[:, 6], score=flat[:, 7], mapq=flat[:, 8],
        overflow=flat[:, 9].astype(bool),
    )


def format_paf(
    names: Sequence[str],
    lengths: Sequence[int],
    res: MapResult,
    meta: RefMeta,
) -> List[str]:
    """PAF lines for mapped reads. Column contract per src/mers.rs:181: col 10 carries
    the pseudo-chain score, col 11 carries r_len, MAPQ in {0, 60}."""
    mapped = np.asarray(res.mapped)
    rc = np.asarray(res.rc)
    qs = np.asarray(res.q_start)
    qe = np.asarray(res.q_end)
    rid = np.asarray(res.rid)
    rs = np.asarray(res.r_start)
    re_ = np.asarray(res.r_end)
    score = np.asarray(res.score)
    mapq = np.asarray(res.mapq)
    out = []
    for i in range(len(names)):
        if not mapped[i]:
            continue
        r = int(rid[i])
        rlen = int(meta.lengths[r])
        strand = "-" if rc[i] else "+"
        out.append(
            f"{names[i]}\t{lengths[i]}\t{qs[i]}\t{qe[i]}\t{strand}\t{meta.names[r]}"
            f"\t{rlen}\t{rs[i]}\t{re_[i]}\t{score[i]}\t{rlen}\t{mapq[i]}"
        )
    return out


class Mapper:
    """Host-side driver: index a reference, then map read streams in padded batches.

    Replaces the reference's thread-pooled streaming driver (src/closures.rs:22-257)
    with batched device dispatch. Reads are padded to the params' length bins; reads
    longer than the largest bin are truncated with a warning (cap `max_read_len`).
    """

    def __init__(self, contigs: Sequence[Tuple[str, bytes]], p: Params):
        self.p = p
        self.index, self.meta = build_index(contigs, p)
        self.ref_lens = jnp.asarray(self.meta.lengths.astype(np.int32))

    @classmethod
    def from_index(cls, index, meta: RefMeta, p: Params) -> "Mapper":
        """Construct around a prebuilt/deserialized index (see index.serialize)."""
        self = cls.__new__(cls)
        self.p = p
        self.index = index
        self.meta = meta
        self.ref_lens = jnp.asarray(meta.lengths.astype(np.int32))
        return self

    @property
    def n_unique(self) -> int:
        return self.index.n

    def _program(self, kind: str, fn, args):
        """Per-Mapper AOT program handle: first use per (kind, shapes) either
        deserializes a cached compiled executable (~1 s) or compiles and
        stores one — the relay's first-compile costs 10-300 s per program, and
        the reference pays zero compile latency (utils/aot.py)."""
        if not hasattr(self, "_progs"):
            self._progs = {}
        prog = self._progs.get(kind)
        if prog is None:
            from ..utils.aot import cached_program

            prog = cached_program(kind, fn, args, statics_key=(repr(self.p), kind))
            self._progs[kind] = prog
        return prog

    def map_reads(
        self,
        reads: Iterable[Tuple[str, bytes]],
        batch_size: Optional[int] = None,
        stats=None,
    ) -> Iterator[str]:
        """Yield PAF lines for mapped reads (unmapped reads are skipped).

        Deep-pipelined: batches are dispatched asynchronously and finalized in
        GROUPS of DEPTH with one concatenated device->host pull, so host
        packing/PAF formatting overlaps device compute and the per-pull ~0.13s
        tunnel latency amortizes over DEPTH batches (the reference overlaps via
        worker threads, src/closures.rs:183-205).

        Length bins (Params.length_bins): reads are routed to the smallest padded
        length bin that fits them, so short reads in mixed-length inputs cost
        proportionally less device work. With bins, output order groups by bin
        flush (the reference's output order is nondeterministic anyway,
        SURVEY.md §2.7; PAF line CONTENT is bin-independent).

        A read's sequence may be bytes/str (encoded here) or a pre-encoded uint8
        codes array (e.g. from the native parser, io/native.py)."""
        from ..params import _seed_cap

        p = self.p
        B = batch_size or p.batch_size
        bins = sorted(set(int(b) for b in p.length_bins if b < p.max_read_len))
        bins.append(p.max_read_len)
        caps = [min(p.max_minimizers, _seed_cap(Lb, p.density, p.k)) for Lb in bins]

        # Rings are cached on the Mapper ONLY for the single active iterator:
        # two interleaved map_reads generators sharing one ring would overwrite
        # each other's in-flight batches, so a concurrent call gets private
        # (uncached) buffers instead.
        if not hasattr(self, "_buf_rings"):
            self._buf_rings = {}
            self._rings_active = False
        if self._rings_active:
            rings = {}
            release_rings = False
        else:
            rings = self._buf_rings
            self._rings_active = True
            release_rings = True

        from ..io import native as _native

        use_native_pack = _native.available()
        G = max(1, int(p.dispatch_group))
        _DISPATCH_Q = 6  # upload/dispatch jobs in flight behind the worker:
                         # also the wave-size bound, and each wave ends in ONE
                         # fixed ~30-130 ms pull — 6 halves the mid-stream pull
                         # count vs 3 for ~60 MB more ring memory per bin

        from time import perf_counter as _pc

        prof = _E2EProf() if os.environ.get("MAPQUIK_E2E_PROF") else None

        class _Bin:
            """Reads are held as ZERO-COPY code references (views into the
            parser's buffer / encode_fast outputs); as each 256-read sub-batch
            fills, one native C pass (io/native.pack2_rows) assembles +
            2-bit-packs it straight into slice g of a reused [G, B, L/4]
            upload buffer. When G sub-batches are staged they dispatch as ONE
            compiled program (map_batch_packed2_multi — the per-program relay
            dispatch floor is ~3-6 ms, so G=4 is worth ~2.5 ms/batch). The
            round-2 design copied every read into a padded [B, L] ring and
            packed with numpy — ~40-60 ms of single-core host time per batch,
            which bounded e2e throughput at ~0.1-0.2x of device throughput.
            Ring entries guarantee no upload buffer is reused while its
            transfer may be in flight; rings persist across map_reads calls."""

            def __init__(self, Lb, cap):
                self.L = Lb
                self.cap = cap
                self.names: List[str] = []
                self.lens: List[int] = []
                self.rows: List[np.ndarray] = []
                self.staged: List[tuple] = []  # (names, lens, rows, lens_host)
                self.any_n = False  # any masked base among currently staged
                self._ring = rings.setdefault((B, Lb), [self._alloc()])
                self._ri = 0
                self.buf = self._ring[0]

            def _alloc(self):
                return (np.zeros((G, B, self.L // 4), np.uint8),
                        np.zeros((G, B, self.L // 8), np.uint8))

            def next_buf(self):
                # ring must cover every buffer that can be in flight at once:
                # a worker WAVE (<= _DISPATCH_Q), the refilled queue
                # (<= _DISPATCH_Q), and the one being staged
                self._ri += 1
                if len(self._ring) < 2 * _DISPATCH_Q + 1:
                    self._ring.append(self._alloc())
                self.buf = self._ring[self._ri % len(self._ring)]

        state = [_Bin(Lb, cap) for Lb, cap in zip(bins, caps)]
        # Grouped finalization: each d2h pull costs ~30-130 ms LATENCY on this
        # environment regardless of size, so pulling per batch caps e2e at
        # ~750 reads/s while the device maps ~16k/s. Keep DEPTH batches in
        # flight and pull their [B, 10] results as ONE concatenated array.
        DEPTH = 8
        pending: List[tuple] = []

        def _pack_subbatch(bn: "_Bin"):
            """Pack the current B reads into slice g of the bin's upload buffer."""
            from .seeding import pack2_host

            t0 = _pc() if prof else 0.0
            g = len(bn.staged)
            lens_host = np.zeros(B, dtype=np.int32)
            lens_host[: len(bn.lens)] = bn.lens
            p2, mask = bn.buf
            if use_native_pack:
                has_n = _native.pack2_rows(
                    bn.rows + [None] * (B - len(bn.rows)), lens_host, bn.L,
                    p2[g], mask[g],
                )
                assert has_n is not None
                bn.any_n |= bool(has_n)
            else:
                codes_host = np.full((B, bn.L), 4, dtype=np.uint8)
                for i, r in enumerate(bn.rows):
                    codes_host[i, : r.shape[0]] = r
                p2n, maskn = pack2_host(codes_host, lens_host)
                p2[g][:], mask[g][:] = p2n, maskn
                bn.any_n |= bool(maskn.any())
            bn.staged.append((bn.names, bn.lens, bn.rows, lens_host))
            bn.names, bn.lens, bn.rows = [], [], []
            if prof:
                prof.add("pack", _pc() - t0)

        def _stats_loci(p2_d, mask_d, lens_d, cap, L):
            if stats is None:
                return None
            from .seeding import unpack2
            from .stats import read_stats_batch

            return read_stats_batch(
                unpack2(p2_d, mask_d, L, lens_d), lens_d, self.index, p, cap
            )

        def _zero_mask(shape):
            """Device-resident all-zero mask, cached per shape: N-free batches
            (the common case) skip the mask upload — 1/3 of the batch's bytes
            on a tunnel where upload bandwidth bounds e2e throughput."""
            if not hasattr(self, "_zmasks"):
                self._zmasks = {}
            zm = self._zmasks.get(shape)
            if zm is None:
                zm = jnp.zeros(shape, jnp.uint8)
                self._zmasks[shape] = zm
            return zm

        # Dispatch discipline: OVERLAP (fire-and-forget uploads/dispatches on
        # the worker; results pulled in DEPTH-grouped concats on the main
        # thread) is the r5 default — the round-3 "h2d during compute stalls
        # 10x" observation was the post-execution transfer mode, not
        # contention (experiments/r5_transfer_modes.md), and the r5 on-chip
        # A/B measured overlap-safe (322 -> 231 ms upload+compute; Mapper
        # e2e 3,241 -> 4,095 reads/s). MAPQUIK_DISPATCH=serial restores the
        # round-3/4 wave discipline (mutually exclusive transfers/compute,
        # one pull per wave) as the measured foil.
        serial_dispatch = (
            os.environ.get("MAPQUIK_DISPATCH", "overlap") != "overlap"
        )

        def _upload_group(buf, staged, cap, L, any_n):
            """Phase 1: host buffers -> device (h2d only, device otherwise idle)."""
            t0 = _pc() if prof else 0.0
            p2, mask = buf
            p2_d = jnp.asarray(p2)
            mask_d = jnp.asarray(mask) if any_n else _zero_mask(mask.shape)
            lens_d = jnp.asarray(np.stack([s[3] for s in staged]))
            if prof:
                jax.block_until_ready((p2_d, mask_d, lens_d))
                prof.add("upload", _pc() - t0)
            return p2_d, mask_d, lens_d

        def _dispatch_group(up, cap, L):
            """Phase 2: dispatch the G-batch program (no transfers in flight)."""
            p2_d, mask_d, lens_d = up
            prog = self._program(
                f"map_group_c{cap}_L{L}_G{G}",
                _group_program_fn(p, cap, L, G),
                (p2_d, mask_d, lens_d, self.index, self.ref_lens),
            )
            t0 = _pc() if prof else 0.0
            out = prog(p2_d, mask_d, lens_d, self.index, self.ref_lens)
            if prof:
                prof.add("dispatch", _pc() - t0)
            return out

        def _items_of(flat, up, staged, cap, L):
            p2_d, mask_d, lens_d = up
            items = []
            for g, (nm, ln, rows_g, lens_host) in enumerate(staged):
                loci = _stats_loci(p2_d[g], mask_d[g], lens_d[g], cap, L)
                items.append((nm, ln, flat[g], loci, rows_g, lens_host, cap, L))
            return items

        def _run_group(buf, staged, cap, L, any_n):
            """Upload + dispatch G staged sub-batches as one program (runs on
            the dispatch worker thread)."""
            up = _upload_group(buf, staged, cap, L, any_n)
            flat = _dispatch_group(up, cap, L)
            if serial_dispatch:
                t0 = _pc() if prof else 0.0
                flat = np.asarray(flat)  # completion barrier + the result pull
                if prof:
                    prof.add("pull", _pc() - t0)
                    prof.waves.append(1)
            return _items_of(flat, up, staged, cap, L)

        def _run_wave(groups):
            """Several staged groups as one serial-discipline WAVE: upload all
            (device idle), dispatch all (no transfers in flight), then ONE
            concatenated pull as both the result transfer and the completion
            barrier — each d2h pull costs ~30-130 ms of tunnel LATENCY
            regardless of size, so pulling once per wave instead of once per
            group amortizes the dominant fixed cost over 2-3x more reads."""
            ups = [_upload_group(*s) for s in groups]
            flats = [
                _dispatch_group(u, s[2], s[3]) for u, s in zip(ups, groups)
            ]
            t0 = _pc() if prof else 0.0
            cat = np.asarray(jnp.concatenate(flats)) if len(flats) > 1 else (
                np.asarray(flats[0])
            )
            if prof:
                prof.add("pull", _pc() - t0)
                prof.waves.append(len(groups))
            out, o = [], 0
            for u, s, f in zip(ups, groups, flats):
                fl = cat[o : o + f.shape[0]]
                o += f.shape[0]
                out.append(_items_of(fl, u, s[1], s[2], s[3]))
            return out

        def _run_tail(buf, staged, cap, L, any_n):
            """Leftover staged sub-batches (< G) through the single-batch
            program (shared with small inputs; no partial-G compile). All n
            dispatches share ONE concatenated d2h pull: each pull costs
            ~30-130 ms of fixed tunnel latency, so per-sub-batch pulls taxed
            a mixed-bin 4096-read stream ~0.25-0.4 s at its end (r5 e2e
            profile). Uploads stay per-sub-batch (async h2d calls pipeline;
            host slices avoid ad-hoc device-slice compiles)."""
            p2, mask = buf
            ups = []
            t0 = _pc() if prof else 0.0
            for g in range(len(staged)):
                p2_d = jnp.asarray(p2[g])
                mask_d = (
                    jnp.asarray(mask[g]) if any_n else _zero_mask(mask[g].shape)
                )
                lens_d = jnp.asarray(staged[g][3])
                ups.append((p2_d, mask_d, lens_d))
            if prof:
                jax.block_until_ready(ups)
                prof.add("tail_upload", _pc() - t0)
            flats = []
            for p2_d, mask_d, lens_d in ups:
                prog = self._program(
                    f"map_single_c{cap}_L{L}",
                    _single_program_fn(p, cap, L),
                    (p2_d, mask_d, lens_d, self.index, self.ref_lens),
                )
                flats.append(prog(p2_d, mask_d, lens_d, self.index, self.ref_lens))
            if serial_dispatch:
                t0 = _pc() if prof else 0.0
                cat = (np.asarray(jnp.concatenate(flats)) if len(flats) > 1
                       else np.asarray(flats[0]))
                if prof:
                    prof.add("tail_pull", _pc() - t0)
                flats = [cat[g * B : (g + 1) * B] for g in range(len(staged))]
            items = []
            for g, (nm, ln, rows_g, lens_host) in enumerate(staged):
                loci = _stats_loci(*ups[g], cap, L)
                items.append((nm, ln, flats[g], loci, rows_g, lens_host, cap, L))
            return items

        # --- dispatch worker: uploads + program dispatches run on ONE
        # background thread so the h2d transfer (which releases the GIL, and
        # runs 27..650 MB/s depending on the relay's phase) overlaps the main
        # thread's encode/pack/format work. FIFO jobs keep output order; the
        # bounded queue is the ring-reuse backpressure (a buffer is never
        # rewritten until its job completed). The reference overlaps via its
        # worker thread pool (src/closures.rs:183-205).
        import queue as _queue
        import threading as _threading

        jobs: "_queue.Queue" = _queue.Queue(maxsize=_DISPATCH_Q)
        done_q: "_queue.Queue" = _queue.Queue()
        worker_err: List[BaseException] = []

        def _worker():
            stop = False
            while not stop:
                t0 = _pc() if prof else 0.0
                job = jobs.get()
                if prof:
                    prof.add("worker_idle", _pc() - t0)
                if job is None:
                    return
                wave = [job]
                # opportunistically drain queued jobs into one wave (bounded
                # by the queue size); a wave shares one completion pull
                while serial_dispatch and len(wave) < _DISPATCH_Q:
                    try:
                        nxt = jobs.get_nowait()
                    except _queue.Empty:
                        break
                    if nxt is None:
                        stop = True
                        break
                    wave.append(nxt)
                try:
                    groups = [s for k, s in wave if k == "group"]
                    tails = [s for k, s in wave if k == "tail"]
                    calls = [s for k, s in wave if k == "call"]
                    if serial_dispatch and len(groups) > 1:
                        for items in _run_wave(groups):
                            done_q.put(items)
                    else:
                        for s in groups:
                            done_q.put(_run_group(*s))
                    for s in tails:
                        done_q.put(_run_tail(*s))
                    for fn, resq in calls:
                        try:
                            resq.put((fn(), None))
                        except BaseException as e:
                            resq.put((None, e))
                except BaseException as e:  # pragma: no cover - surfaced below
                    worker_err.append(e)
                    done_q.put(None)

        wt = _threading.Thread(target=_worker, daemon=True)
        wt.start()

        def drain():
            """Move completed dispatches into pending (non-blocking)."""
            while True:
                if worker_err:
                    raise worker_err[0]
                try:
                    items = done_q.get_nowait()
                except _queue.Empty:
                    return
                if items is not None:
                    pending.extend(items)

        def dispatch(bn: "_Bin"):
            """A full B-read sub-batch is ready: stage it; enqueue when G are."""
            _pack_subbatch(bn)
            if len(bn.staged) == G:
                snap = (bn.buf, bn.staged, bn.cap, bn.L, bn.any_n)
                bn.staged = []
                bn.any_n = False
                bn.next_buf()
                t0 = _pc() if prof else 0.0
                jobs.put(("group", snap))
                if prof:
                    prof.add("backpressure", _pc() - t0)

        def dispatch_tail(bn: "_Bin"):
            if bn.rows or bn.names:
                _pack_subbatch(bn)
            if bn.staged:
                snap = (bn.buf, bn.staged, bn.cap, bn.L, bn.any_n)
                bn.staged = []
                bn.any_n = False
                bn.next_buf()
                jobs.put(("tail", snap))

        def shutdown_worker():
            while True:
                try:
                    jobs.put_nowait(None)
                    break
                except _queue.Full:
                    import time as _time

                    _time.sleep(0.005)
            wt.join()

        def finalize_group(items):
            if not items:
                return
            if all(isinstance(it[2], np.ndarray) for it in items):
                pulled = [np.array(it[2]) for it in items]  # serial: pre-pulled
            elif len(items) == 1:
                pulled = [np.array(items[0][2])]
            else:
                cat = np.asarray(jnp.concatenate([it[2] for it in items]))
                pulled = [
                    np.array(cat[i * B : (i + 1) * B]) for i in range(len(items))
                ]
            for item, flat_h in zip(items, pulled):
                yield from finalize(item, flat_h)

        def _device_call(fn):
            """Run fn (an upload + program dispatch) under the worker's serial
            transfer/compute discipline while the worker is alive — an h2d
            issued mid-wave from this thread stalls the device ~10x (probe3).
            After worker shutdown the device is idle: call directly."""
            if wt.is_alive():
                resq: "_queue.Queue" = _queue.Queue(1)
                jobs.put(("call", (fn, resq)))
                res, err = resq.get()
                if err is not None:
                    raise err
                return res
            return fn()

        def finalize(item, flat_h):
            f_names, f_lens, flat, loci, rows_refs, lens_host, cap0, Lb = item
            # overflow retry (mirrors the index builder's doubled-cap retry,
            # index/build.py): a clipped read's PAF line may be wrong, so clipped
            # reads are re-dispatched at doubled caps until none overflow — never
            # emit a possibly-clipped mapping
            cap = cap0
            attempt = 0
            last_pallas = True
            while flat_h[: len(f_names), 9].any():
                if cap >= Lb and not last_pallas:
                    # exact path at cap == Lb cannot overflow (true minimizer
                    # count <= L <= cap): this is unreachable, but never loop
                    raise AssertionError("overflow persisted on the exact path")
                cap = min(cap * 2, Lb)
                attempt += 1
                import sys

                rows = np.nonzero(flat_h[: len(f_names), 9])[0]
                print(
                    f"seed cap clipped {rows.size} read(s); remapping "
                    f"them at cap {cap}",
                    file=sys.stderr,
                )
                rbuf = np.full((lens_host.shape[0], Lb), 4, dtype=np.uint8)
                for ri, r in enumerate(rows):
                    row = rows_refs[r]
                    if not isinstance(row, np.ndarray):  # raw bytes row
                        row = encode_fast(row)
                    rbuf[ri, : lens_host[r]] = row[: lens_host[r]]
                rlens = np.zeros_like(lens_host)
                rlens[: rows.size] = lens_host[rows]
                # attempt >= 2 or cap maxed: the overflow may be the Pallas
                # per-block compaction cap (satellite repeats), which a bigger
                # seed cap cannot fix — force the uncompacted path
                last_pallas = attempt < 2 and cap < Lb
                rflat = _device_call(
                    lambda c=cap, lp=last_pallas: np.asarray(
                        map_batch_flat(
                            jnp.asarray(rbuf), jnp.asarray(rlens), self.index,
                            self.ref_lens, p, c, lp,
                        )
                    )
                )
                flat_h[rows] = rflat[: rows.size]
            res = unflatten_map_result(flat_h)
            if loci is not None:
                stats.write_batch(f_names, np.asarray(loci)[: len(f_names)])
            t0 = _pc() if prof else 0.0
            out = format_paf(f_names, f_lens, res, self.meta)
            if prof:
                prof.add("format", _pc() - t0)
            return out

        def run():
            n_truncated = 0
            n_seen = 0
            t_run = _pc()
            for name, seq in reads:
                n_seen += 1
                if isinstance(seq, np.ndarray):
                    codes = seq
                    Lr = codes.shape[0]
                elif use_native_pack:
                    # RAW bytes: the native packer LUT-encodes inline at pack
                    # time (bytes.translate costs ~0.15-0.4 ms per 24 kb read
                    # on this host — the largest single e2e host cost)
                    codes = seq.encode() if isinstance(seq, str) else seq
                    Lr = len(codes)
                else:
                    codes = encode_fast(seq)
                    Lr = codes.shape[0]
                if Lr > p.max_read_len:
                    if n_truncated == 0:
                        import sys

                        print(
                            f"Warning: read {name} ({Lr} bp) exceeds max_read_len "
                            f"({p.max_read_len}); truncating (raise --max-read-len "
                            f"for full-length parity with the reference).",
                            file=sys.stderr,
                        )
                    n_truncated += 1
                    codes = codes[: p.max_read_len]
                    Lr = p.max_read_len
                if isinstance(codes, np.ndarray) and (
                    codes.dtype != np.uint8 or not codes.flags.c_contiguous
                ):
                    codes = np.ascontiguousarray(codes, dtype=np.uint8)
                bn = next(b for b in state if Lr <= b.L)
                bn.rows.append(codes)
                bn.names.append(name)
                bn.lens.append(Lr)
                if len(bn.names) == B:
                    dispatch(bn)
                    drain()
                    if len(pending) >= DEPTH:
                        group = pending[:]
                        pending.clear()
                        yield from finalize_group(group)
            for bn in state:
                if bn.names or bn.staged:
                    dispatch_tail(bn)
            shutdown_worker()
            drain()
            yield from finalize_group(pending)
            if prof:
                prof.report(_pc() - t_run, n_seen)

        try:
            yield from run()
        finally:
            shutdown_worker()
            if release_rings:
                self._rings_active = False
