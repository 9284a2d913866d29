"""End-to-end jitted mapping: [B, L] read batch -> per-read mapping records.

One XLA program per (B, L, params) specialization fusing the reference's hot loops
A-D (SURVEY.md §3.2): seeding scan, index probe, match segmentation, chaining,
best-hit selection and coordinate projection. The host only pads batches in and
formats PAF text out (src/mers.rs:181 line layout).
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.build import RefMeta, build_index
from ..index.hashtable import HashIndex, probe_hash
from ..index.lookup import RefIndex, probe
from ..oracle.pyref import encode
from ..params import Params
from .chaining import MapResult, chain_and_select, project_coords
from .matching import find_matches
from .seeding import seed_batch


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
    """Transfer-optimized map_batch for the streaming driver: 4-bit-packed codes in
    (halves the upload), ONE flat int32 [B, 10] result out (each device->host pull
    costs ~0.1-0.4 s latency through this environment's tunnel, so the driver pulls
    exactly one array per batch). Columns: mapped, rc, q_start, q_end, rid,
    r_start, r_end, score, mapq, overflow."""
    from .seeding import unpack4

    res = map_batch(unpack4(packed, L), lengths, index, ref_lens, p, cap, use_pallas)
    return jnp.stack(
        [
            res.mapped.astype(jnp.int32), res.rc.astype(jnp.int32),
            res.q_start, res.q_end, res.rid, res.r_start, res.r_end,
            res.score, res.mapq, res.overflow.astype(jnp.int32),
        ],
        axis=1,
    )


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

    def map_reads(
        self,
        reads: Iterable[Tuple[str, bytes]],
        batch_size: Optional[int] = None,
        stats=None,
    ) -> Iterator[str]:
        """Yield PAF lines for mapped reads (unmapped reads are skipped).

        Double-buffered: each batch is dispatched asynchronously and finalized only
        after the NEXT batch is enqueued, so host packing/PAF formatting overlaps
        device compute (the reference overlaps via worker threads,
        src/closures.rs:183-205; here JAX's async dispatch provides the pipeline).

        Length bins (Params.length_bins): reads are routed to the smallest padded
        length bin that fits them, so short reads in mixed-length inputs cost
        proportionally less device work. With bins, output order groups by bin
        flush (the reference's output order is nondeterministic anyway,
        SURVEY.md §2.7; PAF line CONTENT is bin-independent).

        A read's sequence may be bytes/str (encoded here) or a pre-encoded uint8
        codes array (e.g. from the native parser, io/native.py)."""
        from ..params import _seed_cap
        from .seeding import pack4_host, unpack4

        p = self.p
        B = batch_size or p.batch_size
        bins = sorted(set(int(b) for b in p.length_bins if b < p.max_read_len))
        bins.append(p.max_read_len)
        caps = [min(p.max_minimizers, _seed_cap(Lb, p.density, p.k)) for Lb in bins]

        class _Bin:
            def __init__(self, Lb, cap):
                self.L = Lb
                self.cap = cap
                self.names: List[str] = []
                self.lens: List[int] = []
                self.buf = np.full((B, Lb), 4, dtype=np.uint8)

        state = [_Bin(Lb, cap) for Lb, cap in zip(bins, caps)]
        pending = None  # (names, lens, flat result, loci or None)

        def dispatch(bn: "_Bin"):
            packed_host = pack4_host(bn.buf)
            packed_d = jnp.asarray(packed_host)
            lens_host = np.asarray(bn.lens + [0] * (B - len(bn.lens)), dtype=np.int32)
            lens_d = jnp.asarray(lens_host)
            flat = map_batch_packed(
                packed_d, lens_d, self.index, self.ref_lens, p, bn.cap, bn.L
            )
            loci = None
            if stats is not None:
                from .stats import read_stats_batch

                loci = read_stats_batch(
                    unpack4(packed_d, bn.L), lens_d, self.index, p, bn.cap
                )
            out = (bn.names, bn.lens, flat, loci, packed_host, lens_host, bn.cap, bn.L)
            bn.names, bn.lens = [], []
            bn.buf = np.full((B, bn.L), 4, dtype=np.uint8)
            return out

        def finalize(item):
            f_names, f_lens, flat, loci, packed_host, lens_host, cap0, Lb = item
            flat_h = np.array(flat)  # the ONE d2h pull (writable copy: overflow
                                     # retry patches rows in place)
            # overflow retry (mirrors the index builder's doubled-cap retry,
            # index/build.py): a clipped read's PAF line may be wrong, so clipped
            # reads are re-dispatched at doubled caps until none overflow — never
            # emit a possibly-clipped mapping
            cap = cap0
            attempt = 0
            while flat_h[: len(f_names), 9].any() and cap < Lb:
                cap = min(cap * 2, Lb)
                attempt += 1
                import sys

                rows = np.nonzero(flat_h[: len(f_names), 9])[0]
                print(
                    f"seed cap {cap // 2} clipped {rows.size} read(s); remapping "
                    f"them at cap {cap}",
                    file=sys.stderr,
                )
                rbuf = np.zeros_like(packed_host)
                rbuf[: rows.size] = packed_host[rows]
                rlens = np.zeros_like(lens_host)
                rlens[: rows.size] = lens_host[rows]
                # attempt >= 2: the overflow may be the Pallas per-block
                # compaction cap (satellite repeats), which a bigger seed cap
                # cannot fix — force the uncompacted path
                rflat = np.asarray(
                    map_batch_packed(
                        jnp.asarray(rbuf), jnp.asarray(rlens), self.index,
                        self.ref_lens, p, cap, Lb, attempt < 2,
                    )
                )
                flat_h[rows] = rflat[: rows.size]
            res = unflatten_map_result(flat_h)
            if loci is not None:
                stats.write_batch(f_names, np.asarray(loci)[: len(f_names)])
            return format_paf(f_names, f_lens, res, self.meta)

        n_truncated = 0
        for name, seq in reads:
            codes = seq if isinstance(seq, np.ndarray) else encode(seq)
            Lr = codes.shape[0]
            if Lr > p.max_read_len:
                if n_truncated == 0:
                    import sys

                    print(
                        f"Warning: read {name} ({Lr} bp) exceeds max_read_len "
                        f"({p.max_read_len}); truncating (raise --max-read-len for "
                        f"full-length parity with the reference).",
                        file=sys.stderr,
                    )
                n_truncated += 1
                codes = codes[: p.max_read_len]
                Lr = p.max_read_len
            bn = next(b for b in state if Lr <= b.L)
            bn.buf[len(bn.names), :Lr] = codes
            bn.names.append(name)
            bn.lens.append(Lr)
            if len(bn.names) == B:
                nxt = dispatch(bn)
                if pending is not None:
                    yield from finalize(pending)
                pending = nxt
        for bn in state:
            if bn.names:
                nxt = dispatch(bn)
                if pending is not None:
                    yield from finalize(pending)
                pending = nxt
        if pending is not None:
            yield from finalize(pending)
