"""ctypes binding for the native C++ FASTX parser (native/fastx.cpp).

Reference analog: the seq_io record parser + rust-parallelfastx whole-file parser
feeding the worker pool (src/closures.rs:83-90,189-208; SURVEY.md §2.8).

Builds the shared library on first use (make -C native); callers fall back to the
pure-Python parser if the toolchain or zlib is unavailable. Returns zero-Python-loop
parsed records: one encoded uint8 codes buffer + offsets + names.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmapquik_fastx.so")

_lib = None
_lib_tried = False


class _FxResult(ctypes.Structure):
    _fields_ = [
        ("codes", ctypes.POINTER(ctypes.c_uint8)),
        ("rec_off", ctypes.POINTER(ctypes.c_int64)),
        ("names", ctypes.POINTER(ctypes.c_uint8)),
        ("name_off", ctypes.POINTER(ctypes.c_int64)),
        ("n_records", ctypes.c_int64),
        ("total_len", ctypes.c_int64),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        src = os.path.join(_NATIVE_DIR, "fastx.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s", "-B"], check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(_FxResult)]
        lib.fx_parse.restype = ctypes.c_int
        lib.fx_free.argtypes = [ctypes.POINTER(_FxResult)]
        lib.mq_pack2_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mq_pack2_batch.restype = ctypes.c_int
        lib.mq_pack2_batch_mixed.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mq_pack2_batch_mixed.restype = ctypes.c_int
        lib.mq_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mq_encode.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_file(path: str, n_threads: int = 0):
    """Parse FASTA/FASTQ(.gz) natively.

    Returns (codes u8 [total], rec_off i64 [n+1], names list[str]) or None if the
    native library is unavailable or the file format defeated it (caller falls back).
    Codes are pre-encoded: A=0 C=1 G=2 T=3 other=4, case-folded.
    """
    lib = _load()
    if lib is None or path.endswith(".lz4"):
        return None
    res = _FxResult()
    rc = lib.fx_parse(path.encode(), n_threads, ctypes.byref(res))
    if rc != 0:
        return None
    try:
        n = res.n_records
        total = res.total_len
        codes = np.ctypeslib.as_array(res.codes, shape=(max(total, 1),))[:total].copy()
        rec_off = np.ctypeslib.as_array(res.rec_off, shape=(n + 1,)).copy()
        name_off = np.ctypeslib.as_array(res.name_off, shape=(n + 1,)).copy()
        raw_names = (
            np.ctypeslib.as_array(res.names, shape=(int(name_off[n]),)).tobytes()
            if n
            else b""
        )
        names = [
            raw_names[name_off[i] : name_off[i + 1] - 1].decode()
            for i in range(n)
        ]
    finally:
        lib.fx_free(ctypes.byref(res))
    return codes, rec_off, names


def pack2_rows(
    rows: List[Optional[np.ndarray]],
    lens: np.ndarray,
    L: int,
    out_p2: np.ndarray,
    out_mask: np.ndarray,
) -> Optional[int]:
    """Fused batch assembly + 2-bit pack (native; see fastx.cpp mq_pack2_batch).

    rows: per-read contiguous uint8 code arrays OR raw `bytes` of ASCII bases
    (LUT-encoded inline in C — bit-identical to encode_fast then packing;
    None = empty row); lens int32
    [B]; writes p2 into out_p2 [B, L//4] and the in-read non-ACGT mask into
    out_mask [B, L//8] — bit-identical to ops/seeding.pack2_host(codes, lens)
    over a 4-padded [B, L] buffer (padding is NOT masked; unpack2 reconstructs
    it from the lengths). Returns None when the native library is unavailable
    (caller uses the numpy path), else 1 if any mask bit is set, 0 otherwise —
    callers skip the mask upload entirely when 0."""
    lib = _load()
    if lib is None:
        return None
    B = len(rows)
    addrs = np.zeros(B, dtype=np.uint64)
    flags = np.zeros(B, dtype=np.uint8)
    keepalive = []
    any_raw = False
    for i, r in enumerate(rows):
        if isinstance(r, (bytes, bytearray)):
            # RAW ASCII bases: LUT-encoded inline in C (zero Python-side
            # encode pass); keep the zero-copy view alive through the call
            if len(r):
                v = np.frombuffer(r, dtype=np.uint8)
                keepalive.append(v)
                addrs[i] = v.ctypes.data
                flags[i] = 1
                any_raw = True
        elif r is not None and r.size:
            addrs[i] = r.ctypes.data
    lens_c = np.ascontiguousarray(lens, dtype=np.int32)
    if any_raw:
        rc = lib.mq_pack2_batch_mixed(
            addrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            lens_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            B, L,
            out_p2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    else:
        rc = lib.mq_pack2_batch(
            addrs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            lens_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, L,
            out_p2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return None if rc < 0 else rc


def encode_bytes(seq) -> Optional[np.ndarray]:
    """Bulk ASCII bases -> codes 0..4 via the native library (bit-identical
    to oracle encode; case-folded, other=4). numpy's LUT take runs at
    ~20-40 MB/s on this host — a 3 GB genome would pay minutes — while this
    runs at memory speed. Returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if isinstance(seq, str):
        seq = seq.encode()
    src = np.frombuffer(seq, dtype=np.uint8)
    dst = np.empty(src.size, dtype=np.uint8)
    if src.size:
        lib.mq_encode(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(src.size),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return dst


def encode_any(seq) -> np.ndarray:
    """encode() with the native bulk path when available (oracle-LUT numpy
    fallback otherwise) — the drop-in for contig-scale encodes."""
    if isinstance(seq, np.ndarray):
        return seq
    out = encode_bytes(seq)
    if out is not None:
        return out
    from ..oracle.pyref import encode as _enc

    return _enc(seq)


def iter_records(path: str, n_threads: int = 0) -> Optional[Iterator[Tuple[str, np.ndarray]]]:
    """Iterate (name, codes) using the native parser; None if unavailable."""
    parsed = parse_file(path, n_threads)
    if parsed is None:
        return None
    codes, rec_off, names = parsed

    def gen():
        for i, name in enumerate(names):
            yield name, codes[rec_off[i] : rec_off[i + 1]]

    return gen()
