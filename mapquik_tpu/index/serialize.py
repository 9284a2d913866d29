"""Index checkpointing: save/load the built reference index to a single .npz.

The reference has no on-disk index format — it rebuilds from FASTA each run
(SURVEY.md §5, "Checkpoint / resume: none"). This adds the minimap2-.mmi-style
capability the reference lacks: `mapquik-tpu --save-index idx.npz` once, then
`--load-index idx.npz` skips the index build entirely. Parity does not depend on it.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .build import RefMeta
from .hashtable import HashIndex
from .lookup import RefIndex

_FORMAT_VERSION = 4  # v4: 128-lane-grouped (keys, pay) rows (r5 tiling fix);
                     # v3 was fused [S,8,6] slots; v2 was [S,8,7]


def save_index(path: str, index, meta: RefMeta, params_key: str = "") -> None:
    """Serialize a HashIndex or RefIndex plus reference metadata."""
    if isinstance(index, HashIndex):
        kind = "hash"
    elif isinstance(index, RefIndex):
        kind = "sorted"
    else:
        raise TypeError(f"unknown index type {type(index)!r}")
    cols = {f"col_{name}": np.asarray(v) for name, v in index._asdict().items()}
    np.savez_compressed(
        path,
        version=np.int64(_FORMAT_VERSION),
        kind=kind,
        params_key=params_key,
        # fixed-width unicode (not dtype=object) so load_index can refuse pickled
        # payloads: a shared .npz index must never be able to execute code
        names=np.asarray(meta.names, dtype=np.str_),
        lengths=meta.lengths,
        **cols,
    )


def load_index(path: str, expect_params_key: str = "") -> Tuple[object, RefMeta]:
    """Load an index saved by save_index. Raises on version/params mismatch."""
    z = np.load(path, allow_pickle=False)
    version = int(z["version"])
    if version not in (2, 3, _FORMAT_VERSION):
        raise ValueError(f"index format version {version} unsupported")
    saved_key = str(z["params_key"])
    if expect_params_key and saved_key and saved_key != expect_params_key:
        raise ValueError(
            f"index was built with params {saved_key!r}, run requests "
            f"{expect_params_key!r} — rebuild or drop --load-index"
        )
    meta = RefMeta(names=[str(n) for n in z["names"]], lengths=z["lengths"])
    kind = str(z["kind"])
    cls = HashIndex if kind == "hash" else RefIndex
    if kind == "hash" and version < _FORMAT_VERSION:
        if version == 2:
            # v2 stored (h1, h2, rid, start, end, offset, rc); fold rid/rc
            # into the v3 ridrc column first
            s7 = z["col_slots"]
            s6 = np.concatenate(
                [s7[..., :2], ((s7[..., 2] << 1) | s7[..., 6])[..., None],
                 s7[..., 3:6]],
                axis=-1,
            )
            # empty slots must keep ridrc 0 (v2 rid column was 0 there)
            empty = (s7[..., 0] == -1) & (s7[..., 1] == -1)
            s6[..., 2][empty] = 0
        else:
            s6 = z["col_slots"]
        # v3 fused [S, 8, 6] -> v4 grouped rows via the host placement packer
        from .hashtable import pack_slots

        flat = s6.reshape(-1, 6)
        S = s6.shape[0]
        slot_of = np.arange(flat.shape[0], dtype=np.int64)
        keys, pay = pack_slots(
            S, slot_of,
            flat[:, 0].astype(np.uint32), flat[:, 1].astype(np.uint32),
            flat[:, 2] >> 1, flat[:, 3], flat[:, 4], flat[:, 5],
            flat[:, 2] & 1,
        )
        # restore the sentinel/empty pattern exactly: pack_slots wrote every
        # slot, including empties (whose v3 ridrc is 0 and keys are -1)
        cols = {"keys": keys, "pay": pay}
    else:
        cols = {name: z[f"col_{name}"] for name in cls._fields}
    return cls(**{k: jnp.asarray(v) for k, v in cols.items()}), meta


def params_key(p) -> str:
    """Semantic-parameter fingerprint for index compatibility checks."""
    return f"k{p.k}-l{p.l}-d{p.density:g}-hpc{int(p.use_hpc)}"
