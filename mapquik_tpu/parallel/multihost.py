"""Multi-host orchestration: jax.distributed bring-up + per-host mapping run.

The reference is strictly single-node (SURVEY.md §2.10); this is the TPU-native
scale-out path. Design (see also io/shard.py and parallel/mesh.py):

  - every host builds (or loads, index/serialize.py) the SAME index — extraction
    is deterministic, so no index exchange is needed; for very large references,
    build once, `save_index`, and `load_index` on the others;
  - host i of n maps byte-range shard i/n of the reads file through its local
    devices (data-parallel shard_map within the host);
  - each host writes `{prefix}.shardIofN.paf`; concatenation is the final PAF
    (order across shards is irrelevant — the reference's output order is already
    nondeterministic, SURVEY.md §2.7).

Bring-up:
    python -m mapquik_tpu.cli reads.fq --reference ref.fa \
        --shard $SLURM_PROCID/$SLURM_NTASKS ...
on each host, optionally after `init_distributed()` when a JAX coordinator is
available (GKE/SLURM autodetection via jax.distributed defaults).
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when multi-process env is configured.

    Returns True if distributed mode is active. Safe to call unconditionally:
    with no coordinator configured (single host) it is a no-op returning False.
    """
    import jax

    addr = coordinator_address or os.environ.get("MAPQUIK_COORDINATOR")
    nproc = num_processes or _env_int("MAPQUIK_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env_int("MAPQUIK_PROCESS_ID")
    if addr is None and nproc is None:
        # jax also autodetects SLURM/GKE; try only when such env is present
        if not any(k in os.environ for k in ("SLURM_JOB_ID", "COORDINATOR_ADDRESS")):
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=nproc, process_id=pid
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e):
            return True
        raise
    except Exception as e:
        if addr is not None or nproc is not None:
            # the user explicitly configured multi-process: degrading to a silent
            # single-host run would duplicate every shard's work — fail loudly
            raise RuntimeError(
                f"jax.distributed.initialize failed for coordinator={addr!r} "
                f"num_processes={nproc!r} process_id={pid!r}: {e}"
            ) from e
        import sys

        print(
            f"Warning: jax.distributed autodetection failed ({e}); "
            "continuing single-host.",
            file=sys.stderr,
        )
        return False


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def host_shard() -> tuple:
    """(process_index, process_count) — the input shard this host owns."""
    import jax

    return jax.process_index(), jax.process_count()


def run_host_shard(reads_path: str, mapper, prefix: str, batch_size=None) -> str:
    """Map this host's byte-range shard; returns the shard PAF path."""
    from ..io.shard import iter_fastx_shard

    i, n = host_shard()
    out_path = f"{prefix}.shard{i}of{n}.paf" if n > 1 else f"{prefix}.paf"
    with open(out_path, "w") as out:
        it = iter_fastx_shard(reads_path, i, n) if n > 1 else None
        if it is None:
            from ..io import fastx

            it = fastx.iter_fastx(reads_path)
        for line in mapper.map_reads(it, batch_size=batch_size):
            out.write(line + "\n")
    return out_path
