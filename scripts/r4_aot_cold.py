"""Cross-session proof of the AOT executable cache (round-3 verdict item 8).

Measures COLD-PROCESS start-to-first-batch latency for the flagship Mapper
programs (map group G=4 + seeding-extract), uncached vs disk-cached, in
separate child processes — i.e. the actual cold-start scenario the cache
exists for (the reference is an AOT Rust binary with zero compile latency).
Run it twice in different relay phases for the verdict's two-phase capture;
each run APPENDS to experiments/aot_cold_start.json.

  python scripts/r4_aot_cold.py [--tag phaseA]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

T0 = time.time()


def log(m):
    print(f"[aotcold +{time.time() - T0:6.1f}s] {m}", file=sys.stderr, flush=True)


_CHILD = r"""
import os, sys, time
T0 = time.time()
sys.path.insert(0, "/root/repo")
import numpy as np
from mapquik_tpu.params import Params
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.index.serialize import save_index, load_index, params_key
from mapquik_tpu.index.build import build_index
from mapquik_tpu.ops.pipeline import Mapper

p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15,
           max_minimizers=1 << 9, batch_size=256)
genome = markov_genome(8_000_000, seed=11, n_contigs=2)
reads = simulate_reads(genome, 1024, mean_len=24_000, accuracy=0.99, seed=12)
cache = os.environ["AOTCOLD_INDEX"]
pk = params_key(p)
if os.path.exists(cache):
    index, meta = load_index(cache, pk)
else:
    index, meta = build_index(genome, p, device=False)
    save_index(cache, index, meta, pk)
t_index = time.time() - T0
mapper = Mapper.from_index(index, meta, p)
it = mapper.map_reads(reads)
first = next(it)
t_first = time.time() - T0
n = 1 + sum(1 for _ in it)
t_all = time.time() - T0
print(f"CHILD {t_index:.2f} {t_first:.2f} {t_all:.2f} {n}")
"""


def run_child(aot_dir, index_cache):
    env = os.environ.copy()
    env["MAPQUIK_AOT_DIR"] = aot_dir
    env["AOTCOLD_INDEX"] = index_cache
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", _CHILD], capture_output=True, text=True,
        timeout=1800, env=env,
    )
    wall = time.time() - t0
    if out.returncode != 0:
        log(f"child FAILED: {out.stderr[-2000:]}")
        raise SystemExit(1)
    line = [l for l in out.stdout.splitlines() if l.startswith("CHILD")][0]
    _, t_index, t_first, t_all, n = line.split()
    return {
        "wall_s": round(wall, 2),
        "index_ready_s": float(t_index),
        "first_batch_s": float(t_first),
        "all_1024_s": float(t_all),
        "paf_lines": int(n),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="")
    args = ap.parse_args()
    import jax

    dev = str(jax.devices()[0])
    log(f"device {dev}")
    tmp = tempfile.mkdtemp(prefix="aotcold_")
    index_cache = os.path.join(tmp, "index.npz")
    # run 0 builds + saves the index with the cache pointed elsewhere, so BOTH
    # measured runs load the same index from disk and differ only in the AOT
    # cache state of the Mapper's dispatch programs
    log("run 0: building the shared index (not measured)")
    run_child(os.path.join(tmp, "aot_prewarm"), index_cache)
    log("run 1: cold process, EMPTY AOT cache (pays the relay compiles)")
    cold = run_child(os.path.join(tmp, "aot"), index_cache)
    log(f"  uncached: first batch at {cold['first_batch_s']:.1f}s "
        f"(wall {cold['wall_s']:.1f}s)")
    log("run 2: cold process, WARM AOT cache (deserialize only)")
    warm = run_child(os.path.join(tmp, "aot"), index_cache)
    log(f"  cached:   first batch at {warm['first_batch_s']:.1f}s "
        f"(wall {warm['wall_s']:.1f}s)")
    speedup = cold["first_batch_s"] / max(warm["first_batch_s"], 1e-9)
    log(f"start-to-first-batch speedup: {speedup:.1f}x")

    path = "experiments/aot_cold_start.json"
    entries = []
    if os.path.exists(path):
        with open(path) as f:
            entries = json.load(f)
    entries.append({
        "tag": args.tag,
        "device": dev,
        "uncached": cold,
        "cached": warm,
        "first_batch_speedup": round(speedup, 1),
    })
    os.makedirs("experiments", exist_ok=True)
    with open(path, "w") as f:
        json.dump(entries, f, indent=1)
    log(f"artifact appended: {path}")


if __name__ == "__main__":
    main()
