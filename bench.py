"""Benchmark: HiFi read mapping throughput (reads/s/chip) on one device.

Workload mirrors the reference's headline benchmark shape (SURVEY.md §6: simulated
24kb 99%-accuracy HiFi reads, default-ish params) on a synthetic genome (real genomes
are not available in this environment). Baseline for `vs_baseline`: the reference's
measured aggregate throughput on simulated CHM13 10X — 1,490,410 reads / ~19.9s map
phase on 10 threads ≈ 75,000 reads/s (BASELINE.md, experiments/figure-k-l/k_perf.csv).

Prints exactly one JSON line:
  {"metric": "map_throughput", "value": <reads/s/chip>, "unit": "reads/s/chip",
   "vs_baseline": <value / 75000>, ...extras}
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def measure_device_build():
    """Device-resident build steady MB/s, in a time-boxed subprocess run
    BEFORE this process initializes its own TPU client: the tunnel is
    effectively single-tenant, so a probe running alongside the parent's
    live TPU client systematically underreports (round-2: 11 MB/s contended
    vs 26.6 quiet at 1 GB)."""
    dev_mb_per_s = None
    budget = int(os.environ.get("BENCH_DEVICE_BUILD_TIMEOUT", "900"))
    if budget <= 0:
        return None
    import subprocess

    dev_mb = int(os.environ.get("BENCH_DEVBUILD_MB", "64"))
    log(f"measuring device-build steady MB/s at {dev_mb}MB (subprocess, {budget}s box)")
    code = (
        "import sys, time; sys.path.insert(0, '/root/repo')\n"
        "from mapquik_tpu.params import Params\n"
        "from mapquik_tpu.eval.simulate import markov_genome\n"
        "from mapquik_tpu.index.device_build import build_index_device\n"
        f"g = markov_genome({dev_mb} * 1_000_000, seed=11, n_contigs=2)\n"
        "p = Params(k=7, l=31, density=0.01, max_read_len=1 << 15,\n"
        "           max_minimizers=1 << 9)\n"
        "r = build_index_device(g, p); assert r is not None\n"
        "best = 0.0\n"
        "for _ in range(2):\n"
        "    t0 = time.time(); r = build_index_device(g, p); n = r[0].n\n"
        f"    best = max(best, {dev_mb} / (time.time() - t0))\n"
        "print('STEADY', best, n)\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=budget, env=os.environ.copy(),
        )
        for line in out.stdout.splitlines():
            if line.startswith("STEADY"):
                dev_mb_per_s = round(float(line.split()[1]), 1)
        log(f"device-build steady: {dev_mb_per_s} MB/s at {dev_mb}MB")
    except Exception as e:
        log(f"device-build measurement skipped ({type(e).__name__}: slow relay phase)")
    return dev_mb_per_s


def _tpu_available() -> bool:
    """Probe the tunneled TPU backend in time-boxed subprocesses: its init
    HANGS (not errors) during outages, which would otherwise hang the whole
    bench. Two stages so an outage fails FAST without misclassifying a
    slow-compile relay phase: (1) device enumeration (~5-10 s healthy; a hang
    here = outage, 120 s budget), then (2) a trivial jit (can ride a slow
    relay phase — observed 187 s for a trivial compile — 600 s budget)."""
    import subprocess

    def _run(code, budget):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=budget, env=os.environ.copy(),
            )
            return "TPU_OK" in out.stdout
        except Exception:
            return False

    enum_budget = int(os.environ.get("BENCH_TPU_PROBE_TIMEOUT", "120"))
    if not _run("import jax; print('TPU_OK', jax.devices()[0])", enum_budget):
        return False
    return _run(
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()[0]\n"
        "float(jnp.ones((8, 8)).sum())\n"
        "print('TPU_OK', d)\n",
        int(os.environ.get("BENCH_TPU_JIT_PROBE_TIMEOUT", "600")),
    )


def _cached_inputs(genome_mb, n_reads):
    """Pre-simulated inputs cached on disk so bench time is spent measuring,
    not simulating (round-3 verdict item 7). Fixed seeds make the cached and
    fresh inputs bit-identical, so BOTH express and full mode can use this
    safely. The FULL simulation parameter set is stored inside the pickle and
    validated on load (ADVICE r4: a filename-only key silently served stale
    inputs if the hardcoded sim constants or the simulator changed)."""
    import pickle

    sim_params = dict(
        genome_mb=genome_mb, n_reads=n_reads, genome_seed=11, read_seed=12,
        n_contigs=4, mean_len=24_000, accuracy=0.99, sim_version=1,
    )
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    path = os.path.join(d, f"inputs_g{genome_mb}_r{n_reads}_s11_12.pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict) and payload.get("params") == sim_params:
            log(f"loaded cached inputs ({path})")
            return payload["genome"], payload["reads"]
        log(f"cached inputs stale (params mismatch at {path}); regenerating")
    from mapquik_tpu.eval.simulate import markov_genome, simulate_reads

    genome = markov_genome(genome_mb * 1_000_000, seed=11, n_contigs=4)
    reads = simulate_reads(genome, n_reads, mean_len=24_000, accuracy=0.99, seed=12)
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"params": sim_params, "genome": genome, "reads": reads}, f)
    log("simulated + cached inputs")
    return genome, reads


def main():
    t_start = time.time()
    platform_note = None
    express = os.environ.get("BENCH_EXPRESS") == "1"
    if not _tpu_available():
        # TPU outage fallback: still emit a valid (clearly marked) JSON line
        # on CPU rather than hanging/crashing with no record at all
        log("TPU backend unavailable (probe timed out) — falling back to CPU")
        platform_note = "cpu-fallback (TPU unavailable at bench time)"
        # the fallback's only job is the honest marker: a MINIMAL CPU workload
        # (the perf numbers are near-meaningless on CPU, so spend seconds on
        # them, not minutes — round-3 verdict weak #7)
        os.environ["BENCH_DEVICE_BUILD_TIMEOUT"] = "0"
        os.environ.setdefault("BENCH_GENOME_MB", "2")
        os.environ.setdefault("BENCH_READS", "1024")  # whole dispatch groups
        import jax

        jax.config.update("jax_platforms", "cpu")
    fallback = platform_note is not None
    dev_mb_per_s = measure_device_build()
    import jax
    import jax.numpy as jnp

    from mapquik_tpu.params import Params
    from mapquik_tpu.eval.mapeval import evaluate_paf
    from mapquik_tpu.index.build import build_index
    from mapquik_tpu.ops.pipeline import (
        Mapper, format_paf, unflatten_map_result,
    )
    from mapquik_tpu.io.native import encode_any

    # 16MB default keeps the cold-start index build well inside the driver's
    # budget even when the remote compile relay is in a slow phase (observed
    # variance: same program 9s..300s); BENCH_GENOME_MB=32+ for bigger runs
    genome_mb = int(os.environ.get("BENCH_GENOME_MB", "16"))
    # 16384 reads (64 batches): the timed map pass ends in ONE tiny d2h pull
    # whose fixed ~30-130 ms tunnel latency is workload-independent — at 4096
    # reads it taxed the headline ~25% (gsweep r5: pass 153 ms = 16x6.4 ms
    # compute + ~50 ms pull, flat across G=4/8/16), which the reference's
    # 1.49M-read measurement never pays. 64 batches amortize it to ~3%.
    n_reads = int(os.environ.get("BENCH_READS", "16384"))
    B = int(os.environ.get("BENCH_BATCH", "256"))
    p = Params(
        k=7, l=31, density=0.01,  # human-scale headline params (table1.sh k=7 l=31 d=0.01)
        batch_size=B,  # length bins / caps: honest defaults (see Params)
    )
    # fixed headline shape: every read padded to the 32 kb fast-path bin at
    # seed cap 512 (clipped reads are COUNTED in extras and stay ~0 for this
    # 24 kb-mean workload; the e2e path below uses the honest per-bin caps)
    CAP = 1 << 9
    L_HEAD = 1 << 15

    log(f"device {jax.devices()[0]}; genome {genome_mb}MB, {n_reads} reads, B={B}"
        + (" [express]" if express else ""))
    genome, reads = _cached_inputs(genome_mb, n_reads)

    # pack + STAGE all batches BEFORE anything executes a program: uploads in
    # the pre-execution transfer mode run at GB/s, while any upload after the
    # first executable runs costs ~24 ms/call + ~24-35 MB/s for the process
    # lifetime (experiments/r5_transfer_modes.md) — staging 16384 reads'
    # 512 MB of raw codes after the index build would burn ~20 s. Host prep
    # is excluded from steady-state timing either way; batches dispatch in
    # groups of G per compiled program (see Params.dispatch_group).
    L = L_HEAD
    Gd = p.dispatch_group
    assert (n_reads // B) % Gd == 0, "BENCH_READS must cover whole dispatch groups"
    log("packing + staging read batches (pre-execution fast h2d)")
    groups = []
    for i in range(0, n_reads, B * Gd):
        codes = np.full((Gd, B, L), 4, np.uint8)
        lens = np.zeros((Gd, B), np.int32)
        nm = []
        for g in range(Gd):
            chunk = reads[i + g * B : i + (g + 1) * B]
            nm.append([name for name, _ in chunk])
            for j, (name, seq) in enumerate(chunk):
                c = encode_any(seq)[:L]
                codes[g, j, : len(c)] = c
                lens[g, j] = len(c)
        groups.append((jnp.asarray(codes), jnp.asarray(lens), nm))
    jax.block_until_ready([g[0] for g in groups])
    log("batches staged on device; building index")

    # host-path build for the map benchmark (one compile, bounded cold time);
    # the device-resident builder's compile chain goes through the remote relay
    # whose first-compile cost swings 10..500 s by phase — it is measured in a
    # TIME-BOXED SUBPROCESS below so a slow relay phase can never hang the bench
    t0 = time.time()
    index = meta = None
    if express:
        # express: the cold build is served from the index disk cache (the
        # steady-state rebuild below is still timed live)
        from mapquik_tpu.index.serialize import save_index, load_index, params_key

        ipath = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".bench_cache",
            f"index_g{genome_mb}.npz",
        )
        pk = params_key(p)
        if os.path.exists(ipath):
            try:
                index, meta = load_index(ipath, pk)
                index = jax.tree.map(lambda x: jax.block_until_ready(x), index)
                log("express: index loaded from disk cache")
            except Exception as e:
                log(f"express: index cache miss ({type(e).__name__}); rebuilding")
                index = None
    if index is None:
        index, meta = build_index(genome, p, verbose=log, device=False)
        index = jax.tree.map(lambda x: jax.block_until_ready(x), index)
        if express:
            os.makedirs(os.path.dirname(ipath), exist_ok=True)
            save_index(ipath, index, meta, pk)
    index_s = time.time() - t0
    log(f"index built: {index.n} k-min-mers in {index_s:.1f}s (cold); rebuilding for steady-state")
    t0 = time.time()
    index2, _ = build_index(genome, p, device=False)
    jax.block_until_ready(jax.tree.leaves(index2))
    index_steady_s = time.time() - t0
    del index2
    log(f"steady host-path rebuild {index_steady_s:.2f}s "
        f"({genome_mb / index_steady_s:.1f} MB/s)")
    ref_lens = jnp.asarray(meta.lengths.astype(np.int32))

    # warmup/compile — resolved through the AOT executable cache when
    # available (a warm cache turns the relay's 10-300 s first compile into a
    # ~1-2 s deserialize; utils/aot.py)
    log(f"compiling map_batch (G={Gd})")
    from mapquik_tpu.ops.pipeline import _flat_multi_program_fn
    from mapquik_tpu.utils.aot import cached_program

    ex_args = (groups[0][0], groups[0][1], index, ref_lens)
    prog = cached_program(
        f"bench_map_flat_c{CAP}_G{Gd}", _flat_multi_program_fn(p, CAP, Gd),
        ex_args, statics_key=(repr(p), CAP, Gd),
    )

    def run_map(codes, lens):
        return prog(codes, lens, index, ref_lens)

    res = run_map(groups[0][0], groups[0][1])
    jax.block_until_ready(res)
    log("map_batch compiled; timing steady state")

    # best of 3 timed passes: the relay adds phase-dependent latency spikes
    # (a single d2h pull can cost 0.03..0.3 s), so one unlucky pull must not
    # define the headline. Each pass chains ALL group dispatches and ends with
    # ONE tiny pull of the last result — programs execute in order on the
    # single device stream, so the last completing implies all did
    # (block_until_ready alone does not await remote execution here).
    map_s = 1e9
    for _ in range(1 if fallback else 3):
        t0 = time.time()
        results = []
        for codes, lens, nm in groups:
            results.append(run_map(codes, lens))
        jax.block_until_ready(results)
        np.asarray(results[-1][0, :2])
        map_s = min(map_s, time.time() - t0)
    reads_per_s = n_reads / map_s

    # accuracy sanity on the same run; count seed-cap-clipped reads so the
    # headline's fixed cap is honest (the streaming Mapper re-maps clipped
    # reads exactly; here they are counted and must stay ~0)
    paf = []
    n_clipped = 0
    clipped_names = set()
    for (codes, lens, nm), res in zip(groups, results):
        flat_h = np.asarray(res)
        lens_h = np.asarray(lens)
        for g in range(Gd):
            mr = unflatten_map_result(flat_h[g])
            ovf = np.asarray(mr.overflow)[: len(nm[g])]
            n_clipped += int(ovf.sum())
            clipped_names.update(n for n, o in zip(nm[g], ovf) if o)
            paf.extend(format_paf(nm[g], [int(x) for x in lens_h[g]], mr, meta))
    if clipped_names:
        # a clipped read's PAF line may be wrong (the streaming Mapper re-maps
        # these; the fixed-cap headline path does not) — exclude them from the
        # accuracy evaluation and report the count loudly instead of letting
        # possibly-wrong lines degrade q60 silently (ADVICE r3)
        log(f"WARNING: {n_clipped} seed-cap-clipped reads excluded from accuracy eval")
        paf = [ln for ln in paf if ln.split("\t", 1)[0] not in clipped_names]
    ev = evaluate_paf(paf, n_reads=n_reads - n_clipped)

    # end-to-end throughput: raw (name, seq) records through the full Mapper
    # (host packing + dispatch + PAF text), i.e. what a CLI user gets
    log("timing end-to-end Mapper path (host included)")
    mapper = Mapper.from_index(index, meta, p)
    n_e2e_lines = sum(1 for _ in mapper.map_reads(reads))  # warm bins/compiles
    e2e_s = 1e9
    for _ in range(1 if fallback else 2):  # best of 2: single-core host timing is noisy
        t0 = time.time()
        n_e2e_lines = sum(1 for _ in mapper.map_reads(reads))
        e2e_s = min(e2e_s, time.time() - t0)
    log(f"e2e: {n_reads / e2e_s:.0f} reads/s ({n_e2e_lines} PAF lines)")

    print(
        json.dumps(
            {
                "metric": "map_throughput",
                "value": round(reads_per_s, 1),
                "unit": "reads/s/chip",
                "vs_baseline": round(reads_per_s / 75000.0, 4),
                "extras": {
                    "device": str(jax.devices()[0]),
                    **({"platform_note": platform_note} if platform_note else {}),
                    **({"express": True} if express else {}),
                    "genome_mb": genome_mb,
                    "n_reads": n_reads,
                    "batch": B,
                    "map_s": round(map_s, 3),
                    "e2e_reads_per_s": round(n_reads / e2e_s, 1),
                    "index_build_s": round(index_s, 2),
                    "index_steady_s": round(index_steady_s, 2),
                    "index_mb_per_s_steady_host": round(genome_mb / index_steady_s, 1),
                    "index_mb_per_s_steady_device": dev_mb_per_s,
                    "index_kminmers": int(index.n),
                    "clipped_reads": n_clipped,
                    "mapped_frac": round(ev.n_mapped / max(1, n_reads), 4),
                    "wrong": ev.n_wrong,
                    "q60": ev.q60_total,
                    "q60_wrong": ev.q60_wrong,
                    "total_s": round(time.time() - t_start, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
