"""AOT executable cache (utils/aot.py): correctness of the cache machinery.

The cache is single-device-only (multi-device executables' input shardings
don't match plain jit calls), so under this suite's 8-device virtual mesh it
must be a transparent no-op — and the machinery itself is exercised in a
clean single-device CPU subprocess. The real win is the TPU relay's 10-300 s
first-compile (measured in scripts/r3_aot_probe.py: deserialize+run 1.6 s vs
21.4 s fresh jit of the same program)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from mapquik_tpu.utils import aot


def test_disabled_under_virtual_mesh(monkeypatch, tmp_path):
    """8 virtual devices -> cache must decline even when forced on."""
    monkeypatch.setenv("MAPQUIK_AOT", "1")
    monkeypatch.setenv("MAPQUIK_AOT_DIR", str(tmp_path))
    assert len(jax.devices()) == 8
    assert not aot.enabled()

    @jax.jit
    def fn(x):
        return x + 1

    assert aot.cached_program("t_mesh", fn, (jnp.zeros(4),)) is fn
    assert not list(tmp_path.iterdir())


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("MAPQUIK_AOT", "0")

    @jax.jit
    def fn(x):
        return x

    assert aot.cached_program("t_off", fn, (jnp.zeros(1),)) is fn


def test_key_invalidation(monkeypatch):
    """A source edit (new source hash) or a compile-affecting env knob
    (MAPQUIK_CBLK — ADVICE r3) must change the cache key; equal inputs must
    not."""
    from mapquik_tpu.ops import pallas_seeding

    args = (jnp.zeros((4, 8), jnp.int32),)
    base = aot._key("t", args, ("s",))
    assert aot._key("t", args, ("s",)) == base
    assert aot._key("t", args, ("other",)) != base
    assert aot._key("t2", args, ("s",)) != base
    assert aot._key("t", (jnp.zeros((4, 16), jnp.int32),), ("s",)) != base
    monkeypatch.setattr(aot, "_SOURCE_HASH", "deadbeefdeadbeef")
    assert aot._key("t", args, ("s",)) != base, "source edit must invalidate"
    monkeypatch.undo()
    monkeypatch.setattr(pallas_seeding, "_CBLK", pallas_seeding._CBLK * 2)
    assert aot._key("t", args, ("s",)) != base, "CBLK change must invalidate"


_SUBPROC = r"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from mapquik_tpu.utils import aot

assert len(jax.devices()) == 1
assert aot.enabled()

@jax.jit
def fn(x, y):
    return jnp.sort(x * y, axis=1)

x = jnp.asarray(np.arange(32, dtype=np.int32).reshape(4, 8))
y = jnp.asarray(np.full((4, 8), 3, np.int32))
# want computed with numpy: executing the jit BEFORE lower().compile() makes
# the (cached) executable non-serializable ("`LessThan` is not serializable")
want = np.sort(np.asarray(x) * np.asarray(y), axis=1)

prog = aot.cached_program("t_roundtrip", fn, (x, y))
np.testing.assert_array_equal(np.asarray(prog(x, y)), want)
import glob
files = glob.glob(os.path.join(os.environ["MAPQUIK_AOT_DIR"], "t_roundtrip-*.bin"))
assert len(files) == 1, files

# cache hit must not recompile: poison lower()
class Boom:
    def lower(self, *a, **k):
        raise AssertionError("cache hit must not lower/compile")

prog2 = aot.cached_program("t_roundtrip", Boom(), (x, y))
np.testing.assert_array_equal(np.asarray(prog2(x, y)), want)

# distinct shapes / statics produce distinct entries
@jax.jit
def fn2(x):
    return x + 1

aot.cached_program("t_key", fn2, (jnp.zeros((2, 3), jnp.int32),))
aot.cached_program("t_key", fn2, (jnp.zeros((4, 3), jnp.int32),))
aot.cached_program("t_key", fn2, (jnp.zeros((2, 3), jnp.int32),), statics_key=("o",))
assert len(glob.glob(os.path.join(os.environ["MAPQUIK_AOT_DIR"], "t_key-*.bin"))) == 3

# corrupt entry falls back to recompile
(f,) = files
open(f, "wb").write(b"garbage")
prog3 = aot.cached_program("t_roundtrip", fn, (x, y))
np.testing.assert_array_equal(np.asarray(prog3(x, y)), want)

# end-to-end: the Mapper dispatch path through cached executables
from mapquik_tpu.eval.simulate import markov_genome, simulate_reads
from mapquik_tpu.ops.pipeline import Mapper
from mapquik_tpu.params import Params

p = Params.auto(k=5, l=21, density=0.05, max_read_len=2048,
                length_bins=(), batch_size=8, dispatch_group=2)
genome = markov_genome(200_000, seed=3, n_contigs=2)
reads = simulate_reads(genome, 24, mean_len=1200, accuracy=0.99, seed=4)
m = Mapper(genome, p)
lines = list(m.map_reads(reads))
assert len(lines) >= 20, len(lines)
assert glob.glob(os.path.join(os.environ["MAPQUIK_AOT_DIR"], "map_*.bin"))
m2 = Mapper(genome, p)
assert list(m2.map_reads(reads)) == lines
print("SUBPROC_OK")
"""


def test_machinery_single_device_subprocess(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # JAX_PLATFORMS=cpu must be set as an ENV VAR here: without it the
    # sitecustomize-pinned backend plugin loads first and its CPU client
    # cannot serialize sort comparators ("`LessThan` is not serializable")
    env["JAX_PLATFORMS"] = "cpu"
    env["MAPQUIK_AOT"] = "1"
    env["MAPQUIK_AOT_DIR"] = str(tmp_path)
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC], capture_output=True, text=True,
        timeout=420, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "SUBPROC_OK" in out.stdout
