"""Can Mosaic do per-lane dynamic gathers from a VMEM table, and how fast?

Compares XLA jnp.take vs a Pallas kernel holding the table in VMEM.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 131072
ROWS = 58320 * 2          # turbo fused table size
CH = 8
STEPS = 360

tab = jnp.asarray(np.random.rand(ROWS, CH).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, ROWS, B, dtype=np.int32))


def xla_loop(tab, idx):
    def step(c, k):
        i = (idx + k * 9973) % ROWS
        return c + jnp.take(tab, i, axis=0, mode="clip").sum(axis=1), None
    return jax.lax.scan(step, jnp.zeros(B), jnp.arange(STEPS))[0]


def gather_kernel(tab_ref, idx_ref, out_ref):
    rows = tab_ref[...]               # (ROWS, CH) in VMEM
    ii = idx_ref[...]                 # (B,) int32
    out_ref[...] = jnp.take(rows, ii, axis=0).sum(axis=1)


@jax.jit
def pallas_gather(tab, idx):
    return pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


def timed(name, g, *args):
    out = g(*args)
    _ = np.asarray(out).ravel()[:2]
    t0 = time.perf_counter()
    out = g(*args)
    _ = np.asarray(out).ravel()[:2]
    dt = time.perf_counter() - t0
    print(f"{name:24s} {dt:8.4f}s", flush=True)


print("devices:", jax.devices(), flush=True)
try:
    timed("pallas VMEM gather x1", pallas_gather, tab, idx)
    def pallas_loop(tab, idx):
        def step(c, k):
            return c + pallas_gather(tab, (idx + k * 9973) % ROWS), None
        return jax.lax.scan(step, jnp.zeros(B), jnp.arange(STEPS))[0]
    timed("pallas loop x360", jax.jit(pallas_loop), tab, idx)
except Exception as e:
    print("PALLAS GATHER UNSUPPORTED:", type(e).__name__, str(e)[:300], flush=True)
timed("xla loop x360", jax.jit(xla_loop), tab, idx)
