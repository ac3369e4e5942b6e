"""Decompose per-step cost on the TPU: RNG draws vs arithmetic vs gathers."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
STEPS = 360
print("devices:", jax.devices(), "B:", B, flush=True)


def timed(name, fn, *args):
    g = jax.jit(fn)                 # ONE jit wrapper: a fresh jax.jit per
    out = g(*args)                  # call would recompile and poison timing
    _ = np.asarray(out).ravel()[:4]
    t0 = time.perf_counter()
    out = g(*args)
    _ = np.asarray(out).ravel()[:4]
    dt = time.perf_counter() - t0
    print(f"{name:28s} {dt:7.3f}s  ({dt/STEPS*1e3:6.2f} ms/step)", flush=True)
    return dt


key0 = jax.random.PRNGKey(0)


def rng_threefry(key):
    def step(c, k):
        ku, kn = jax.random.split(k)
        u = jax.random.uniform(ku, (B, 13))
        n = jax.random.normal(kn, (B, 4))
        return c + u.sum() + n.sum(), None
    keys = jax.random.split(key, STEPS)
    out, _ = jax.lax.scan(step, 0.0, keys)
    return out


def rng_rbg(key):
    raw = jnp.tile(jax.random.key_data(jax.random.wrap_key_data(key)), 2)[:4] \
        if key.dtype == jnp.uint32 else None
    k = jax.random.wrap_key_data(key.reshape(-1).astype(jnp.uint32).repeat(2)[:4], impl="rbg")
    def step(c, kk):
        ku, kn = jax.random.split(kk)
        u = jax.random.uniform(ku, (B, 13))
        n = jax.random.normal(kn, (B, 4))
        return c + u.sum() + n.sum(), None
    keys = jax.random.split(k, STEPS)
    out, _ = jax.lax.scan(step, 0.0, keys)
    return out


def arith_only(x):
    def step(c, _):
        y = c
        for i in range(40):
            y = jnp.where(y > 0.5, y * 0.98 + 0.01, y * 1.02)
        return y, None
    out, _ = jax.lax.scan(step, x, jnp.arange(STEPS))
    return out


def gather_only(tab, idx):
    rows = tab.shape[0]
    def step(c, k):
        i = (idx + k * 9973) % rows
        v = jnp.take(tab, i, axis=0)
        return c + v.sum(axis=1), None
    out, _ = jax.lax.scan(step, jnp.zeros(B), jnp.arange(STEPS))
    return out


timed("threefry 17 draws/step", rng_threefry, key0)
timed("rbg 17 draws/step", rng_rbg, key0)
timed("arith 40 where-chains", arith_only, jnp.linspace(0, 1, B))
tab = jnp.asarray(np.random.rand(3_400_000, 8).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, 3_400_000, B, dtype=np.int32))
timed("1 fused-row gather/step", gather_only, tab, idx)
