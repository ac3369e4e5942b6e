"""Probe: does batch layout explain the 6.5 ms/step elementwise cost?

Hypotheses (CLAUDE.md perf map):
  H1  (B,) 1-D state arrays use only 1 of 8 VPU sublanes -> reshaping the
      trial batch to (B//128, 128) should speed elementwise chains ~8x.
  H2  XLA gather runs ~1e8 rows/s; a one-hot matmul on the MXU (f32) should
      beat it for VMEM-sized tables.

Each variant runs a 360-step scan so per-step cost is comparable with the
production engine numbers (~6.5 ms elementwise + ~2.5 ms gather @ 262k).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
STEPS = 360
R = 4096   # table rows
C = 8      # table channels
print("devices:", jax.devices(), "B:", B, flush=True)


def timed(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    _ = np.asarray(out).ravel()[:4]
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = g(*args)
        _ = np.asarray(out).ravel()[:4]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best:7.3f}s  ({best/STEPS*1e3:6.2f} ms/step)", flush=True)
    return best


def chain40(shape):
    """40 dependent elementwise ops per step on `shape`-shaped state."""
    def fn(x):
        def step(c, _):
            y = c
            for _ in range(40):
                y = jnp.where(y > 0.5, y * 0.98 + 0.01, y * 1.02)
            return y, None
        out, _ = jax.lax.scan(step, x, None, length=STEPS)
        return out
    return fn


def mixed_state(shape):
    """Closer to the play step: masks, int ops, selects over 8 state arrays."""
    def fn(sec, down, dist, ytg, u):
        def step(carry, _):
            sec, down, dist, ytg = carry
            for _ in range(5):
                is4 = down == 4
                first = dist <= 2.0
                gain = jnp.clip(4.2 + 0.3 * dist, 0.0, ytg)
                ytg2 = jnp.maximum(0.0, ytg - gain)
                down2 = jnp.where(first, 1, down + 1)
                flip = is4 & (u > 0.5)
                ytg = jnp.where(flip, 100.0 - ytg2, ytg2)
                down = jnp.where(flip, 1, down2)
                dist = jnp.where(flip, 10.0, dist - gain * 0.1)
                sec = jnp.maximum(0, sec - jnp.where(is4, 6, 28))
            return (sec, down, dist, ytg), None
        (sec, down, dist, ytg), _ = jax.lax.scan(
            step, (sec, down, dist, ytg), None, length=STEPS)
        return ytg
    return fn


def gather_scan(idx_shape):
    def fn(table, idx):
        def step(c, _):
            rows = jnp.take(table, idx, axis=0, mode="clip")
            return c + rows.sum(axis=-1), None
        out, _ = jax.lax.scan(step, jnp.zeros(idx.shape, jnp.float32), None,
                              length=STEPS)
        return out
    return fn


def onehot_matmul_scan():
    """Gather via one-hot @ table on the MXU, f32."""
    def fn(table, idx):
        def step(c, _):
            oh = (idx[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.float32)
            rows = jax.lax.dot_general(
                oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return c + rows.sum(axis=-1), None
        out, _ = jax.lax.scan(step, jnp.zeros(idx.shape, jnp.float32), None,
                              length=STEPS)
        return out
    return fn


key = jax.random.PRNGKey(0)
x1 = jax.random.uniform(key, (B,))
x2 = x1.reshape(B // 128, 128)
x3 = x1.reshape(B // 512, 512)

timed("chain40 (B,)", chain40((B,)), x1)
timed("chain40 (B/128,128)", chain40((B // 128, 128)), x2)
timed("chain40 (B/512,512)", chain40((B // 512, 512)), x3)

sec = jnp.full((B,), 3600, jnp.int32)
down = jnp.ones((B,), jnp.int32)
dist = jnp.full((B,), 10.0)
ytg = jnp.full((B,), 75.0)
u = x1
timed("mixed (B,)", mixed_state((B,)), sec, down, dist, ytg, u)
sh = (B // 128, 128)
timed("mixed (B/128,128)", mixed_state(sh), sec.reshape(sh), down.reshape(sh),
      dist.reshape(sh), ytg.reshape(sh), u.reshape(sh))

table = jax.random.uniform(key, (R, C))
idx = jax.random.randint(key, (B,), 0, R)
timed("gather (B,) idx", gather_scan((B,)), table, idx)
timed("gather (B/128,128) idx", gather_scan(sh), table, idx.reshape(sh))
timed("onehot-matmul (B/128,128)", onehot_matmul_scan(), table, idx.reshape(sh))
