"""Gather cost vs table size and count, without int-mod pollution.

Indices vary per step (scalar XOR — cheap, defeats loop hoisting) and land
in-range via bitwise AND with rows-1 (pow2 tables).
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
STEPS = 360
C = 8
print("devices:", jax.devices(), "B:", B, flush=True)


def bench(rows, n_gathers, chans=C):
    tables = [jnp.arange(rows * chans, dtype=jnp.float32).reshape(rows, chans)
              * (g + 1) for g in range(n_gathers)]

    def fn(idx):
        def step(c, i):
            pert = idx ^ i          # varies per step, 1 cheap op
            pert = pert & (rows - 1)
            acc = c
            for t in tables:
                acc = acc + jnp.take(t, pert, axis=0, mode="clip")[:, 0] * 1e-12
            return acc, None
        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32),
                              jnp.arange(STEPS, dtype=jnp.int32))
        return out

    idx = jax.random.randint(jax.random.PRNGKey(0), (B,), 0, rows)
    g = jax.jit(fn)
    out = g(idx)
    _ = np.asarray(out)[:4]
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = g(idx)
        _ = np.asarray(out)[:4]
        best = min(best, time.perf_counter() - t0)
    print(f"rows={rows:8d} x{n_gathers:2d}g c{chans:2d}  {best:7.3f}s "
          f"({best/STEPS*1e3:6.3f} ms/step)", flush=True)
    return best


bench(4096, 0)   # loop floor
for rows in (4096, 16384, 65536, 262144, 2097152):
    bench(rows, 1)
for ng in (2, 4, 8):
    bench(4096, ng)
bench(16384, 1, chans=16)
bench(16384, 1, chans=32)
