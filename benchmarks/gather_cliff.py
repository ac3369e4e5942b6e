"""Map the TPU gather cost vs table row count (1 gather/step, 360 steps)."""
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


def scan_gather(rows, n_gathers=1):
    table = jnp.arange(rows * C, dtype=jnp.float32).reshape(rows, C)

    def fn(idx):
        def step(c, _):
            acc = c
            for g in range(n_gathers):
                r = jnp.take(table, (idx + c.astype(jnp.int32) + g) % rows,
                             axis=0, mode="clip")
                acc = acc + r[:, 0] * 1e-12
            return acc, None
        out, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), None,
                              length=STEPS)
        return out
    return fn


key = jax.random.PRNGKey(0)
for rows in (2048, 8192, 16384, 32768, 65536, 131072, 262144, 524288):
    idx = jax.random.randint(key, (B,), 0, rows)
    g = jax.jit(scan_gather(rows))
    out = g(idx)
    _ = np.asarray(out)[:4]
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = g(idx)
        _ = np.asarray(out)[:4]
        best = min(best, time.perf_counter() - t0)
    print(f"rows={rows:8d}  {best:7.3f}s  ({best/STEPS*1e3:6.3f} ms/step)",
          flush=True)

# 10 gathers from small tables (the decomposed-table scenario)
for rows, ng in ((4096, 10), (8192, 10), (16384, 10)):
    idx = jax.random.randint(key, (B,), 0, rows)
    g = jax.jit(scan_gather(rows, ng))
    out = g(idx)
    _ = np.asarray(out)[:4]
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = g(idx)
        _ = np.asarray(out)[:4]
        best = min(best, time.perf_counter() - t0)
    print(f"rows={rows:8d} x{ng} gathers  {best:7.3f}s  ({best/STEPS*1e3:6.3f} ms/step)",
          flush=True)
