"""tpu.dynamic_gather feasibility + throughput for table-row lookup.

Formulation: operand (R, L) f32, indices (R, L) i32 (per-row index bcast
across lanes), out[i, j] = table[idx[i, j], j] — Mosaic's one supported
gather (lowering.py:2464-2524).  Our nano gather maps onto it by tiling
games into R-sized blocks."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl

def kernel(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=0)

def run(R, L, iters=50):
    table = (jnp.arange(R * L, dtype=jnp.float32) % 997).reshape(R, L)
    idx1 = ((jnp.arange(R, dtype=jnp.int32) * 1103 + 7) % R)
    idx = jnp.broadcast_to(idx1[:, None], (R, L)).astype(jnp.int32)
    f = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32))
    out = f(table, idx)
    want = np.asarray(table)[np.asarray(idx1)]
    ok = np.allclose(np.asarray(out), want)
    # throughput: loop the call; data-dep via fori over the same call
    @jax.jit
    def loop(table, idx):
        def body(i, acc):
            return acc + f(table, (idx + i) % R)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((R, L), jnp.float32))
    r = loop(table, idx); _ = np.asarray(r[:1, :1])
    t0 = time.perf_counter(); r = loop(table, idx); _ = np.asarray(r[:1, :1])
    dt = time.perf_counter() - t0
    rows_per_s = R * iters / dt
    print(f"dynamic_gather R={R} L={L}: correct={ok}  {dt*1e3/iters:.3f} ms/call  "
          f"{rows_per_s:,.0f} rows/s", flush=True)

    # XLA reference gather, same geometry (B=R gathers from (R, L) table)
    @jax.jit
    def xla_loop(table, idx1):
        def body(i, acc):
            return acc + jnp.take(table, (idx1 + i) % R, axis=0)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((R, L), jnp.float32))
    r = xla_loop(table, idx1); _ = np.asarray(r[:1, :1])
    t0 = time.perf_counter(); r = xla_loop(table, idx1); _ = np.asarray(r[:1, :1])
    dt = time.perf_counter() - t0
    print(f"xla take       R={R} L={L}: {dt*1e3/iters:.3f} ms/call  "
          f"{R*iters/dt:,.0f} rows/s", flush=True)

for R in (512, 2048, 8192):
    run(R, 128)
