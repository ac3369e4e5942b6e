"""Per-row DMA gather, 8-row-aligned blocks (Mosaic min block)."""
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 16384, 128

def kernel(idx_ref, blk_ref, out_ref):
    i = pl.program_id(0)
    r = idx_ref[i] % 8
    row = blk_ref[pl.ds(r, 1), :]     # (1, C)
    out_ref[...] = jnp.broadcast_to(row, (8, C))

def run(B):
    table = (jnp.arange(R * C, dtype=jnp.float32) % 997).reshape(R, C)
    idx = ((jnp.arange(B, dtype=jnp.int32) * 1103 + 7) % R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((8, C), lambda i, idx_ref: (idx_ref[i] // 8, 0))],
        out_specs=pl.BlockSpec((8, C), lambda i, idx_ref: (i, 0)),
    )
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((8 * B, C), jnp.float32))
    out = np.asarray(f(idx, table))
    want = np.asarray(table)[np.asarray(idx)]
    ok = np.allclose(out[::8], want)
    g = jax.jit(lambda idx, t: f(idx, t))
    _ = np.asarray(g(idx, table)[:1, :1])
    t0 = time.perf_counter()
    for _ in range(5):
        r = g(idx, table)
    _ = np.asarray(r[:1, :1])
    dt = (time.perf_counter() - t0) / 5
    print(f"DMA-per-row B={B}: correct={ok}  {dt*1e3:.2f} ms  "
          f"{B/dt:,.0f} rows/s", flush=True)

run(1024)
run(8192)
