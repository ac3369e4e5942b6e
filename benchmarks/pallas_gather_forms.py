"""Mosaic per-lane gather formulations, table+idx in VMEM."""
import sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl

R, C, B = 512, 8, 1024

def run(name, kernel):
    try:
        table = (jnp.arange(R * C, dtype=jnp.float32) % 997).reshape(R, C)
        idx = ((jnp.arange(B, dtype=jnp.int32) * 7) % R)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        )(table, idx)
        want = table[idx]
        ok = bool(jnp.allclose(out, want))
        print(f"{name}: COMPILED, correct={ok}", flush=True)
    except Exception as e:
        msg = " | ".join(str(e).splitlines()[:2])[:200]
        print(f"{name}: FAILED — {msg}", flush=True)

def k_take(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

def k_tala(table_ref, idx_ref, out_ref):
    idx = idx_ref[...]
    out_ref[...] = jnp.take_along_axis(
        table_ref[...], jnp.broadcast_to(idx[:, None], (B, C)).astype(jnp.int32), axis=0)

def k_index(table_ref, idx_ref, out_ref):
    out_ref[...] = table_ref[...][idx_ref[...]]

def k_gather(table_ref, idx_ref, out_ref):
    import jax.lax as lax
    t = table_ref[...]
    idx = idx_ref[...]
    dn = lax.GatherDimensionNumbers(offset_dims=(1,), collapsed_slice_dims=(0,),
                                    start_index_map=(0,))
    out_ref[...] = lax.gather(t, idx[:, None], dn, slice_sizes=(1, C),
                              mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

def k_lane(table_ref, idx_ref, out_ref):
    t = table_ref[...].T            # (C, R)
    idx = idx_ref[...]              # (B,)
    g = jnp.take_along_axis(t, jnp.broadcast_to(idx[None, :], (C, B)).astype(jnp.int32), axis=1)
    out_ref[...] = g.T

for nm, k in [("jnp.take", k_take), ("take_along_axis", k_tala),
              ("advanced-index", k_index), ("lax.gather", k_gather),
              ("transposed tala (lane-dim)", k_lane)]:
    run(nm, k)
