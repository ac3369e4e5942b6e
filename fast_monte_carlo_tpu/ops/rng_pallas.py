"""Pallas play-step RNG: the 13-uniform + 4-normal block in one kernel.

The engine's per-step draws cost ~0.12 ms at B=131k with threefry
(benchmarks/step_breakdown.py) — ~18% of the whole nano play step.  The
TPU's hardware PRNG (`pltpu.prng_random_bits`) generates the same block in
one pass; normals come from Box–Muller on two of the raw uniform lanes.

Streams are counter-based and layout-independent in the same sense as the
threefry path: the seed is derived from (base key, step index) and the
per-row lane comes from the grid position, so a game's draws depend only
on (key, step, row).  Distributional-only equivalence with the threefry
engine (same contract as rbg, SURVEY §3.5).

Selected with cfg.engine.rng_impl == "pallas".  On CPU backends the kernel
runs in interpreter mode so the full test suite stays hardware-independent.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N_UNIFORMS = 13
N_NORMALS = 4
_COLS = N_UNIFORMS + 2 * ((N_NORMALS + 1) // 2)
_BLOCK = 2048
_TWO_PI = 2.0 * math.pi


def _kernel(seed_ref, out_u_ref, out_n_ref):
    from jax.experimental.pallas import tpu as pltpu

    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] ^ (pid * jnp.int32(-1640531527)))
    bits = pltpu.prng_random_bits((_BLOCK, _COLS))
    # random bits arrive as SIGNED int32 (>> would arithmetic-shift): keep
    # the low 24 bits -> exact-in-f32 uniform [0,1)
    u01 = (bits & jnp.int32(0x00FFFFFF)).astype(jnp.float32) \
        * jnp.float32(1.0 / (1 << 24))
    out_u_ref[:] = u01[:, :N_UNIFORMS]
    # Box-Muller on the trailing uniform pairs
    eps = jnp.float32(1e-7)
    a0 = jnp.maximum(u01[:, N_UNIFORMS], eps)
    b0 = u01[:, N_UNIFORMS + 1]
    a1 = jnp.maximum(u01[:, N_UNIFORMS + 2], eps)
    b1 = u01[:, N_UNIFORMS + 3]
    r0 = jnp.sqrt(-2.0 * jnp.log(a0))
    r1 = jnp.sqrt(-2.0 * jnp.log(a1))
    t0 = jnp.float32(_TWO_PI) * b0
    t1 = jnp.float32(_TWO_PI) * b1
    out_n_ref[:] = jnp.stack(
        [r0 * jnp.cos(t0), r0 * jnp.sin(t0),
         r1 * jnp.cos(t1), r1 * jnp.sin(t1)], axis=1)


def step_draws(key: jnp.ndarray, n: int):
    """(uniforms (n, 13), normals (n, 4)) for one play step.

    `key` is the already-folded per-step key; its raw data seeds the
    hardware PRNG.  n is padded up to the block size internally."""
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        # the TPU interpreter emulates prng_random_bits as zeros — fall back
        # to threefry off-TPU so CPU tests keep real randomness
        ku, kn = jax.random.split(key)
        return (jax.random.uniform(ku, (n, N_UNIFORMS)),
                jax.random.normal(kn, (n, N_NORMALS)))

    raw = jax.random.key_data(key).astype(jnp.uint32)
    seed = (raw[0] ^ (raw[1] * jnp.uint32(2654435761))).astype(jnp.int32)
    n_pad = -(-n // _BLOCK) * _BLOCK
    interpret = False
    u, nrm = pl.pallas_call(
        _kernel,
        grid=(n_pad // _BLOCK,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((_BLOCK, N_UNIFORMS), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK, N_NORMALS), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, N_UNIFORMS), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, N_NORMALS), jnp.float32),
        ),
        interpret=interpret,
    )(seed.reshape(1, 1))
    return u[:n], nrm[:n]


def _chunk_kernel(seed_ref, base_ref, out_u_ref, out_n_ref):
    """One (step, block) grid cell of a whole play-chunk's draws; seeded by
    (base seed, absolute step index, block id) so streams stay
    counter-based and layout-independent like the per-step kernel."""
    from jax.experimental.pallas import tpu as pltpu

    step = pl.program_id(0)
    blk = pl.program_id(1)
    absolute = base_ref[0, 0] + step
    pltpu.prng_seed(seed_ref[0, 0]
                    ^ (absolute * jnp.int32(-1640531527))
                    ^ (blk * jnp.int32(40503)))
    bits = pltpu.prng_random_bits((_BLOCK, _COLS))
    u01 = (bits & jnp.int32(0x00FFFFFF)).astype(jnp.float32) \
        * jnp.float32(1.0 / (1 << 24))
    out_u_ref[0] = u01[:, :N_UNIFORMS]
    eps = jnp.float32(1e-7)
    a0 = jnp.maximum(u01[:, N_UNIFORMS], eps)
    b0 = u01[:, N_UNIFORMS + 1]
    a1 = jnp.maximum(u01[:, N_UNIFORMS + 2], eps)
    b1 = u01[:, N_UNIFORMS + 3]
    r0 = jnp.sqrt(-2.0 * jnp.log(a0))
    r1 = jnp.sqrt(-2.0 * jnp.log(a1))
    t0 = jnp.float32(_TWO_PI) * b0
    t1 = jnp.float32(_TWO_PI) * b1
    out_n_ref[0] = jnp.stack(
        [r0 * jnp.cos(t0), r0 * jnp.sin(t0),
         r1 * jnp.cos(t1), r1 * jnp.sin(t1)], axis=1)


def chunk_draws(key: jnp.ndarray, step_base: jnp.ndarray, ch: int, n: int):
    """All of one play chunk's draws — uniforms (ch, n, 13) + normals
    (ch, n, 4) — in ONE pallas_call (grid (ch, n/_BLOCK)).

    This is the chunk-amortized structure VERDICT r2 #2 prescribes: the
    per-step kernel's ~4 ms launch/fusion-break overhead (the measured
    negative in benchmarks/PALLAS_NOTE.md) is paid once per `play_chunk`
    while-loop iteration instead of once per step.  The buffered draws add
    ch*n*17 f32 of HBM write+read (~0.26 ms per 24-step chunk at B=131k —
    ~0.011 ms/step, small against threefry's 0.12 ms/step generation).

    `step_base` is the absolute step index of the chunk's first step (a
    traced i32 scalar), so streams depend only on (key, absolute step,
    row) — the same contract as the per-step kernels."""
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu":
        # CPU fallback: per-step threefry folded on absolute step index
        def one(j):
            k = jax.random.fold_in(key, step_base + j)
            ku, kn = jax.random.split(k)
            return (jax.random.uniform(ku, (n, N_UNIFORMS)),
                    jax.random.normal(kn, (n, N_NORMALS)))
        return jax.vmap(one)(jnp.arange(ch))

    raw = jax.random.key_data(key).astype(jnp.uint32)
    seed = (raw[0] ^ (raw[1] * jnp.uint32(2654435761))).astype(jnp.int32)
    n_pad = -(-n // _BLOCK) * _BLOCK
    u, nrm = pl.pallas_call(
        _chunk_kernel,
        grid=(ch, n_pad // _BLOCK),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _BLOCK, N_UNIFORMS), lambda i, b: (i, b, 0)),
            pl.BlockSpec((1, _BLOCK, N_NORMALS), lambda i, b: (i, b, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ch, n_pad, N_UNIFORMS), jnp.float32),
            jax.ShapeDtypeStruct((ch, n_pad, N_NORMALS), jnp.float32),
        ),
    )(seed.reshape(1, 1),
      jnp.asarray(step_base, jnp.int32).reshape(1, 1))
    return u[:, :n], nrm[:, :n]
