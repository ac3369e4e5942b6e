"""One-round-trip device→host transfer for small pytrees.

On the axon TPU backend every host materialization (``np.asarray`` of a
device array) is a full tunnel round trip (~20-25ms) REGARDLESS of size:
an 8-leaf ScoreSummary fetched leaf-by-leaf costs ~233ms while the same
776 floats packed into one array transfer in ~25ms (measured,
benchmarks/readback_probe.py; same phenomenon as the per-matchup
readbacks that once polluted slate timings — CLAUDE.md "SECOND timing
trap").  ``fetch_tree`` flattens a pytree on device into a single f32
vector (int leaves bitcast, so counts stay exact at any magnitude),
transfers once, and rebuilds the numpy tree on host.

This is a latency lever, not a throughput one: pipelined sweeps already
amortize round trips across launches; the resident serving layer's
single-matchup requests do not (warm /sim measured 315ms -> ~100ms with
the packed readback)."""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# dtypes packable into the f32 wire format bit-exactly (4-byte, bitcast)
_BITCAST = {"int32", "uint32"}


@lru_cache(maxsize=64)
def _packer(spec):
    """Jitted leaf-packer for one (shape, dtype) signature."""
    def pack(*leaves):
        flat = []
        for x, (_, dt) in zip(leaves, spec):
            x = jnp.ravel(x)
            if dt in _BITCAST:
                x = jax.lax.bitcast_convert_type(x, jnp.float32)
            flat.append(x)
        return jnp.concatenate(flat)
    return jax.jit(pack)


def fetch_tree(tree):
    """Materialize a device pytree on host with ONE device→host transfer.

    Equivalent to ``jax.tree_util.tree_map(np.asarray, tree)`` (bitwise:
    integer leaves ride the wire bitcast, not rounded) but costs one
    tunnel round trip instead of one per leaf.  Falls back to the
    per-leaf path for dtypes outside {float32, int32, uint32} or an
    empty tree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    spec = tuple((tuple(x.shape), jnp.result_type(x).name) for x in leaves)
    if not leaves or any(dt not in _BITCAST and dt != "float32"
                         for _, dt in spec):
        return jax.tree_util.tree_map(np.asarray, tree)
    flat = np.asarray(_packer(spec)(*leaves))
    host, off = [], 0
    for shape, dt in spec:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        seg = flat[off:off + n]
        if dt in _BITCAST:
            seg = seg.view(dt)
        host.append(seg.reshape(shape))
        off += n
    return jax.tree_util.tree_unflatten(treedef, host)
