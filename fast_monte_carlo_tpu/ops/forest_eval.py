"""Device-side FlatForest evaluation (exact mode).

The FlatForest node soup becomes a pytree of jnp arrays with per-node
metadata pre-resolved host-side (numeric index vs categorical group/local
id), and evaluation is a depth-bounded vectorized gather walk — the same
algorithm as FlatForest.eval_margin_np, traced once under jit.

Class aggregation is a (B,T) x (T,C) matmul so the reduction lands on the
MXU.  Total node storage across every head in the reference is ~75k nodes
(~1.5 MB), well within VMEM when XLA chooses to keep it resident.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forest import FlatForest


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class JaxForest:
    """Device representation of a FlatForest (metadata fields are static).

    All per-node metadata lives in ONE (N, 8) f32 table so each walk level
    costs a single gather: per-row gather latency dominates on TPU
    (benchmarks/gather_cliff2.py — extra CHANNELS are nearly free, extra
    GATHERS are ~0.23 ms each at 131k indices), so 7 takes/level -> 1."""

    nodes: jnp.ndarray         # (N, 8) f32: [num_idx, is_cat, cat_group,
                               #  cat_local, thresh, left, right, default_left]
    leaf: jnp.ndarray          # (N,) float32
    roots: jnp.ndarray         # (T,) int32
    class_matrix: jnp.ndarray  # (T, C) float32 one-hot tree->class
    base_margin: jnp.ndarray   # (C,) float32
    max_depth: int = field(metadata=dict(static=True))
    n_classes: int = field(metadata=dict(static=True))
    link: str = field(metadata=dict(static=True))
    cmp_lt: bool = field(metadata=dict(static=True))
    zero_as_missing: bool = field(metadata=dict(static=True))
    group_names: Tuple[str, ...] = field(metadata=dict(static=True))
    numeric_names: Tuple[str, ...] = field(metadata=dict(static=True))


def pack_forest(f: FlatForest) -> JaxForest:
    lay = f.layout
    ncat = lay.n_cat
    feat = f.feat
    internal = feat >= 0
    is_cat = internal & (feat < ncat)
    num_idx = np.where(internal & ~is_cat, feat - ncat, 0).astype(np.int32)
    cat_group = np.zeros_like(feat, dtype=np.int32)
    cat_local = np.zeros_like(feat, dtype=np.int32)
    for g, (off, size) in enumerate(zip(lay.cat_group_offsets, lay.cat_group_sizes)):
        in_g = is_cat & (feat >= off) & (feat < off + size)
        cat_group = np.where(in_g, g, cat_group)
        cat_local = np.where(in_g, feat - off, cat_local)
    class_matrix = np.zeros((f.n_trees, f.n_classes), dtype=np.float32)
    class_matrix[np.arange(f.n_trees), f.tree_class] = 1.0
    # leaves: make left/right self-loops so a finished walk stays put
    idx = np.arange(f.n_nodes, dtype=np.int32)
    left = np.where(internal, f.left, idx).astype(np.int32)
    right = np.where(internal, f.right, idx).astype(np.int32)
    # one (N, 8) f32 node table -> one gather per walk level.  Exact int
    # round-trip through f32 holds for every field (indices < 2^24).
    nodes = np.stack([
        num_idx.astype(np.float32),
        is_cat.astype(np.float32),
        cat_group.astype(np.float32),
        cat_local.astype(np.float32),
        f.thresh.astype(np.float32),
        left.astype(np.float32),
        right.astype(np.float32),
        f.default_left.astype(np.float32),
    ], axis=1)
    return JaxForest(
        nodes=jnp.asarray(nodes),
        leaf=jnp.asarray(f.leaf),
        roots=jnp.asarray(f.roots),
        class_matrix=jnp.asarray(class_matrix),
        base_margin=jnp.asarray(f.base_margin),
        max_depth=int(f.max_depth),
        n_classes=int(f.n_classes),
        link=f.link,
        cmp_lt=(f.cmp == "lt"),
        zero_as_missing=bool(f.zero_as_missing),
        group_names=tuple(lay.cat_group_names),
        numeric_names=tuple(lay.numeric_names),
    )


def eval_margin(jf: JaxForest, x_num: jnp.ndarray, cat_ids: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Raw margins (B, C).  x_num: (B, n_numeric) f32; cat_ids: group -> (B,) i32."""
    B = x_num.shape[0]
    T = jf.roots.shape[0]
    # (B, G) matrix of the trial's category id per group
    if jf.group_names:
        cid = jnp.stack(
            [cat_ids.get(g, jnp.full((B,), -1, jnp.int32)).astype(jnp.int32)
             for g in jf.group_names], axis=1)
    else:
        cid = jnp.zeros((B, 1), jnp.int32)

    node = jnp.broadcast_to(jf.roots[None, :], (B, T)).astype(jnp.int32)

    def body(_, node):
        # ONE gather per level: all node metadata rides as channels
        # (per-row gather latency dominates; channels are nearly free)
        nd = jnp.take(jf.nodes, node.reshape(-1), axis=0,
                      mode="clip").reshape(B, T, 8)
        f_num = nd[..., 0].astype(jnp.int32)
        is_cat = nd[..., 1] != 0.0
        grp = nd[..., 2].astype(jnp.int32)
        cat_local = nd[..., 3].astype(jnp.int32)
        th = nd[..., 4]
        left = nd[..., 5].astype(jnp.int32)
        right = nd[..., 6].astype(jnp.int32)
        numv = jnp.take_along_axis(x_num, f_num, axis=1)
        trial_cat = jnp.take_along_axis(cid, grp, axis=1)
        catv = (trial_cat == cat_local).astype(x_num.dtype)
        val = jnp.where(is_cat, catv, numv)
        go_left = (val < th) if jf.cmp_lt else (val <= th)
        if jf.zero_as_missing:
            go_left = jnp.where(val == 0.0, nd[..., 7] != 0.0, go_left)
        return jnp.where(go_left, left, right)

    node = jax.lax.fori_loop(0, jf.max_depth, body, node)
    leaf_vals = jnp.take(jf.leaf, node, mode="clip")    # (B, T)
    margins = jnp.dot(leaf_vals, jf.class_matrix,
                      preferred_element_type=jnp.float32)
    return margins + jf.base_margin[None, :]


def predict(jf: JaxForest, x_num, cat_ids) -> jnp.ndarray:
    m = eval_margin(jf, x_num, cat_ids)
    if jf.link == "identity":
        return m[:, 0] if jf.n_classes == 1 else m
    if jf.link == "sigmoid":
        return jax.nn.sigmoid(m[:, 0])
    return jax.nn.softmax(m, axis=1)
