import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from fast_monte_carlo_tpu.api import MatchupRunner
from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import build_team_context_from_sp_flex, load_sp_flex
from fast_monte_carlo_tpu.models.heads import load_heads

sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
cfg = SimConfig()
a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp, player_slots=cfg.engine.player_slots)
b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp, player_slots=cfg.engine.player_slots)
heads = load_heads("/root/reference")
r = MatchupRunner(a, b, heads, cfg, mode="table", table_quality="nano")
s = r.run_pairs_summary(32768, key=jax.random.PRNGKey(7), block=False)
jax.tree_util.tree_map(np.asarray, s)  # drain pipeline

s = r.run_pairs_summary(32768, key=jax.random.PRNGKey(8), block=False)
leaves = jax.tree_util.tree_leaves(s)
print("leaves:", [(x.dtype.name, x.shape) for x in leaves])
t0 = time.perf_counter()
for x in leaves:
    t1 = time.perf_counter(); np.asarray(x); print(f"  leaf {x.shape}: {(time.perf_counter()-t1)*1000:.1f}ms")
print(f"per-leaf total: {(time.perf_counter()-t0)*1000:.0f}ms")

# packed: one concatenated f32 transfer
@jax.jit
def pack(su):
    return jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(su)])

s = r.run_pairs_summary(32768, key=jax.random.PRNGKey(9), block=False)
flat = pack(s)
t0 = time.perf_counter(); h = np.asarray(flat); print(f"packed ({h.size} f32): {(time.perf_counter()-t0)*1000:.1f}ms")

# device_get of the whole tree
s = r.run_pairs_summary(32768, key=jax.random.PRNGKey(10), block=False)
t0 = time.perf_counter(); jax.device_get(s); print(f"device_get(tree): {(time.perf_counter()-t0)*1000:.1f}ms")
