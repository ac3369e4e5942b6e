"""Find what makes the table-mode step slow to compile on the TPU backend."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import build_team_context_from_sp_flex, load_sp_flex
from fast_monte_carlo_tpu.models.heads import load_heads
from fast_monte_carlo_tpu.ops.game import simulate_games
from fast_monte_carlo_tpu.ops.pack import build_packs
from fast_monte_carlo_tpu.ops.table_lookup import build_table_heads, make_table_heads_eval

print("devices:", jax.devices(), flush=True)
base = SimConfig()
sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
A = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
B_ = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
heads = load_heads("/root/reference")

t0 = time.perf_counter()
th = build_table_heads(A, B_, heads, base)
print(f"build {time.perf_counter()-t0:.0f}s", flush=True)

n = 8192
for mp in (1, 4, 16, 64):
    cfg = base.replace(engine=dataclasses.replace(base.engine, max_plays=mp))
    pack, hp = build_packs(A, B_, heads, cfg)
    te = make_table_heads_eval(cfg)
    f = jax.jit(lambda ths, key: simulate_games(pack, cfg, te, ths, key, n, 0,
                                                collect_players=False))
    t0 = time.perf_counter()
    out = f(th, jax.random.PRNGKey(0))
    jax.block_until_ready(out.score)
    t1 = time.perf_counter()
    out = f(th, jax.random.PRNGKey(1))
    jax.block_until_ready(out.score)
    t2 = time.perf_counter()
    print(f"mp={mp}: compile+run {t1-t0:.1f}s steady {t2-t1:.3f}s", flush=True)
