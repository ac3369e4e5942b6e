"""Probe exact-mode engine compile/run cost on the attached TPU, scaling
max_plays to find where compile time goes pathological."""
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
from fast_monte_carlo_tpu.ops.game import make_exact_heads_eval, simulate_games
from fast_monte_carlo_tpu.ops.pack import build_packs

print("devices:", jax.devices(), flush=True)
base = SimConfig()
sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
A = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
B_ = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
heads = load_heads("/root/reference")

for mp in [int(a) for a in sys.argv[1:]] or (1, 4, 16, 64):
    cfg = base.replace(engine=dataclasses.replace(base.engine, max_plays=mp))
    pack, hp = build_packs(A, B_, heads, cfg)
    he = make_exact_heads_eval(cfg)
    n = 1024
    f = jax.jit(lambda hs, key: simulate_games(pack, cfg, he, hs, key, n, 0, collect_players=False))
    t0 = time.perf_counter()
    out = f(hp, jax.random.PRNGKey(0))
    jax.block_until_ready(out.score)
    t1 = time.perf_counter()
    out = f(hp, jax.random.PRNGKey(1))
    jax.block_until_ready(out.score)
    t2 = time.perf_counter()
    print(f"max_plays={mp}: compile+run {t1-t0:.1f}s steady {t2-t1:.3f}s", flush=True)
