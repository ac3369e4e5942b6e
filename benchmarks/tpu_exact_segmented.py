"""Exact-mode full games on the TPU via the segmented runner (the axon
tunnel kills single launches over ~a minute; segments carry device state)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import build_team_context_from_sp_flex, load_sp_flex
from fast_monte_carlo_tpu.models.heads import load_heads
from fast_monte_carlo_tpu.ops.game import make_exact_heads_eval, simulate_games_segmented
from fast_monte_carlo_tpu.ops.pack import build_packs

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
seg = int(sys.argv[2]) if len(sys.argv) > 2 else 48
cfg = SimConfig()
sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
A = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
B = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
heads = load_heads("/root/reference")
pack, hp = build_packs(A, B, heads, cfg)
he = make_exact_heads_eval(cfg)
fo = np.arange(n) % 2

t0 = time.perf_counter()
out = simulate_games_segmented(pack, cfg, he, hp, jax.random.PRNGKey(0), n,
                               fo, collect_players=False, seg_plays=seg)
sc = np.asarray(out.score)
dt = time.perf_counter() - t0
done = int(np.asarray(out.sec).max()) == 0
print(f"exact segmented: {n} games, seg={seg}: {dt:.1f}s "
      f"-> {n/dt:,.1f} games/s (incl. first compile), finished={done}", flush=True)
print(f"sanity: mean {sc.mean(axis=0).round(2).tolist()} "
      f"winA {float((sc[:,0]>sc[:,1]).mean()):.4f}", flush=True)
t0 = time.perf_counter()
out = simulate_games_segmented(pack, cfg, he, hp, jax.random.PRNGKey(1), n,
                               fo, collect_players=False, seg_plays=seg)
_ = np.asarray(out.score[:4])
dt = time.perf_counter() - t0
print(f"steady: {dt:.1f}s -> {n/dt:,.1f} games/s", flush=True)
