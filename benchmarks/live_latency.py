"""Warm live-query latency on the real TPU: table/nano mode, 65,536 games.

Measured 2026-08-19 (one v5e chip, oracle extender SIGSTOPped so the host
is quiet): first call 127.6s (compile + table build), then rotating
through 4 distinct situations — median **51ms**, min 40ms, max 70ms per
65,536-game answer.  Faster than the 90ms warm /sim because resumed games
are shorter and the early-exit chunk loop stops right after they finish.
Re-checked same-day evening (idle host, slow tunnel: first call 444s):
median 87ms, min 39ms, max 174ms, win probs bitwise-identical — the
floor is stable at ~40ms, the median swings ~50-90ms with tunnel load.
Win probabilities across the rotation (n=16,384): up-4-with-ball mid-Q3
0.802, down-3-defense late-Q4 0.319, tied-Q2 0.598 (the pregame edge),
down-3-opponent-4th-and-2-at-95s 0.027 — monotone in game state as they
must be."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fast_monte_carlo_tpu.api import simulate_live_game
from fast_monte_carlo_tpu.ops.game import Situation

SP = "/root/reference/PregameSPPlus2025_1.csv"

sits = [
    Situation(0, 1312, 2, 7.0, 35.0, 21, 17),
    Situation(1, 420, 3, 4.0, 60.0, 17, 20),
    Situation(0, 2400, 1, 10.0, 75.0, 7, 7),
    Situation(1, 95, 4, 2.0, 40.0, 24, 27),
]

t0 = time.perf_counter()
row, s = simulate_live_game("Kansas State", "Iowa State", sits[0],
                            sp_path=SP, n_games=65536)
print(f"first call (compile + tables): {time.perf_counter()-t0:.1f}s "
      f"win_a={row['win_a']:.4f}")

# warm: rotate through distinct situations so no result caching can hide
lat = []
for i in range(12):
    sit = sits[i % len(sits)]
    t0 = time.perf_counter()
    row, s = simulate_live_game("Kansas State", "Iowa State", sit,
                                sp_path=SP, n_games=65536, seed=i)
    lat.append(time.perf_counter() - t0)
lat_s = sorted(lat)
print(f"warm /live 65,536 games: median {lat_s[len(lat)//2]*1e3:.0f}ms "
      f"min {lat_s[0]*1e3:.0f}ms max {lat_s[-1]*1e3:.0f}ms")
print("win_a by sit:", [f"{simulate_live_game('Kansas State','Iowa State', s2, sp_path=SP, n_games=16384)[0]['win_a']:.3f}" for s2 in sits])
