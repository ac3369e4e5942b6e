"""Verify timing methodology on the axon backend: block_until_ready vs a
forced host transfer. If the two disagree, only transfer-timed numbers are
trustworthy."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
import numpy as np

from fast_monte_carlo_tpu.api import MatchupRunner
from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import build_team_context_from_sp_flex, load_sp_flex
from fast_monte_carlo_tpu.models.heads import load_heads

mode = sys.argv[1] if len(sys.argv) > 1 else "analytic"
quality = sys.argv[2] if len(sys.argv) > 2 else "default"
n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 131072

print("devices:", jax.devices(), flush=True)
cfg = SimConfig()
sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
A = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
B = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
heads = load_heads("/root/reference") if mode != "analytic" else None
r = MatchupRunner(A, B, heads, cfg, mode=mode, table_quality=quality)

out = r.run_pairs(n_pairs, seed=0, collect_players=False)  # compile
_ = np.asarray(out.score)

for trial in range(3):
    t0 = time.perf_counter()
    out = r.run_pairs(n_pairs, seed=trial + 1, collect_players=False)
    t_block = time.perf_counter() - t0
    sc = np.asarray(out.score)          # forced transfer
    t_xfer = time.perf_counter() - t0
    n = 2 * n_pairs
    print(f"block_until_ready: {t_block:.3f}s ({n/t_block:,.0f}/s) | "
          f"after transfer: {t_xfer:.3f}s ({n/t_xfer:,.0f}/s) | "
          f"mean {sc.mean(axis=0).round(2).tolist()}", flush=True)
