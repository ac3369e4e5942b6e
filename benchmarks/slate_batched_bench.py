"""BASELINE config #3 at full speed: an 8-matchup slate as ONE compiled
program over the ('game','trial') layout — single launch, trials sharded."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np

from fast_monte_carlo_tpu.api import SlateRunner
from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import build_team_context_from_sp_flex, load_sp_flex
from fast_monte_carlo_tpu.models.heads import load_heads

n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
games = [("Kansas State", "Iowa State"), ("Alabama", "Georgia"),
         ("Ohio State", "Michigan"), ("Texas", "Oklahoma"),
         ("Oregon", "Washington"), ("Penn State", "USC"),
         ("Notre Dame", "Clemson"), ("LSU", "Florida")]

cfg = SimConfig()
sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
ms = [(build_team_context_from_sp_flex(a, 2025, 1, sp),
       build_team_context_from_sp_flex(b, 2025, 1, sp)) for a, b in games]
heads = load_heads("/root/reference")

t0 = time.perf_counter()
sr = SlateRunner(ms, heads, cfg)
print(f"slate table build: {time.perf_counter()-t0:.0f}s "
      f"({sr.heads_state.fused.values.nbytes/1e6:.0f} MB fused)", flush=True)

out = sr.run(n_pairs, seed=0)          # compile + run
_ = np.asarray(out.score[:4])
n = len(games) * 2 * n_pairs
best = None
for t in range(2):
    t0 = time.perf_counter()
    out = sr.run(n_pairs, seed=t + 1)
    _ = np.asarray(out.score[:4])
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
    print(f"run {t}: {dt:.2f}s -> {n/dt:,.0f} games/s "
          f"({len(games)} matchups in one launch)", flush=True)
print(sr.summaries(out).to_string(index=False))
