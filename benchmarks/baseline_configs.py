"""BASELINE.json configs #3/#4/#5 at spec scale, on the real device.

#3  weekly slate: ~60 matchups x 100k trials each, ONE compiled program
    over the ('game','trial') layout; cold + warm table-build times and
    end-to-end games/s recorded.
#4  edge scan at 1M trials/game over the full slate: chunked launches of
    the same compiled program, per-game margin/total histograms accumulated
    on device, spread/total/ML edge table from the final histograms
    (edge_finder.py:283-336 math).
#5  season-style calibration sweep from the same 1M-trial accumulation:
    win-prob / ATS distribution table per matchup (every adjacent-SP+-rank
    2025 pairing -- the snapshot has no schedule file).

Usage: python benchmarks/baseline_configs.py [n_matchups] [out_md]
"""
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
import pandas as pd

from fast_monte_carlo_tpu.api import SlateRunner
from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import build_team_context_from_sp_flex, load_sp_flex
from fast_monte_carlo_tpu.edge import ev_per_100_at_minus110, prob_to_american
from fast_monte_carlo_tpu.models.heads import load_heads

N_MATCHUPS = int(sys.argv[1]) if len(sys.argv) > 1 else 60
OUT_MD = sys.argv[2] if len(sys.argv) > 2 else "benchmarks/BASELINE_RUNS.md"
MARGIN_OFF, NBINS = 100, 200   # margin support [-100, 100)
TOTAL_BINS = 160

cfg = SimConfig()
sp = load_sp_flex("/root/reference/PregameSPPlus2025_1.csv")
ranked = sp.sort_values("RATING", ascending=False)["team"].tolist()
games = [(ranked[i], ranked[i + 1]) for i in range(0, 2 * N_MATCHUPS, 2)]
heads = load_heads("/root/reference")
ms = [(build_team_context_from_sp_flex(a, 2025, 1, sp),
       build_team_context_from_sp_flex(b, 2025, 1, sp)) for a, b in games]

# ---- config #3: slate, cold + warm build, 100k trials/game ----------------
results = {}
cache = Path(".table_cache")
cold_note = "cold (no table cache)" if not any(
    cache.glob("fusedpair_*.pkl")) else "warm-ish (cache present)"
t0 = time.perf_counter()
sr = SlateRunner(ms, heads, cfg, quality="nano")
build_s = time.perf_counter() - t0
print(f"[#3] table build for {len(games)} matchups: {build_s:.0f}s "
      f"({cold_note})", flush=True)
t0 = time.perf_counter()
sr2 = SlateRunner(ms, heads, cfg, quality="nano")
build_warm_s = time.perf_counter() - t0
print(f"[#3] warm rebuild (disk cache): {build_warm_s:.0f}s", flush=True)

import os
n_pairs_3 = int(os.environ.get("B3_PAIRS", 50_000))  # 100k games per matchup
out = sr.run(n_pairs_3, seed=0)
_ = np.asarray(out.score[:4])      # compile + run
t0 = time.perf_counter()
out = sr.run(n_pairs_3, seed=1)
_ = np.asarray(out.score[:4])
run3_s = time.perf_counter() - t0
n3 = len(games) * 2 * n_pairs_3
print(f"[#3] {len(games)} matchups x {2*n_pairs_3:,} games = {n3:,} games "
      f"in {run3_s:.2f}s -> {n3/run3_s:,.0f} games/s", flush=True)
results["config3"] = {
    "matchups": len(games), "games_per_matchup": 2 * n_pairs_3,
    "build_s": round(build_s, 1), "build_note": cold_note,
    "build_warm_s": round(build_warm_s, 1),
    "sim_s": round(run3_s, 2), "games_per_s": round(n3 / run3_s),
}

# ---- configs #4/#5: 1M trials/game, device-accumulated histograms ---------
G = len(games)


@jax.jit
def per_game_hists(score, gid):
    margin = jnp.clip(score[:, 0] - score[:, 1] + MARGIN_OFF, 0, NBINS - 1)
    total = jnp.clip(score[:, 0] + score[:, 1], 0, TOTAL_BINS - 1)
    mh = jnp.bincount(gid * NBINS + margin, length=G * NBINS)
    th = jnp.bincount(gid * TOTAL_BINS + total, length=G * TOTAL_BINS)
    s = score.astype(jnp.float32)
    sums = jnp.zeros((G, 2)).at[gid].add(s)
    sqs = jnp.zeros((G, 2)).at[gid].add(s * s)
    return mh.reshape(G, NBINS), th.reshape(G, TOTAL_BINS), sums, sqs

PAIRS_PER_CHUNK = int(os.environ.get("B4_PAIRS", 50_000))
CHUNKS = int(os.environ.get("B4_CHUNKS", 10))  # 10 x 100k = 1M games per matchup
mh = np.zeros((G, NBINS), np.int64)
th = np.zeros((G, TOTAL_BINS), np.int64)
sums = np.zeros((G, 2)); sqs = np.zeros((G, 2))
t0 = time.perf_counter()
for ci in range(CHUNKS):
    o = sr.run(PAIRS_PER_CHUNK, seed=100 + ci)
    per = 2 * PAIRS_PER_CHUNK
    gid = jnp.asarray(np.arange(G * per) // per, jnp.int32)
    m, t, s_, q_ = per_game_hists(o.score, gid)
    mh += np.asarray(m); th += np.asarray(t)
    sums += np.asarray(s_); sqs += np.asarray(q_)
    print(f"[#4] chunk {ci+1}/{CHUNKS} done @ {time.perf_counter()-t0:.1f}s",
          flush=True)
run4_s = time.perf_counter() - t0
n4 = G * CHUNKS * 2 * PAIRS_PER_CHUNK
print(f"[#4] {n4:,} games in {run4_s:.1f}s -> {n4/run4_s:,.0f} games/s",
      flush=True)
results["config4_5"] = {
    "matchups": G, "trials_per_matchup": CHUNKS * 2 * PAIRS_PER_CHUNK,
    "sim_s": round(run4_s, 1), "games_per_s": round(n4 / run4_s),
}

# edge + calibration tables from the accumulated histograms
n_per = CHUNKS * 2 * PAIRS_PER_CHUNK
margin_vals = np.arange(NBINS) - MARGIN_OFF
total_vals = np.arange(TOTAL_BINS)
rows = []
for gi, (ta, tb) in enumerate(games):
    m, t = mh[gi], th[gi]
    mean = sums[gi] / n_per
    sd = np.sqrt(np.maximum(0.0, sqs[gi] / n_per - mean ** 2))
    win_a = float(m[margin_vals > 0].sum()) / n_per
    tie = float(m[margin_vals == 0].sum()) / n_per
    mean_margin = float((m * margin_vals).sum()) / n_per
    mean_total = float((t * total_vals).sum()) / n_per
    spread = -round(mean_margin * 2) / 2
    line_t = round(mean_total * 2) / 2
    p_cover = float(m[margin_vals > -spread].sum()) / n_per
    p_push = float(m[margin_vals == -spread].sum()) / n_per if \
        float(spread).is_integer() else 0.0
    p_over = float(t[total_vals > line_t].sum()) / n_per
    rows.append({
        "team_a": ta, "team_b": tb, "n": n_per,
        "win_a": round(win_a, 4), "tie": round(tie, 4),
        "ml_a": prob_to_american(win_a / max(1e-9, 1 - tie)),
        "mean_a": round(float(mean[0]), 2), "mean_b": round(float(mean[1]), 2),
        "sd_a": round(float(sd[0]), 2), "sd_b": round(float(sd[1]), 2),
        "spread_a": spread, "p_cover": round(p_cover, 4),
        "p_push": round(p_push, 4),
        "ats_edge_pct": round((p_cover / max(1e-9, 1 - p_push) - 11 / 21) * 100, 2),
        "ev_cover_$100": round(ev_per_100_at_minus110(p_cover, p_push), 2),
        "total_line": line_t, "p_over": round(p_over, 4),
        "mean_total": round(mean_total, 2),
        "sd_margin": round(float(np.sqrt(max(0.0,
            (m * margin_vals ** 2).sum() / n_per - mean_margin ** 2))), 2),
    })
df = pd.DataFrame(rows)
df.to_csv("benchmarks/season_sweep_1M.csv", index=False)
print(df.head(10).to_string(index=False), flush=True)

md = [
    "# BASELINE configs #3-#5 at spec (single v5e chip, nano tables)",
    "",
    f"- run date: driver round 2; {jax.devices()[0].device_kind}",
    f"- config #3: {results['config3']['matchups']} matchups x "
    f"{results['config3']['games_per_matchup']:,} games = "
    f"{results['config3']['matchups']*results['config3']['games_per_matchup']:,} "
    f"games in {results['config3']['sim_s']}s -> "
    f"**{results['config3']['games_per_s']:,} games/s** "
    f"(table build {results['config3']['build_s']}s "
    f"{results['config3']['build_note']}; warm rebuild "
    f"{results['config3']['build_warm_s']}s)",
    f"- configs #4+#5: {results['config4_5']['matchups']} matchups x "
    f"{results['config4_5']['trials_per_matchup']:,} trials = {n4:,} games "
    f"in {results['config4_5']['sim_s']}s -> "
    f"**{results['config4_5']['games_per_s']:,} games/s**, margin/total "
    "histograms accumulated on device; edge + calibration table: "
    "benchmarks/season_sweep_1M.csv",
    "",
    "Top 10 matchups (1M trials each):",
    "",
    "```",
    df.head(10).to_string(index=False),
    "```",
    "",
    "JSON: " + json.dumps(results),
]
Path(OUT_MD).write_text("\n".join(md))
print(f"wrote {OUT_MD}", flush=True)
