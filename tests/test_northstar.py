"""The acceptance criterion as a test: engine win-prob within ±0.5% (or
3.5 combined SE) of the CPU oracle referee (BASELINE.json north_star).

Opt-in (FMC_NORTHSTAR=1): the power comes from a 65k-game engine run
against the largest cached oracle-margin sample
(benchmarks/oracle_margins_*.npz, seed-123 stream — extend with
benchmarks/oracle_extend.py; regenerate if SimConfig fidelity constants
change), which takes minutes on the CPU test backend.  The regular suite's
engine-vs-oracle bounds (tests/test_engine.py) stay the fast gate.

Run:  FMC_NORTHSTAR=1 python -m pytest tests/test_northstar.py -q
"""
import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("FMC_NORTHSTAR") != "1",
    reason="north-star parity run is opt-in (FMC_NORTHSTAR=1); "
           "takes minutes at full power")

# Referee sample selection: prefer the largest COLD-protocol cache
# (oracle_margins_cold_*.npz — memo caches reset every 250 games, the
# reference's per-worker cache lifetime, so the referee is stationary and
# faithful to the as-executed run shape), else the largest warm
# single-cache stream (non-stationary: its margin sd decays as the cache
# fills — VALIDATION.md).  benchmarks/oracle_extend.py generates both.
_BENCH = Path(__file__).resolve().parents[1] / "benchmarks"


def _largest(pattern: str):
    return max(_BENCH.glob(pattern), default=None,
               key=lambda p: int(p.stem.rsplit("_", 1)[1]))


_COLD = _largest("oracle_margins_cold_*.npz")
_WARM = _largest("oracle_margins_[0-9]*.npz")
# protocol beats raw n, but only once the cold sample has real power
ORACLE_NPZ = _COLD if _COLD is not None and \
    int(_COLD.stem.rsplit("_", 1)[1]) >= 16000 else (_WARM or _COLD)


@pytest.fixture(scope="module")
def engine_scores(reference_dir):
    from fast_monte_carlo_tpu.api import MatchupRunner
    from fast_monte_carlo_tpu.config import SimConfig
    from fast_monte_carlo_tpu.data import (
        build_team_context_from_sp_flex, load_sp_flex,
    )
    from fast_monte_carlo_tpu.models.heads import load_heads

    sp = load_sp_flex(str(reference_dir / "PregameSPPlus2025_1.csv"))
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    heads = load_heads(reference_dir)
    r = MatchupRunner(a, b, heads, SimConfig(), mode="table",
                      table_quality="nano")
    n_pairs = int(os.environ.get("FMC_NORTHSTAR_PAIRS", "32768"))
    out = r.run_pairs(n_pairs, seed=7, collect_players=False)
    return np.asarray(out.score, dtype=float)


@pytest.fixture(scope="module")
def oracle_scores():
    assert ORACLE_NPZ is not None, (
        "no benchmarks/oracle_margins_*.npz cache — regenerate via "
        "benchmarks/oracle_extend.py (or deep_validation.py)")
    return np.load(ORACLE_NPZ)["score"].astype(float)


def test_win_prob_within_north_star(engine_scores, oracle_scores):
    e, o = engine_scores, oracle_scores
    w_e = (e[:, 0] > e[:, 1]).mean()
    w_o = (o[:, 0] > o[:, 1]).mean()
    se = np.sqrt(w_e * (1 - w_e) / len(e) + w_o * (1 - w_o) / len(o))
    delta = abs(w_e - w_o)
    assert delta < max(0.005, 3.5 * se), (
        f"win-prob drift {delta:.4f} vs oracle (SE {se:.4f}): "
        f"engine {w_e:.4f}, oracle {w_o:.4f}")


def test_cover_ladder_within_bound(engine_scores, oracle_scores):
    """Spread-cover probabilities across the bettable range: the round-2
    referee run bounded the knowing sd-mode deviation at <=1.2pp per line
    (benchmarks/COVER_LADDER.md); allow that plus 3.5 combined SE."""
    e_m = engine_scores[:, 0] - engine_scores[:, 1]
    o_m = oracle_scores[:, 0] - oracle_scores[:, 1]
    for spread in (-7.5, -3.5, 3.5, 7.5):
        tgt = -spread
        p_e = (e_m > tgt).mean()
        p_o = (o_m > tgt).mean()
        se = np.sqrt(p_e * (1 - p_e) / len(e_m) + p_o * (1 - p_o) / len(o_m))
        assert abs(p_e - p_o) < 0.012 + 3.5 * se, (
            f"cover drift at spread {spread:+}: engine {p_e:.4f} "
            f"oracle {p_o:.4f} (SE {se:.4f})")


def test_total_mean_consistent(engine_scores, oracle_scores):
    e_t = engine_scores.sum(axis=1)
    o_t = oracle_scores.sum(axis=1)
    se = np.sqrt(e_t.var() / len(e_t) + o_t.var() / len(o_t))
    assert abs(e_t.mean() - o_t.mean()) < max(1.0, 4.0 * se)
