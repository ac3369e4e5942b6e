"""Multi-device (8-way virtual CPU mesh) sharding + aggregation tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_monte_carlo_tpu.config import SimConfig
from fast_monte_carlo_tpu.data import load_sp_flex, build_team_context_from_sp_flex
from fast_monte_carlo_tpu.models.heads import load_heads
from fast_monte_carlo_tpu.ops.game import make_analytic_heads_eval, simulate_games
from fast_monte_carlo_tpu.ops.pack import build_packs
from fast_monte_carlo_tpu.parallel import (
    cover_probs, simulate_games_sharded, summarize_scores, total_probs, trial_mesh,
)


@pytest.fixture(scope="module")
def env(reference_dir):
    cfg = SimConfig()
    sp = load_sp_flex(str(reference_dir / "PregameSPPlus2025_1.csv"))
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    heads = load_heads(reference_dir)
    pack, hp = build_packs(a, b, heads, cfg)
    return cfg, pack


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_simulation_runs_and_aggregates(env):
    cfg, pack = env
    he = make_analytic_heads_eval(cfg)
    n = 1024
    out = simulate_games_sharded(pack, cfg, he, None, jax.random.PRNGKey(0), n, 0)
    assert out.score.shape == (n, 2)
    # result is actually sharded over 8 devices
    assert len(out.score.sharding.device_set) == 8
    assert int(np.asarray(out.sec).max()) == 0

    s = jax.jit(summarize_scores)(out.score)
    assert float(s.n) == n
    assert 5 < float(s.mean_pts[0]) < 80
    np.testing.assert_allclose(
        float(s.win_rate[0] + s.win_rate[1] + s.tie_rate), 1.0, atol=1e-6)
    assert int(s.pts_hist.sum()) == 2 * n
    assert int(s.margin_hist.sum()) == n

    cp = jax.jit(lambda sc: cover_probs(sc, -3.0))(out.score)
    tp = jax.jit(lambda sc: total_probs(sc, 55.5))(out.score)
    np.testing.assert_allclose(
        float(cp["p_cover"] + cp["p_notcover"] + cp["push"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        float(tp["p_over"] + tp["p_under"] + tp["push"]), 1.0, atol=1e-6)


def test_sharded_matches_single_device_distribution(env):
    """Sharding must not change the statistics (keys are per-shard folds, so
    results differ bitwise but must agree distributionally)."""
    cfg, pack = env
    he = make_analytic_heads_eval(cfg)
    n = 2048
    sharded = simulate_games_sharded(pack, cfg, he, None, jax.random.PRNGKey(7), n, 0)
    single = jax.jit(lambda k: simulate_games(pack, cfg, he, None, k, n, 0,
                                              collect_players=False))(jax.random.PRNGKey(3))
    a = np.asarray(sharded.score, dtype=float)
    b = np.asarray(single.score, dtype=float)
    se = np.sqrt(a[:, 0].var() / n + b[:, 0].var() / n)
    assert abs(a[:, 0].mean() - b[:, 0].mean()) < 5 * se + 0.5
    assert abs((a[:, 0] > a[:, 1]).mean() - (b[:, 0] > b[:, 1]).mean()) < 0.08


def test_sharded_requires_divisible_n(env):
    cfg, pack = env
    he = make_analytic_heads_eval(cfg)
    with pytest.raises(ValueError):
        simulate_games_sharded(pack, cfg, he, None, jax.random.PRNGKey(0), 1001, 0)


def test_moments_sharded_exact_vs_sharded_scores(env):
    """simulate_moments_sharded (per-device reduction + one psum) must be
    bit-equal to reducing the trial-sharded score batch after the fact:
    same per-device fold_in keys, and every moment field is integer-exact
    in float32 at this n."""
    from fast_monte_carlo_tpu.parallel import (
        score_moments, simulate_moments_sharded,
    )

    cfg, pack = env
    he = make_analytic_heads_eval(cfg)
    n = 1024
    fo = np.arange(n) % 2
    key = jax.random.PRNGKey(21)
    m = simulate_moments_sharded(pack, cfg, he, None, key, n, fo)
    out = simulate_games_sharded(pack, cfg, he, None, key, n, fo)
    want = jax.jit(score_moments)(out.score)
    for name, got_f, want_f in zip(m._fields, m, want):
        np.testing.assert_array_equal(
            np.asarray(got_f), np.asarray(want_f), err_msg=name)


def test_run_pairs_summary_sharded(reference_dir):
    """MatchupRunner(shard=True).run_pairs_summary: the multi-chip summary
    path runs chunked shard_map launches and agrees with the single-device
    summary within MC error."""
    from fast_monte_carlo_tpu.api import MatchupRunner

    sp = load_sp_flex(str(reference_dir / "PregameSPPlus2025_1.csv"))
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    rs = MatchupRunner(a, b, None, SimConfig(), mode="analytic", shard=True)
    got = rs.run_pairs_summary(512, seed=4, chunk_pairs=128)
    assert int(got.n) == 1024
    r1 = MatchupRunner(a, b, None, SimConfig(), mode="analytic")
    ref = r1.run_pairs_summary(512, seed=5, chunk_pairs=128)
    np.testing.assert_allclose(np.asarray(got.win_rate)[0],
                               np.asarray(ref.win_rate)[0], atol=0.08)
    np.testing.assert_allclose(np.asarray(got.mean_pts),
                               np.asarray(ref.mean_pts), atol=2.5)
    assert int(np.asarray(got.pts_hist).sum()) == 2048


def test_run_pairs_summary_sharded_rounds_up_odd_n(reference_dir):
    """Arbitrary -n values must not crash the shard path on the device-count
    divisibility check: chunk_pairs rounds UP to a device multiple (the
    documented whole-launch round-up), and raw run_pairs — which cannot
    silently round — raises a clear error at the API surface instead."""
    from fast_monte_carlo_tpu.api import MatchupRunner

    sp = load_sp_flex(str(reference_dir / "PregameSPPlus2025_1.csv"))
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    rs = MatchupRunner(a, b, None, SimConfig(), mode="analytic", shard=True)
    got = rs.run_pairs_summary(101, seed=4, chunk_pairs=101)
    # 101 pairs round up to 104 (13 per device x 8): whole-launch semantics
    assert int(got.n) == 2 * 104
    with pytest.raises(ValueError, match="divisible by the device count"):
        rs.run_pairs(101, seed=4)


def test_accumulated_summary_matches_single_batch(reference_dir):
    """run_pairs_summary's device-accumulated moments equal summarize_scores
    over the concatenated per-chunk batches (the 1.22M games/s sweep
    pattern is exact, not approximate)."""
    from fast_monte_carlo_tpu.api import MatchupRunner
    from fast_monte_carlo_tpu.parallel.aggregate import summarize_scores

    sp = load_sp_flex(str(reference_dir / "PregameSPPlus2025_1.csv"))
    a = build_team_context_from_sp_flex("Kansas State", 2025, 1, sp)
    b = build_team_context_from_sp_flex("Iowa State", 2025, 1, sp)
    r = MatchupRunner(a, b, None, SimConfig(), mode="analytic")
    root = jax.random.PRNGKey(9)
    want_scores = []
    for ci in range(3):
        out = r.run_pairs(32, key=jax.random.fold_in(root, ci),
                          collect_players=False, collect_stats=False)
        want_scores.append(np.asarray(out.score))
    want = summarize_scores(jnp.asarray(np.concatenate(want_scores)))
    got = r.run_pairs_summary(96, seed=9, chunk_pairs=32)
    assert int(got.n) == 192 == int(want.n)
    np.testing.assert_array_equal(np.asarray(got.margin_hist),
                                  np.asarray(want.margin_hist))
    np.testing.assert_array_equal(np.asarray(got.pts_hist),
                                  np.asarray(want.pts_hist))
    np.testing.assert_allclose(np.asarray(got.win_rate),
                               np.asarray(want.win_rate), atol=1e-7)
    np.testing.assert_allclose(np.asarray(got.mean_pts),
                               np.asarray(want.mean_pts), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.sd_pts),
                               np.asarray(want.sd_pts), rtol=1e-5)
