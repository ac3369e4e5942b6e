"""Training pipeline: recipes run in-env on synthetic data, artifacts export,
the compiled forests match sklearn predictions, and load_heads wires the
reconstructed stage-2 head end to end."""
import numpy as np
import pandas as pd
import pytest

from fast_monte_carlo_tpu.compat import load_sklearn_artifact
from fast_monte_carlo_tpu.models.heads import load_heads
from fast_monte_carlo_tpu.models.sklearn_gbr import forest_from_gbc_pipeline
from fast_monte_carlo_tpu.train import pipeline as P


@pytest.fixture(scope="module")
def synth_plays():
    rng = np.random.default_rng(0)
    n = 4000
    down = rng.integers(1, 5, n)
    dist = rng.uniform(1, 15, n).round(1)
    ytg = rng.integers(1, 100, n).astype(float)
    sec = rng.integers(0, 3601, n)
    df = pd.DataFrame({
        "down": down, "distance": dist, "yardsToGoal": ytg,
        "score_diff": rng.integers(-21, 22, n),
        "seconds_remaining": sec,
        "offenseTimeouts": 3, "defenseTimeouts": 3,
        "sp_rating_off": rng.normal(5, 10, n).round(1),
        "sp_offense_rating_off": rng.normal(30, 7, n).round(1),
        "sp_defense_rating_def": rng.normal(25, 7, n).round(1),
        "sp_rating_def": rng.normal(5, 10, n).round(1),
        "passer_name": rng.choice(["Qb One", "Qb Two", "Qb Three"], n),
        "target_name": rng.choice(["Wr One", "Wr Two", "Wr Three", "Wr Four"], n),
        "rusher_name": rng.choice(["Rb One", "Rb Two"], n),
        "year": rng.choice([2022, 2023, 2024], n),
    })
    df = P.derive_state_features(df)
    # synthetic outcomes with real structure
    p_sack = 0.10 + 0.02 * (down >= 3)
    u = rng.random(n)
    outcome = np.where(u < 0.62, "complete",
                       np.where(u < 0.62 + 0.28, "incomplete",
                                np.where(u < 0.62 + 0.28 + 0.07, "sack", "intercepted")))
    df["pass_outcome"] = outcome
    df["yardsGained"] = np.clip(rng.normal(6 + 0.3 * dist, 8), -10, ytg).round(0)
    df["fumble_lost"] = (rng.random(n) < 0.012).astype(int)
    return df


def test_parse_play_text():
    r = P.parse_play_text(
        "John Smith pass complete to Alan Jones for 12 yds", "Pass Reception")
    assert r["passer_name"] == "John Smith" and r["receiver_name"] == "Alan Jones"
    r = P.parse_play_text("John Smith pass incomplete", "Pass Incompletion")
    assert r["passer_name"] == "John Smith" and r["receiver_name"] is None
    r = P.parse_play_text("Bo Runner run for 5 yds", "Rush")
    assert r["rusher_name"] == "Bo Runner"
    r = P.parse_play_text("John Smith sacked by Big End for a loss", "Sack")
    assert r["passer_name"] == "John Smith" and r["other_name"] == "Big End"
    assert P.parse_play_text(None, "Rush")["rusher_name"] is None


def test_time_safe_split(synth_plays):
    tr, te = P.time_safe_split(synth_plays)
    assert set(tr.year.unique()) <= {2022, 2023}
    assert set(te.year.unique()) == {2024}


def test_temperature_calibration():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, 2000)
    margins = np.zeros((2000, 2))
    margins[np.arange(2000), y] = 3.0  # overconfident -> wants T > 1
    margins += rng.normal(0, 2.5, margins.shape)
    t = P.temperature_calibrate(margins, y)
    assert 0.5 <= t <= 2.0


def test_stage2_reconstruction_roundtrip(synth_plays, tmp_path):
    path = P.train_stage2(synth_plays, tmp_path)
    assert path.exists()
    heads = load_heads(tmp_path)
    assert heads.stage2 is not None
    assert heads.stage2.n_classes == 3
    assert set(heads.stage2_class_order) == {"incomplete", "intercepted", "sack"}

    # compiled forest == sklearn pipeline predict_proba
    pipe = load_sklearn_artifact(path)
    sub = synth_plays[synth_plays.pass_outcome != "complete"].head(64)
    X = sub[P.NUM_FEATURES + ["passer_name", "target_name"]].copy()
    want = pipe.predict_proba(X)
    forest = heads.stage2
    xnum = sub[list(forest.layout.numeric_names)].to_numpy(np.float32)
    cat = {g: np.asarray([forest.layout.cat_id(g, v) for v in sub[g]])
           for g in forest.layout.cat_group_names}
    got = forest.predict_np(xnum, cat)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_quantile_head_training_and_compile(synth_plays, tmp_path):
    paths = P.train_quantile_heads(synth_plays.head(1500), "run", tmp_path,
                                   n_estimators=40)
    assert len(paths) == 3
    from fast_monte_carlo_tpu.models import load_gbr_forest
    f = load_gbr_forest(paths[1])
    assert f.n_trees == 40
    x = synth_plays.head(8)
    xnum = x[list(f.layout.numeric_names)].to_numpy(np.float32)
    cat = {g: np.asarray([f.layout.cat_id(g, v) for v in x[g]])
           for g in f.layout.cat_group_names}
    pipe = load_sklearn_artifact(paths[1])
    want = pipe.predict(x[P.NUM_FEATURES + ["rusher_name"]])
    np.testing.assert_allclose(f.predict_np(xnum, cat), want, rtol=1e-5, atol=1e-5)


def test_pull_requires_api_key(monkeypatch):
    monkeypatch.delenv("CFBD_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="CFBD_API_KEY"):
        P.pull_plays([2022])
