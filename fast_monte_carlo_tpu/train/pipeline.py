"""Offline training pipeline (L0): pull -> process -> train -> export.

Reproduces the reference's recipes (SURVEY §2.2, scripts pull_cfb_*.py,
process_cfb_data.py, train_*.py) as library functions instead of
copy-pasted standalone scripts, with these differences:

  * xgboost is optional in this environment.  Every head has an sklearn
    GradientBoosting path (matched hyperparameter spirit) whose output
    compiles to the SAME FlatForest runtime format, so the two snapshot-
    missing artifacts (stage-2 pass outcome, binary play model) can be
    reconstructed here without xgboost.
  * network pulls are gated on CFBD_API_KEY and fail with a clear message
    (this build environment has no egress).
  * artifact export goes both to reference-compatible joblib files and
    directly to compiled FlatForests.

Feature schema (ml_* csv columns) follows the reference exactly:
NUM_FEATURES (17) + passer_name/target_name/rusher_name + pass_outcome /
play_category / rush_yards / fumble_lost targets + year for time-safe
splits (train 2022-23, test 2024 — train_pass_outcome_stage1.py:31-39).
"""
from __future__ import annotations

import json
import math
import os
import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..models.heads import ST1_FEATURES

CFBD_BASE = "https://api.collegefootballdata.com"

NUM_FEATURES = list(ST1_FEATURES)

# play-text extraction patterns (same text grammar the reference parses,
# pull_cfb_data_with_play_type.py:41-45)
PASS_RE = re.compile(r"(\w+\.?\s+\w+)\s+pass\s+(?:complete\s+to\s+(\w+\.?\s+\w+)|incomplete)")
RUSH_RE = re.compile(r"(\w+\.?\s+\w+)\s+(?:run|rush)\s+for")
SACK_RE = re.compile(r"(\w+\.?\s+\w+)\s+sacked\s+by\s+(\w+\.?\s+\w+)")
FUMBLE_RE = re.compile(r"(\w+\.?\s+\w+)\s+fumbled,\s+recovered\s+by\s+\w+\s+(\w+\.?\s+\w+)")


# ---------------------------------------------------------------------------
# pull (network; gated)
# ---------------------------------------------------------------------------

def _cfbd_get(path: str, params: dict, api_key: Optional[str] = None) -> list:
    import urllib.parse
    import urllib.request

    key = api_key or os.environ.get("CFBD_API_KEY")
    if not key:
        raise RuntimeError(
            "CFBD_API_KEY not set; the data pull needs collegefootballdata.com "
            "access (and this environment may have no egress).  Provide the "
            "ml_*.csv training tables directly instead.")
    url = f"{CFBD_BASE}{path}?{urllib.parse.urlencode(params)}"
    req = urllib.request.Request(url, headers={"Authorization": f"Bearer {key}"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode())


def pull_plays(years: Iterable[int] = (2022, 2023, 2024),
               api_key: Optional[str] = None) -> pd.DataFrame:
    """CFBD /plays for FBS weeks; 2024 limited to weeks 1-8 like the
    reference (pull_cfb_raw_data.py:24)."""
    frames = []
    for year in years:
        weeks = range(1, 9) if year == 2024 else range(1, 16)
        for week in weeks:
            try:
                rows = _cfbd_get("/plays", {"year": year, "week": week,
                                            "seasonType": "both",
                                            "classification": "fbs"}, api_key)
            except RuntimeError:
                raise
            except Exception:
                continue
            df = pd.DataFrame(rows)
            df["year"] = year
            df["week"] = week
            frames.append(df)
    return pd.concat(frames, ignore_index=True)


def pull_coaches(years: Iterable[int] = (2022, 2023, 2024),
                 api_key: Optional[str] = None) -> pd.DataFrame:
    rows = []
    for year in years:
        rows.extend(_cfbd_get("/coaches", {"year": year}, api_key))
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# process
# ---------------------------------------------------------------------------

def parse_play_text(play_text, play_type) -> Dict[str, Optional[str]]:
    """Extract passer/receiver/rusher names from a play description,
    dispatched on playType (process_cfb_data.py:40-77 semantics)."""
    out = {"passer_name": None, "receiver_name": None,
           "rusher_name": None, "other_name": None}
    if not play_text or not play_type or pd.isna(play_text) or pd.isna(play_type):
        return out
    text = str(play_text).lower().strip()
    pt = str(play_type).lower().strip()
    if "pass completion" in pt or "pass reception" in pt:
        m = PASS_RE.search(text)
        if m:
            out["passer_name"] = m.group(1).title()
            out["receiver_name"] = m.group(2).title() if m.group(2) else None
    elif "pass incompletion" in pt:
        m = PASS_RE.search(text)
        if m:
            out["passer_name"] = m.group(1).title()
    elif "rush" in pt:
        m = RUSH_RE.search(text)
        if m:
            out["rusher_name"] = m.group(1).title()
    elif "sack" in pt:
        m = SACK_RE.search(text)
        if m:
            out["passer_name"] = m.group(1).title()
            out["other_name"] = m.group(2).title()
    elif "fumble" in pt:
        m = FUMBLE_RE.search(text)
        if m:
            out["rusher_name"] = m.group(1).title()
            out["other_name"] = m.group(2).title()
    return out


def derive_state_features(df: pd.DataFrame) -> pd.DataFrame:
    """Engineered flags the models train on (train_play_model.py:96-99,
    build_state_row semantics)."""
    df = df.copy()
    df["is_red_zone"] = (df["yardsToGoal"] <= 20).astype(int)
    df["goal_to_go"] = (df["distance"] >= df["yardsToGoal"] - 0.5).astype(int)
    df["fourth_and_short"] = ((df["down"] == 4) & (df["distance"] <= 2)).astype(int)
    df["fg_range"] = (df["yardsToGoal"] <= 33).astype(int)
    df["half"] = np.where(df["seconds_remaining"] > 1800, 1, 2)
    df["two_minute"] = ((df["seconds_remaining"] % 1800) <= 120).astype(int)
    return df


def time_safe_split(df: pd.DataFrame, train_years=(2022, 2023), test_years=(2024,)):
    """Train on earlier seasons, test on the last (leakage control,
    train_pass_outcome_stage1.py:31-39)."""
    tr = df[df["year"].isin(train_years)]
    te = df[df["year"].isin(test_years)]
    if len(tr) == 0 or len(te) == 0:
        msk = np.random.default_rng(42).random(len(df)) < 0.8
        tr, te = df[msk], df[~msk]
    return tr, te


def fbs_sanity_check(df: pd.DataFrame, team_col: str = "offense",
                     conference_col: str = "offenseConference") -> pd.DataFrame:
    """Warn-and-drop rows outside FBS conferences (process_cfb_data.py:29-35
    semantics: the training set must not mix FCS opponents into the SP+
    feature space)."""
    if conference_col not in df.columns:
        return df
    bad = df[conference_col].isna() | (df[conference_col].astype(str) == "")
    if bad.any():
        import warnings
        warnings.warn(
            f"{int(bad.sum())} plays have no {conference_col}; dropping "
            f"(non-FBS contamination, e.g. {df.loc[bad, team_col].head(3).tolist()})")
    return df[~bad]


def primary_coaches(coaches: pd.DataFrame) -> pd.DataFrame:
    """Primary coach per (school, year): the one with the most games that
    season (pull_cfb_data_with_play_type.py:124-144 semantics — interim
    coaches with fewer games lose the tie).

    Accepts either the CFBD /coaches shape (first_name/last_name +
    `seasons` list of {school, year, games}) or an already-flat frame with
    columns (school, year, coach, games)."""
    if "seasons" in coaches.columns:
        rows = []
        for _, r in coaches.iterrows():
            name = f"{r.get('first_name', '')} {r.get('last_name', '')}".strip()
            for s in (r["seasons"] or []):
                rows.append({"school": s.get("school"), "year": s.get("year"),
                             "coach": name, "games": s.get("games", 0)})
        flat = pd.DataFrame(rows)
    else:
        flat = coaches.rename(columns={"team": "school"})[
            ["school", "year", "coach", "games"]].copy()
    flat = flat.sort_values("games", ascending=False)
    return flat.drop_duplicates(["school", "year"]).rename(
        columns={"coach": "head_coach"})[["school", "year", "head_coach"]]


def merge_primary_coaches(plays: pd.DataFrame, coaches: pd.DataFrame,
                          team_col: str = "offense") -> pd.DataFrame:
    """Attach head_coach of the offense's primary coach that season."""
    pc = primary_coaches(coaches)
    out = plays.merge(pc, how="left",
                      left_on=[team_col, "year"], right_on=["school", "year"])
    return out.drop(columns=["school"], errors="ignore")


def merge_sp(plays: pd.DataFrame, sp: pd.DataFrame) -> pd.DataFrame:
    """Attach SP+ for both sides by (team, year, week): offense rows get
    (sp_rating_off, sp_offense_rating_off), defense rows get
    (sp_defense_rating_def, sp_rating_def) — process_cfb_data.py:135-148.

    `sp` is schema A: columns team, RATING, OFFENSE, DEFENSE, year, week."""
    key = ["team", "year", "week"]
    off = sp[key + ["RATING", "OFFENSE"]].rename(columns={
        "team": "offense", "RATING": "sp_rating_off",
        "OFFENSE": "sp_offense_rating_off"})
    deff = sp[key + ["RATING", "DEFENSE"]].rename(columns={
        "team": "defense", "RATING": "sp_rating_def",
        "DEFENSE": "sp_defense_rating_def"})
    out = plays.merge(off, how="left", on=["offense", "year", "week"])
    out = out.merge(deff, how="left", on=["defense", "year", "week"])
    return out


def temperature_calibrate(margins: np.ndarray, y: np.ndarray,
                          grid: Sequence[float] = tuple(np.round(np.arange(0.5, 2.01, 0.05), 2))
                          ) -> float:
    """1-D NLL grid search over softmax temperature
    (train_play_model.py:173-187)."""
    best_t, best_nll = 1.0, math.inf
    for t in grid:
        z = margins / t
        z = z - z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        nll = -np.mean(np.log(np.clip(p[np.arange(len(y)), y], 1e-12, None)))
        if nll < best_nll:
            best_nll, best_t = nll, float(t)
    return best_t


# ---------------------------------------------------------------------------
# training (sklearn path; xgboost used when importable)
# ---------------------------------------------------------------------------

def balanced_class_weights(y: np.ndarray, mode: str = "balanced",
                           clip=(1.0 / 3.0, 3.0),
                           tamp: Optional[Dict] = None) -> np.ndarray:
    """Per-sample weights.

    mode='balanced': n/(k*count_c) (train_pass_outcome_stage2.py:82-87,
    train_run_fumble.py semantics).
    mode='softened': sqrt-shrunk balanced weights clipped to [1/3, 3], with
    optional per-class tamp factors (the reference tamps the rare 'timeout'
    class) — train_play_model.py:112-125."""
    classes, counts = np.unique(y, return_counts=True)
    w = len(y) / (len(classes) * counts.astype(float))
    if mode == "softened":
        w = np.clip(np.sqrt(w), *clip)
        if tamp:
            for cls, f in tamp.items():
                w[classes == cls] *= f
    m = dict(zip(classes.tolist(), w.tolist()))
    return np.asarray([m[v] for v in y], dtype=float)


def _logloss(y: np.ndarray, proba: np.ndarray) -> float:
    p = np.clip(proba[np.arange(len(y)), y], 1e-12, None)
    return float(-np.mean(np.log(p)))


def _early_stop_truncate(gbc, Xte, yte, patience: int = 20) -> int:
    """True early stopping against a held-out set for a fitted sklearn
    GradientBoostingClassifier: walk staged probabilities, keep the
    best-logloss iteration, truncate the ensemble there (the reference uses
    xgboost early_stopping_rounds — train_pass_outcome_stage1.py:96-103)."""
    best_i, best_nll, since = 0, math.inf, 0
    for i, proba in enumerate(gbc.staged_predict_proba(Xte)):
        nll = _logloss(yte, proba)
        if nll < best_nll - 1e-7:
            best_nll, best_i, since = nll, i, 0
        else:
            since += 1
            if since >= patience:
                break
    gbc.estimators_ = gbc.estimators_[:best_i + 1]
    return best_i + 1


def _eval_dump(out_dir: Path, stem: str, y: np.ndarray, proba: np.ndarray,
               classes: Sequence, extra: Optional[dict] = None) -> dict:
    """Held-out eval metrics, dumped next to the artifact like the
    reference's train-time prints (train_play_model.py:195-209)."""
    pred = proba.argmax(axis=1)
    k = proba.shape[1]
    metrics = {
        "n_test": int(len(y)),
        "accuracy": float((pred == y).mean()),
        "logloss": _logloss(y, proba),
        "brier": float(np.mean(np.sum(
            (proba - np.eye(k)[y]) ** 2, axis=1))),
        "classes": [str(c) for c in classes],
        "confusion": [[int(((y == i) & (pred == j)).sum()) for j in range(k)]
                      for i in range(k)],
    }
    if k == 2:
        order = np.argsort(proba[:, 1], kind="stable")
        ranks = np.empty(len(y))
        ranks[order] = np.arange(len(y))
        pos, neg = (y == 1).sum(), (y == 0).sum()
        if pos and neg:
            metrics["auc"] = float(
                (ranks[y == 1].sum() - pos * (pos - 1) / 2) / (pos * neg))
    if k > 2:
        top2 = np.argsort(proba, axis=1)[:, -2:]
        metrics["top2_accuracy"] = float(np.mean(
            (top2 == y[:, None]).any(axis=1)))
    if extra:
        metrics.update(extra)
    (Path(out_dir) / f"{stem}_eval.json").write_text(
        json.dumps(metrics, indent=1))
    return metrics


def _ohe_pre(cat_features: List[str], num_features: List[str]):
    from sklearn.compose import ColumnTransformer
    from sklearn.preprocessing import OneHotEncoder

    return ColumnTransformer(
        [("cat", OneHotEncoder(handle_unknown="ignore", sparse_output=True),
          cat_features),
         ("num", "passthrough", num_features)],
        remainder="drop")


def train_quantile_heads(df: pd.DataFrame, kind: str, out_dir: str | Path,
                         cat_features: Optional[List[str]] = None,
                         n_estimators: int = 400) -> List[Path]:
    """The reference's 9 GBR quantile heads, 3 per kind
    (train_pass_yards_quantiles.py et al.): GradientBoostingRegressor
    (loss='quantile', alpha in .1/.5/.9, 400 trees, depth 3) in a Pipeline
    with OHE players, targets clipped per kind."""
    from sklearn.ensemble import GradientBoostingRegressor
    from sklearn.pipeline import Pipeline

    clips = {"pass": (-20, 80), "run": (-10, 40), "sack": (-20, 0)}
    target_col = {"pass": "yardsGained", "run": "yardsGained", "sack": "yardsGained"}[kind]
    default_cats = {"pass": ["passer_name", "target_name"],
                    "run": ["rusher_name"], "sack": ["passer_name"]}
    cat_features = cat_features or default_cats[kind]

    y = df[target_col].clip(*clips[kind]).to_numpy()
    X = df[NUM_FEATURES + cat_features].copy()
    for c in cat_features:
        X[c] = X[c].fillna("Unknown").astype(str)

    out_paths = []
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    import joblib
    for q in (10, 50, 90):
        model = Pipeline([
            ("pre", _ohe_pre(cat_features, NUM_FEATURES)),
            ("gbr", GradientBoostingRegressor(
                loss="quantile", alpha=q / 100.0, n_estimators=n_estimators,
                max_depth=3, random_state=42)),
        ])
        model.fit(X, y)
        p = out_dir / f"{kind}_yards_q{q}.joblib"
        joblib.dump(model, p)
        out_paths.append(p)
    return out_paths


def train_stage1(df: pd.DataFrame, out_dir: str | Path) -> Path:
    """Binary complete-vs-not head (train_pass_outcome_stage1.py recipe):
    time-safe split (:31-39), minority-class reweight (:67-76), early
    stopping (:96-103), eval dump (:106-111)."""
    y = (df["pass_outcome"] == "complete").astype(int)
    return _train_binary(df.assign(_y=y), "_y", ["passer_name"], out_dir,
                         "pass_stage1", weight_mode="minority")


def train_stage2(df: pd.DataFrame, out_dir: str | Path) -> Path:
    """3-class {incomplete,intercepted,sack} head over not-complete rows —
    the artifact missing from the snapshot (train_pass_outcome_stage2.py),
    with full balanced class weights (:82-87), time-safe split, early
    stopping, eval dump."""
    sub = df[df["pass_outcome"] != "complete"].copy()
    cats = [c for c in ("passer_name", "target_name") if c in sub.columns]
    return _train_multiclass(sub, sub["pass_outcome"], cats, out_dir,
                             "pass_stage2", filename="pass_stage2_notcomplete",
                             weight_mode="balanced")


def sample_dropback_states(team_a, team_b, heads, *, cfg=None,
                           n_games: int = 96, seed: int = 123,
                           coach_map=None) -> pd.DataFrame:
    """Realistic dropback-state rows sampled from CPU-oracle trajectories:
    every pass play of `n_games` faithful games contributes its 17-numeric
    ST1 row plus the sampled passer/target names.  This is the plausible
    state distribution for reconstructing the snapshot's missing stage-2
    booster (SURVEY §0.1) — training on uniform-random synthetic states
    produces absurd football (15.6 INT/game, VALIDATION.md round 2)."""
    from ..config import SimConfig
    from ..oracle import OracleMatchup

    cfg = cfg or SimConfig()
    m = OracleMatchup(team_a, team_b, heads, cfg, coach_map,
                      record_states=True)
    rng = np.random.default_rng(seed)
    for i in range(n_games):
        m.simulate_game(i % 2, rng)
    rows = m.dropback_states
    df = pd.DataFrame(np.asarray([r[0] for r in rows], np.float32),
                      columns=NUM_FEATURES)
    df["passer_name"] = [r[1] for r in rows]
    df["target_name"] = [r[2] for r in rows]
    # synthetic vintages so the recipes' time-safe split has both halves
    df["year"] = 2022 + (np.arange(len(df)) % 3)
    return df


def reconstruct_stage2(team_a, team_b, heads, out_dir, *, cfg=None,
                       n_games: int = 96, seed: int = 123,
                       label_seed: int = 7, noise: float = 0.15,
                       coach_map=None) -> Path:
    """Plausible stage-2 reconstruction: train the stage-2 model shape
    (train_pass_outcome_stage2.py:82-130 features/classes) on
    oracle-sampled dropback states labeled from the analytic conditional
    with per-row logit jitter.  The trained booster then reproduces sane
    non-complete outcome rates (~1-2 INT/game through the engine) while
    exercising the real train -> compile -> heads -> engine loop; swap the
    labels for real CFBD outcomes when the data files are available.

    Deliberate deviation from train_stage2's reference recipe: NO class
    reweighting.  The reference's full balanced weights
    (train_pass_outcome_stage2.py:82-87) prior-shift the softprob output
    (P(intercepted | not complete) toward 1/3 instead of ~0.08) — exactly
    the implausible-football failure this reconstruction exists to avoid;
    unweighted training keeps the conditionals calibrated.  The
    recipe-faithful path remains train_stage2."""
    from ..config import SimConfig
    from ..models import analytic

    cfg = cfg or SimConfig()
    df = sample_dropback_states(team_a, team_b, heads, cfg=cfg,
                                n_games=n_games, seed=seed,
                                coach_map=coach_map)
    rng = np.random.default_rng(label_seed)
    p = np.stack(analytic.stage2_fallback_probs(
        df["down"].to_numpy(), df["distance"].to_numpy(), cfg), axis=1)
    if noise:
        z = np.log(np.maximum(p, 1e-6)) + noise * rng.standard_normal(p.shape)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
    u = rng.random(len(df))
    # inverse-CDF guard: float32 cumsum can land ~1e-7 below 1.0, letting
    # a float64 u overrun the last class
    lab = np.minimum((u[:, None] > np.cumsum(p, axis=1)).sum(axis=1), 2)
    df["pass_outcome"] = np.asarray(
        ["incomplete", "intercepted", "sack"])[lab]
    return _train_multiclass(df, df["pass_outcome"],
                             ["passer_name", "target_name"], out_dir,
                             "pass_stage2",
                             filename="pass_stage2_notcomplete",
                             weight_mode="none")


def train_pass_outcome_single(df: pd.DataFrame, out_dir: str | Path) -> Path:
    """Legacy single-stage 4-class pass outcome
    {complete,incomplete,intercepted,sack} (train_pass_outcome.py:52-98),
    with the temperature-calibration step; consumed by
    models.wrappers.PassOutcomeModel (sim_helpers.py:9-24 parity)."""
    cats = [c for c in ("passer_name",) if c in df.columns]
    path = _train_multiclass(df, df["pass_outcome"], cats, out_dir,
                             "pass_outcome", filename="pass_outcome",
                             weight_mode="balanced")
    # 1-D NLL temperature grid on a held-out margin sample (:76-81)
    from ..compat import load_sklearn_artifact
    from ..models.sklearn_gbr import forest_from_gbc_pipeline
    t = 1.0
    if path.suffix == ".joblib":
        from sklearn.preprocessing import LabelEncoder
        forest = forest_from_gbc_pipeline(load_sklearn_artifact(path))
        sub = df.sample(min(len(df), 4000), random_state=0)
        x = sub[list(forest.layout.numeric_names)].to_numpy(np.float32)
        cat = {g: np.asarray([forest.layout.cat_id(g, str(v)) for v in sub[g]])
               for g in forest.layout.cat_group_names}
        margins = forest.eval_margin_np(x, cat)
        le = LabelEncoder().fit(df["pass_outcome"].astype(str))
        t = temperature_calibrate(
            margins, le.transform(sub["pass_outcome"].astype(str)))
    (Path(out_dir) / "pass_outcome_calibration.json").write_text(
        json.dumps({"temperature": t}))
    return path


def train_fumble(df: pd.DataFrame, out_dir: str | Path) -> Path:
    """Binary fumble_lost head with balanced weights (train_run_fumble.py)."""
    return _train_binary(df, "fumble_lost", ["rusher_name"], out_dir,
                         "run_fumble", weight_mode="balanced")


def train_play_policy(df: pd.DataFrame, out_dir: str | Path,
                      binary: bool = True) -> Path:
    """Play-call policy head (train_run_pass.py binary recipe when
    binary=True, else the 5-class train_play_model.py recipe): softened
    balanced class weights with the rare-class tamp (:112-125), early
    stopping, eval dump (:195-209), temperature calibration (:173-187),
    features/label artifacts."""
    import joblib
    from sklearn.preprocessing import LabelEncoder

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    data = df.copy()
    if binary:
        data = data[data["play_category"].isin(["run", "pass"])]
    cats = ["head_coach"] if "head_coach" in data.columns else []
    le = LabelEncoder()
    le.fit(data["play_category"].astype(str))
    path = _train_multiclass(
        data, data["play_category"], cats, out_dir, "play_model",
        filename="play_model", weight_mode="softened",
        tamp={"timeout": 0.5})
    joblib.dump(list(NUM_FEATURES + cats), out_dir / "features.pkl")
    joblib.dump(np.asarray(le.classes_), out_dir / "label_encoder.pkl")

    # temperature calibration on a held-out margin sample
    from ..compat import load_sklearn_artifact
    from ..models.sklearn_gbr import forest_from_gbc_pipeline
    if path.suffix == ".joblib":
        forest = forest_from_gbc_pipeline(load_sklearn_artifact(path))
        sub = data.sample(min(len(data), 4000), random_state=0)
        x = sub[list(forest.layout.numeric_names)].to_numpy(np.float32)
        cat = {g: np.asarray([forest.layout.cat_id(g, str(v)) for v in sub[g]])
               for g in forest.layout.cat_group_names}
        margins = forest.eval_margin_np(x, cat)
        if margins.shape[1] == 1:  # binary forest: single logit column
            margins = np.concatenate([np.zeros_like(margins), margins], axis=1)
        t = temperature_calibrate(margins, le.transform(sub["play_category"].astype(str)))
    else:
        t = 1.0
    (out_dir / "calibration.json").write_text(json.dumps({"temperature": t}))
    return path


def _have_xgboost() -> bool:
    try:
        import xgboost  # noqa: F401
        return True
    except ImportError:
        return False


def _prep_xy(df, y_col_or_series, cat_features):
    X = df[NUM_FEATURES + cat_features].copy()
    for c in cat_features:
        X[c] = X[c].fillna("Unknown").astype(str)
    y = (df[y_col_or_series] if isinstance(y_col_or_series, str)
         else y_col_or_series)
    return X, np.asarray(y)


def _split_frames(df):
    """Time-safe split indices when a year column exists, else all-train."""
    if "year" in df.columns:
        tr, te = time_safe_split(df)
        return df.index.isin(tr.index), df.index.isin(te.index)
    n = len(df)
    msk = np.random.default_rng(42).random(n) < 0.85
    return msk, ~msk


def _sample_weights(y, weight_mode, tamp=None):
    if weight_mode == "none":
        return None
    if weight_mode == "minority":
        # upweight the minority class to parity
        # (train_pass_outcome_stage1.py:67-76 scale_pos_weight semantics)
        pos = max(1, int((y == 1).sum()))
        neg = max(1, int((y == 0).sum()))
        if pos <= neg:
            return np.where(y == 1, neg / pos, 1.0)
        return np.where(y == 0, pos / neg, 1.0)
    return balanced_class_weights(
        y, mode="softened" if weight_mode == "softened" else "balanced",
        tamp=tamp)


def _train_binary(df, y_col, cat_features, out_dir, stem,
                  weight_mode: str = "none") -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    X, y = _prep_xy(df, y_col, cat_features)
    tr_m, te_m = _split_frames(df)
    Xtr, ytr = X[tr_m], y[tr_m]
    Xte, yte = X[te_m], y[te_m]
    import joblib
    pre = _ohe_pre(cat_features, NUM_FEATURES)
    w = _sample_weights(ytr, weight_mode)
    if _have_xgboost():
        import scipy.sparse as sp
        import xgboost as xgb
        Xc = pre.fit_transform(Xtr)
        Xc = Xc if sp.isspmatrix_csr(Xc) else Xc.tocsr()
        dtr = xgb.DMatrix(Xc, label=ytr, weight=w)
        dte = xgb.DMatrix(pre.transform(Xte), label=yte)
        bst = xgb.train(
            {"objective": "binary:logistic", "eval_metric": "logloss",
             "max_depth": 7, "eta": 0.06, "subsample": 0.8,
             "colsample_bytree": 0.8, "min_child_weight": 2,
             "reg_lambda": 1.0, "tree_method": "hist", "seed": 42},
            dtr, num_boost_round=2500, evals=[(dte, "test")],
            early_stopping_rounds=120, verbose_eval=False)
        joblib.dump(pre, out_dir / f"{stem}_preprocessor.joblib")
        path = out_dir / (f"{stem}_complete_vs_not.json" if stem == "pass_stage1"
                          else f"{stem}.json")
        bst.save_model(str(path))
        proba1 = bst.predict(dte, iteration_range=(0, bst.best_iteration + 1))
        _eval_dump(out_dir, stem, yte, np.stack([1 - proba1, proba1], axis=1),
                   [0, 1], {"best_iteration": int(bst.best_iteration)})
        return path
    # sklearn fallback: one pipeline artifact compiled by
    # models.sklearn_gbr.forest_from_gbc_pipeline at load time
    from sklearn.ensemble import GradientBoostingClassifier
    from sklearn.pipeline import Pipeline

    model = Pipeline([
        ("pre", pre),
        ("gbc", GradientBoostingClassifier(
            n_estimators=200, max_depth=5, learning_rate=0.06, random_state=42)),
    ])
    model.fit(Xtr, ytr, gbc__sample_weight=w)
    extra = {}
    if len(Xte):
        Xte_t = model.named_steps["pre"].transform(Xte)
        extra["best_iteration"] = _early_stop_truncate(
            model.named_steps["gbc"], Xte_t, yte)
    path = out_dir / f"{stem}_sklearn.joblib"
    joblib.dump(model, path)
    if len(Xte):
        _eval_dump(out_dir, stem, yte, model.predict_proba(Xte), [0, 1], extra)
    return path


def _train_multiclass(df, y_labels, cat_features, out_dir, stem,
                      filename: Optional[str] = None,
                      weight_mode: str = "none",
                      tamp: Optional[Dict[str, float]] = None) -> Path:
    from sklearn.preprocessing import LabelEncoder

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    filename = filename or stem
    le = LabelEncoder()
    y_all = le.fit_transform(np.asarray(y_labels.astype(str)))
    tamp_enc = ({int(le.transform([k])[0]): v for k, v in tamp.items()
                 if k in le.classes_} if tamp else None)
    X, _ = _prep_xy(df, pd.Series(y_all, index=df.index), cat_features)
    tr_m, te_m = _split_frames(df)
    Xtr, ytr = X[tr_m], y_all[tr_m]
    Xte, yte = X[te_m], y_all[te_m]
    import joblib
    pre = _ohe_pre(cat_features, NUM_FEATURES)
    pd.Series(le.classes_).to_csv(out_dir / f"{stem}_classes.csv",
                                  index=False, header=False)
    w = _sample_weights(ytr, weight_mode, tamp_enc)
    if _have_xgboost():
        import scipy.sparse as sp
        import xgboost as xgb

        Xc = pre.fit_transform(Xtr)
        Xc = Xc if sp.isspmatrix_csr(Xc) else Xc.tocsr()
        dtr = xgb.DMatrix(Xc, label=ytr, weight=w)
        dte = xgb.DMatrix(pre.transform(Xte), label=yte)
        bst = xgb.train(
            {"objective": "multi:softprob", "eval_metric": "mlogloss",
             "num_class": len(le.classes_), "max_depth": 7, "eta": 0.06,
             "subsample": 0.8, "colsample_bytree": 0.8, "min_child_weight": 2,
             "reg_lambda": 1.0, "tree_method": "hist", "seed": 42},
            dtr, num_boost_round=2000, evals=[(dte, "test")],
            early_stopping_rounds=100, verbose_eval=False)
        joblib.dump(pre, out_dir / f"{stem}_preprocessor.joblib")
        path = out_dir / f"{filename}.json"
        bst.save_model(str(path))
        proba = bst.predict(dte, iteration_range=(0, bst.best_iteration + 1))
        _eval_dump(out_dir, stem, yte, proba, list(le.classes_),
                   {"best_iteration": int(bst.best_iteration)})
        return path
    from sklearn.ensemble import GradientBoostingClassifier
    from sklearn.pipeline import Pipeline

    model = Pipeline([
        ("pre", pre),
        ("gbc", GradientBoostingClassifier(
            n_estimators=200, max_depth=5, learning_rate=0.06, random_state=42)),
    ])
    model.fit(Xtr, ytr, gbc__sample_weight=w)
    extra = {}
    if len(Xte):
        Xte_t = model.named_steps["pre"].transform(Xte)
        extra["best_iteration"] = _early_stop_truncate(
            model.named_steps["gbc"], Xte_t, yte)
    path = out_dir / f"{stem}_sklearn.joblib"
    joblib.dump(model, path)
    if len(Xte):
        _eval_dump(out_dir, stem, yte, model.predict_proba(Xte),
                   list(le.classes_), extra)
    return path
