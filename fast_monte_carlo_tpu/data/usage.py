"""Player-usage share tables (QB / rusher / target sampling weights).

Two sources, mirroring the reference:

* A "focus players" sheet (``2025_week1_players.csv`` style, columns
  team,player,pos,usage,stat,yards).  Usage may be a fraction or a percent;
  shortfall vs 1.0 is assigned to a synthetic ``__Other__`` row
  (reference fast_monte_carlo_cfb.py:511-602).
* Per-team fallback usage CSVs (``usage_qb_share.csv`` etc., columns
  offense,year,<name_col>,share), renormalized defensively (reference
  :487-504).

Returned frames always have columns ``[name_col, 'share']`` with shares
summing to 1.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Set, Tuple

import numpy as np
import pandas as pd

OTHER_SENTINEL = "__Other__"
UNKNOWN = "Unknown"

ROLE_NAME_COLS = {
    "pass": "passer_name",
    "rush": "rusher_name",
    "rec": "receiver_name",
}
_STAT_FOR_ROLE = {"pass": "pass_yards", "rush": "rush_yards", "rec": "rec_yards"}


def _share_frame(players: pd.DataFrame, name_col: str) -> pd.DataFrame:
    """(player, usage) rows -> normalized (name_col, share) frame.

    Percent inputs (max > 1.5) are divided by 100; a shortfall below 1.0 is
    given to ``__Other__``; an overrun is renormalized (reference :535-581).
    """
    if players is None or players.empty:
        return pd.DataFrame({name_col: [UNKNOWN], "share": [1.0]})

    t = players[["player", "usage"]].copy()
    t["usage"] = pd.to_numeric(t["usage"], errors="coerce").fillna(0.0).clip(lower=0.0)
    if t["usage"].max() > 1.5:
        t["usage"] = t["usage"] / 100.0
    t = t.groupby("player", as_index=False)["usage"].sum()

    total = float(t["usage"].sum())
    if not np.isfinite(total) or total <= 0.0:
        return pd.DataFrame({name_col: [UNKNOWN], "share": [1.0]})

    if total >= 1.0 - 1e-9:
        t["share"] = t["usage"] / total
    else:
        t["share"] = t["usage"]
        remainder = 1.0 - total
        if remainder > 1e-12:
            t.loc[len(t)] = {"player": OTHER_SENTINEL, "usage": remainder, "share": remainder}

    t = t.rename(columns={"player": name_col})[[name_col, "share"]]
    s = float(t["share"].sum())
    if not np.isfinite(s) or s <= 0.0:
        return pd.DataFrame({name_col: [UNKNOWN], "share": [1.0]})
    t["share"] = (t["share"] / s).clip(lower=0.0)
    return t


def build_focus_usage_tables(path: str) -> Dict[str, dict]:
    """Parse a focus-players sheet into per-team usage tables + track sets."""
    if not path or not os.path.exists(path):
        return {}
    df = pd.read_csv(path)
    df["team"] = df["team"].astype(str).str.strip()
    df["player"] = df["player"].astype(str).str.strip()
    if "pos" in df.columns:
        df["pos"] = df["pos"].astype(str).str.upper().str.strip()
    df["stat"] = df["stat"].astype(str).str.strip().str.lower()
    df["usage"] = pd.to_numeric(df["usage"], errors="coerce")

    by_team: Dict[str, dict] = {}
    for team, g in df.groupby("team"):
        entry: dict = {}
        for role, name_col in ROLE_NAME_COLS.items():
            bucket = g[g["stat"] == _STAT_FOR_ROLE[role]][["player", "usage"]]
            entry[f"{role}_share"] = _share_frame(bucket, name_col)
            entry[f"track_{role}"] = set(bucket["player"].astype(str))
        by_team[str(team)] = entry
    return by_team


def load_usage_table(path: str, team: str, year: int, name_col: str) -> Optional[pd.DataFrame]:
    """Fallback per-team usage CSV loader (reference :487-504)."""
    try:
        df = pd.read_csv(path)
        df = df[(df["offense"] == team) & (df["year"] == year)].copy()
        if df.empty or name_col not in df.columns:
            return None
        df = df[[name_col, "share"]].dropna()
        if df.empty:
            return None
        s = df["share"].clip(lower=0)
        total = float(s.sum())
        df["share"] = (s / total).values if total > 0 else 1.0
        return df
    except Exception:
        return None


_FALLBACK_FILES = {
    "pass": "usage_qb_share.csv",
    "rush": "usage_rush_share.csv",
    "rec": "usage_target_share.csv",
}


def usage_for_team(
    team: str,
    year: int,
    focus_usage: Dict[str, dict],
    usage_dir: str = ".",
) -> Tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, Set[str], Set[str], Set[str]]:
    """Focus-sheet usage if the team is present, else fallback files, else
    an Unknown-player singleton (reference :228-249)."""
    if team in focus_usage:
        info = focus_usage[team]
        return (
            info["pass_share"].copy(), info["rush_share"].copy(), info["rec_share"].copy(),
            set(info["track_pass"]), set(info["track_rush"]), set(info["track_rec"]),
        )

    frames = {}
    for role, fname in _FALLBACK_FILES.items():
        name_col = ROLE_NAME_COLS[role]
        df = load_usage_table(os.path.join(usage_dir, fname), team, year, name_col)
        if df is None:
            df = pd.DataFrame({name_col: [UNKNOWN], "share": [1.0]})
        frames[role] = df
    return frames["pass"], frames["rush"], frames["rec"], set(), set(), set()
