"""Content-addressed sim bundle persistence (reference sim_store.py:6-26).

A bundle is a run directory with games.parquet + players.parquet + meta.json;
the signature is the sha256 of the canonicalized meta, so downstream edge
analysis is reproducible against exactly the run that produced it."""
from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Optional, Tuple

import pandas as pd

GAMES_KEEP = ["sim_id", "team", "opp", "pts", "opp_pts", "margin", "total", "seed"]


def make_signature(meta: dict) -> str:
    """sha256 over the canonical JSON form of the meta dict.

    The canonicalization (sorted keys, no whitespace) must stay stable
    forever: it IS the content address (reference sim_store.py:6-8), and
    bundles written under one form would not round-trip under another."""
    canonical = json.dumps(meta, sort_keys=True, separators=(",", ":"))
    digest = hashlib.sha256(canonical.encode("utf-8"))
    return digest.hexdigest()


def save_sim_bundle(run_dir: str | Path, games_df: pd.DataFrame,
                    players_df: Optional[pd.DataFrame], meta: dict) -> str:
    p = Path(run_dir)
    p.mkdir(parents=True, exist_ok=True)
    g = games_df.copy()
    if "margin" not in g:
        g["margin"] = g.pts - g.opp_pts
    if "total" not in g:
        g["total"] = g.pts + g.opp_pts
    for col in GAMES_KEEP:
        if col not in g:
            g[col] = 0
    g[GAMES_KEEP].to_parquet(p / "games.parquet", index=False)
    if players_df is not None:
        players_df.to_parquet(p / "players.parquet", index=False)
    sig = make_signature(meta)
    meta = dict(meta, signature=sig)
    (p / "meta.json").write_text(json.dumps(meta, indent=2))
    return sig


def load_sim_bundle(run_dir: str | Path) -> Tuple[pd.DataFrame, Optional[pd.DataFrame], dict]:
    p = Path(run_dir)
    games = pd.read_parquet(p / "games.parquet")
    players_path = p / "players.parquet"
    players = pd.read_parquet(players_path) if players_path.exists() else None
    meta = json.loads((p / "meta.json").read_text())
    return games, players, meta
