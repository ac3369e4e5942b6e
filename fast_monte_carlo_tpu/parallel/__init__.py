from .mesh import trial_mesh, simulate_games_sharded
from .aggregate import (
    ScoreSummary, summarize_scores, cover_probs, total_probs, player_stat_probs,
)

__all__ = [
    "trial_mesh", "simulate_games_sharded",
    "ScoreSummary", "summarize_scores", "cover_probs", "total_probs",
    "player_stat_probs",
]
