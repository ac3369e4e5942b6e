from .mesh import (
    simulate_games_sharded, simulate_moments_sharded, trial_mesh,
)
from .aggregate import (
    ScoreMoments, ScoreSummary, cover_probs, player_stat_probs, score_moments,
    summarize_scores, summary_from_moments, total_probs,
)
from .slate import (
    game_mesh, pad_games, simulate_slate_moments, stack_games,
)

__all__ = [
    "trial_mesh", "simulate_games_sharded", "simulate_moments_sharded",
    "ScoreMoments", "ScoreSummary", "score_moments", "summarize_scores",
    "summary_from_moments", "cover_probs", "total_probs", "player_stat_probs",
    "game_mesh", "stack_games", "pad_games", "simulate_slate_moments",
]
