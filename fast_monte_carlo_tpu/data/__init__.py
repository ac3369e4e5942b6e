from .sp import load_sp_flex, lookup_sp_flex, norm_team, load_sp_historical, lookup_sp_historical
from .usage import build_focus_usage_tables, load_usage_table, usage_for_team, OTHER_SENTINEL, UNKNOWN
from .context import TeamContext, RoleTable, build_team_context, build_team_context_from_sp_flex

__all__ = [
    "load_sp_flex", "lookup_sp_flex", "norm_team",
    "load_sp_historical", "lookup_sp_historical",
    "build_focus_usage_tables", "load_usage_table", "usage_for_team",
    "OTHER_SENTINEL", "UNKNOWN",
    "TeamContext", "RoleTable", "build_team_context", "build_team_context_from_sp_flex",
]
