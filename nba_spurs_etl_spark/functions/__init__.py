from .scalar import (
    dsum,
    davg,
    md5_long,
    opponent_from_matchup,
    season_norm,
)

__all__ = ["dsum", "davg", "md5_long", "opponent_from_matchup", "season_norm"]
