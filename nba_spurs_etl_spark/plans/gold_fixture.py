"""Catalog registration: silver fixtures + the six gold models.

Every entry pairs the Spark implementation (synth.py / gold.py) with a
self-contained DuckDB oracle: the oracle regenerates the identical
silver fixture in SQL (fixture_sql.SILVER_CTES) and re-derives the gold
model — end-to-end reference parity, driver-checkable.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from .. import synth
from ..functions.scalar import davg_sql
from . import gold
from .fixture_sql import SILVER_CTES
from .gold import RECOMMENDATION_BRANCHES, WEAKNESS_METRICS
from .registry import register

_SEASON2 = "CASE WHEN season LIKE '2024' THEN '2024-25' ELSE season END"


# 13 catalog entries (7 silver + 6 gold) share the same tiny fixture
# tables; build + cache them once per session so each query starts from
# the materialized ~2.5k-row silver instead of re-deriving the hash
# synthesis plans (measured 2-3x per gold model on the bench suite).
# Keyed by the session object itself via WeakKeyDictionary (NOT
# id(spark): ids are reused after garbage collection, which could
# silently serve frames from a dead session — VERDICT r03 item 4).
_SILVER_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _silver(spark: SparkSession):
    key = spark
    if key not in _SILVER_CACHE:
        # coalesce(1): these are FIXTURE-sized tables (30-10800 rows —
        # the reference's whole dataset is ~2.4k rows), so one cached
        # partition is the right layout; 32-partition scheduling
        # overhead across the gold models' many tiny stages was 2x the
        # query time (measured: recommendations 2.05s -> 0.96s). The
        # scan-scale testdata tables keep their parquet layout — this
        # is dimension-table sizing, not a general setting.
        _SILVER_CACHE[key] = {
            name: df.coalesce(1).cache()
            for name, df in synth.build_silver(spark).items()
        }
    return _SILVER_CACHE[key]


# The one model->model edge (recommendations ref()'s weaknesses,
# players_recommendations.sql:7). dbt materializes the upstream model
# as a TABLE before the downstream runs — the reference's per-model
# timings read that table, they never recompute the upstream subtree.
# Mirror that lifecycle: cache the weaknesses frame per session so the
# downstream model starts from materialized rows, exactly like ref().
_WEAKNESS_CACHE: "weakref.WeakKeyDictionary[SparkSession, DataFrame]" = (
    weakref.WeakKeyDictionary()
)


def _weaknesses(spark: SparkSession) -> DataFrame:
    key = spark
    if key not in _WEAKNESS_CACHE:
        _WEAKNESS_CACHE[key] = (
            gold.team_weaknesses_unpivoted(_silver(spark)).coalesce(1).cache()
        )
    return _WEAKNESS_CACHE[key]


# ---------------------------------------------------------------------------
# silver fixture parity (generators S5-S7 + scan/normalize semantics)
# ---------------------------------------------------------------------------

# per-table SURVEY §2.1 source id (each silver table gates its own
# bronze generator/scan semantics — the id the VERDICT coverage table
# cites for it), plus the shared normalize/DDL ids S10/S11
_SILVER_S_ID = {
    "teams": "S1",
    "players": "S2",
    "games": "S3",
    "player_stats": "S4",
    "salaries": "S5",
    "free_agents": "S6",
    "injuries": "S7",
}

for _tbl in ("games", "teams", "players", "player_stats", "salaries",
             "free_agents", "injuries"):

    def _mk(tbl: str):
        def q(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _silver(spark)[tbl]

        return q

    # F8 = the seeded rand/choice/sample scalar surface every
    # generator uses; F7 = f-string date assembly (free_agents
    # dags:242, injuries dags:279)
    _f_ids = "F7/F8" if _tbl in ("free_agents", "injuries") else "F8"
    register(
        f"silver_{_tbl}",
        group=f"2.1-{_SILVER_S_ID[_tbl]}/S10/S11 2.8-{_f_ids}",
        oracle=f"WITH {SILVER_CTES} SELECT * FROM {_tbl}",
        doc=f"Deterministic hash-derived silver.{_tbl} fixture "
        "(reference generators dags:50-285, seeded per SURVEY §7.5).",
    )(_mk(_tbl))


# ---------------------------------------------------------------------------
# gold model oracles (mirror plans/gold.py exactly)
# ---------------------------------------------------------------------------


def _davg(col: str, scale: int = 3) -> str:
    return davg_sql(col, scale=scale)


_SUMMARY_TAIL = f"""
, base AS (
  SELECT {_SEASON2} AS season, team_name, wl, CAST(pts AS INT) AS pts
  FROM games g JOIN teams t ON g.team_id = t.id
),
summarized AS (
  SELECT season, team_name,
    CAST(COUNT(*) AS BIGINT) AS total_games,
    CAST(SUM(CASE WHEN wl = 'W' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
    CAST(SUM(CASE WHEN wl = 'L' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
    ROUND({_davg("pts", 0)}, 2) AS avg_points
  FROM base GROUP BY season, team_name
)
SELECT season, team_name, wins, losses, total_games, avg_points,
  CAST(DENSE_RANK() OVER (
    PARTITION BY season ORDER BY wins DESC, losses ASC, avg_points DESC
  ) AS INT) AS team_ranking
FROM summarized
"""


@register(
    "gold_summary_by_season",
    group="gold 2.3-J1 2.4-A1 2.5-W1",
    oracle=f"WITH {SILVER_CTES}{_SUMMARY_TAIL}",
    doc="summary_by_season.sql end-to-end on the fixture.",
)
def gold_summary_by_season(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.summary_by_season(_silver(spark))


_HVA_TAIL = f"""
, base AS (
  SELECT {_SEASON2} AS season, t.full_name AS team_name,
    CASE WHEN matchup LIKE '%@%' THEN 'Away' ELSE 'Home' END AS location,
    wl, CAST(pts AS INT) AS pts
  FROM games g JOIN teams t ON g.team_id = t.id
)
SELECT season, team_name, location,
  CAST(COUNT(*) AS BIGINT) AS games,
  CAST(SUM(CASE WHEN wl = 'W' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
  CAST(SUM(CASE WHEN wl = 'L' THEN 1 ELSE 0 END) AS BIGINT) AS losses,
  ROUND({_davg("pts", 0)}, 2) AS avg_points
FROM base GROUP BY season, team_name, location
"""


@register(
    "gold_home_vs_away",
    group="gold 2.2-P1/P5/P8 2.4-A2",
    oracle=f"WITH {SILVER_CTES}{_HVA_TAIL}",
    doc="home_vs_away.sql end-to-end on the fixture.",
)
def gold_home_vs_away(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.home_vs_away(_silver(spark))


def _weakness_ctes() -> str:
    """CTE chain shared by the weaknesses + recommendations oracles."""
    spurs_avgs = ", ".join(
        f"{_davg(c)} AS avg_{c}" for _, c, _, _ in WEAKNESS_METRICS
    )
    league_avgs = ", ".join(
        f"{_davg(c)} AS avg_league_{c}" for _, c, _, _ in WEAKNESS_METRICS
    )
    best_aggs = ", ".join(
        f"{'MIN' if agg == 'min' else 'MAX'}(avg_{c}) AS best_{c}"
        for _, c, _, agg in WEAKNESS_METRICS
    )
    branches = []
    for label, c, pol, _ in WEAKNESS_METRICS:
        op = "<" if pol == "lt" else ">"
        lbl = label.replace("'", "''")
        branches.append(
            f"SELECT season2, '{lbl}' AS weakness_type, avg_{c} AS valor_equipo, "
            f"avg_league_{c} AS valor_liga, best_{c} AS valor_mejor_equipo, "
            f"CASE WHEN avg_{c} {op} avg_league_{c} THEN 'Debilidad' "
            f"ELSE 'Fortaleza' END AS resultado FROM wide"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
, spurs_stats AS (
  SELECT {_SEASON2} AS season2, {spurs_avgs}
  FROM games WHERE team_name = 'San Antonio Spurs' GROUP BY 1
),
league AS (
  SELECT {_SEASON2} AS season2, {league_avgs}
  FROM games g JOIN teams t ON g.team_id = t.id GROUP BY 1
),
per_team AS (
  SELECT {_SEASON2} AS season2, team_name,
    {", ".join(f"{_davg(c)} AS avg_{c}" for _, c, _, _ in WEAKNESS_METRICS)}
  FROM games g JOIN teams t ON g.team_id = t.id GROUP BY 1, 2
),
best AS (SELECT season2, {best_aggs} FROM per_team GROUP BY season2),
wide AS (
  SELECT ss.*,
    {", ".join(f"l.avg_league_{c}" for _, c, _, _ in WEAKNESS_METRICS)},
    {", ".join(f"b.best_{c}" for _, c, _, _ in WEAKNESS_METRICS)}
  FROM spurs_stats ss
  JOIN league l ON ss.season2 = l.season2
  JOIN best b ON ss.season2 = b.season2
),
weaknesses AS ({union})"""


@register(
    "gold_team_weaknesses_unpivoted",
    group="gold 2.4-A3/A4 2.7-U1",
    oracle=f"WITH {SILVER_CTES}{_weakness_ctes()} SELECT * FROM weaknesses",
    doc="team_weaknesses_unpivoted.sql end-to-end: one 3-way join + "
    "stack() vs the reference's 7x repeated join (SURVEY §4).",
)
def gold_team_weaknesses(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.team_weaknesses_unpivoted(_silver(spark))


def _weakness_wide_tail() -> str:
    """Oracle for the ORPHANED wide model (best team = top plus_minus
    via ROW_NUMBER, reference compiled team_weaknesses.sql:56-80), with
    the documented team_id tiebreak for determinism."""
    from .gold import WIDE_METRICS

    def avgs(prefix: str) -> str:
        return ", ".join(
            f"{_davg(c)} AS {prefix}{a}" for c, a, _ in WIDE_METRICS
        )

    best_cols = ", ".join(
        f"avg_{a} AS best_team_avg_{a}" for _, a, _ in WIDE_METRICS
    )
    values = ", ".join(
        f"s.avg_{a}, l.avg_league_{a}, b.best_team_avg_{a}"
        for _, a, _ in WIDE_METRICS
    )
    ratings = ", ".join(
        f"CASE WHEN s.avg_{a} {op} l.avg_league_{a} THEN 'Debilidad' "
        f"ELSE 'Fortaleza' END AS {a}_rating_vs_league, "
        f"CASE WHEN s.avg_{a} {op} b.best_team_avg_{a} THEN 'Debilidad' "
        f"ELSE 'Fortaleza' END AS {a}_rating_vs_best_team"
        for _, a, op in WIDE_METRICS
    )
    return f"""
, nba AS (
  SELECT {_SEASON2} AS season2, g.*
  FROM games g JOIN teams t ON g.team_id = t.id
),
spurs AS (
  SELECT season2, {avgs("avg_")} FROM nba
  WHERE team_id = '1610612759' GROUP BY 1
),
league AS (SELECT season2, {avgs("avg_league_")} FROM nba GROUP BY 1),
per_team AS (
  SELECT season2, team_id, {avgs("avg_")} FROM nba GROUP BY 1, 2
),
best AS (
  SELECT season2, {best_cols} FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY season2 ORDER BY avg_plus_minus DESC, team_id ASC
    ) AS rn FROM per_team
  ) WHERE rn = 1
)
SELECT s.season2, {values}, {ratings}
FROM spurs s
JOIN league l ON s.season2 = l.season2
JOIN best b ON s.season2 = b.season2
"""


@register(
    "gold_team_weaknesses_wide",
    group="gold 2.5-W3 (orphaned wide model)",
    oracle=f"WITH {SILVER_CTES}{_weakness_wide_tail()}",
    doc="The compiled-but-orphaned wide team_weaknesses model: one row "
    "per season, best team = single top-plus_minus team (ROW_NUMBER "
    "top-1 per group), 22 value + 14 rating columns; deterministic "
    "team_id tiebreak added to the reference's bare plus_minus sort.",
)
def gold_team_weaknesses_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.team_weaknesses_wide(_silver(spark))


def _contrib_tail() -> str:
    avgs = ", ".join(f"{_davg(c)} AS avg_{c}" for _, c, _, _ in WEAKNESS_METRICS)
    branches = "\nUNION ALL\n".join(
        f"SELECT player_id, player_name, '{label.replace(chr(39), chr(39) * 2)}' "
        f"AS rubro, avg_{c} AS valor FROM src"
        for label, c, _, _ in WEAKNESS_METRICS
    )
    return f"""
, src AS (
  SELECT player_id, player_name, {avgs}
  FROM player_stats WHERE team_abbreviation = 'SAS'
  GROUP BY player_id, player_name, team_abbreviation
)
{branches}"""


@register(
    "gold_spurs_player_contributions",
    group="gold 2.4-A3 2.7-U2",
    oracle=f"WITH {SILVER_CTES}{_contrib_tail()}",
    doc="spurs_player_contributions_unpivoted.sql end-to-end.",
)
def gold_spurs_player_contributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.spurs_player_contributions_unpivoted(_silver(spark))


_OPP = (
    "CASE WHEN matchup LIKE '%vs.%' THEN split_part(matchup, 'vs. ', 2) "
    "WHEN matchup LIKE '%@%' THEN split_part(matchup, '@ ', 2) "
    "ELSE matchup END"
)

_STREAKS_TAIL = f"""
, spurs AS (
  SELECT {_SEASON2} AS season, game_date, matchup, plus_minus,
    CASE WHEN wl = 'W' THEN 1 ELSE 0 END AS is_win,
    CASE WHEN wl = 'L' THEN 1 ELSE 0 END AS is_loss
  FROM games WHERE team_abbreviation = 'SAS'
),
win_seq AS (
  SELECT season, is_win, SUM(is_loss) OVER (
    PARTITION BY season ORDER BY game_date, matchup
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM spurs
),
loss_seq AS (
  SELECT season, is_loss, SUM(is_win) OVER (
    PARTITION BY season ORDER BY game_date, matchup
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM spurs
),
bws AS (
  SELECT season, CAST(COUNT(*) AS BIGINT) AS streak_length
  FROM win_seq WHERE is_win = 1 GROUP BY season, grp
  ORDER BY streak_length DESC, season ASC, grp ASC LIMIT 1
),
wls AS (
  SELECT season, CAST(COUNT(*) AS BIGINT) AS streak_length
  FROM loss_seq WHERE is_loss = 1 GROUP BY season, grp
  ORDER BY streak_length DESC, season ASC, grp ASC LIMIT 1
),
bw AS (
  SELECT season, {_OPP} AS opponent, plus_minus AS point_differential
  FROM spurs WHERE plus_minus = (SELECT MAX(plus_minus) FROM spurs)
  ORDER BY point_differential DESC, opponent ASC, season ASC, game_date ASC
  LIMIT 1
),
bl AS (
  SELECT season, {_OPP} AS opponent, plus_minus AS point_differential
  FROM spurs WHERE plus_minus = (SELECT MIN(plus_minus) FROM spurs)
  ORDER BY point_differential ASC, opponent ASC, season ASC, game_date ASC
  LIMIT 1
)
SELECT
  bws.season AS best_winning_streak_season,
  bws.streak_length AS best_winning_streak_length,
  wls.season AS worst_losing_streak_season,
  wls.streak_length AS worst_losing_streak_length,
  bw.season AS biggest_win_season,
  bw.opponent AS team_beat_by_most,
  bw.point_differential AS biggest_win_margin,
  bl.season AS biggest_loss_season,
  bl.opponent AS team_lost_to_by_most,
  bl.point_differential AS biggest_loss_margin
FROM (SELECT 1 AS _one) o
LEFT JOIN bws ON TRUE
LEFT JOIN wls ON TRUE
LEFT JOIN bw ON TRUE
LEFT JOIN bl ON TRUE
"""


@register(
    "gold_streaks_and_rivals",
    group="gold 2.2-P2 2.5-W4 2.4-A8/A9 2.6-O1 2.8-F1",
    oracle=f"WITH {SILVER_CTES}{_STREAKS_TAIL}",
    doc="streaks_and_rivals.sql end-to-end (VARCHAR plus_minus "
    "comparison quirk preserved; see plans/gold.py docstring).",
)
def gold_streaks_and_rivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.streaks_and_rivals(_silver(spark))


def _recommendations_tail() -> str:
    avgs = ", ".join(f"{_davg(c)} AS avg_{c}" for _, c, _, _ in WEAKNESS_METRICS)
    ranks = []
    for _, c, asc, _, _ in RECOMMENDATION_BRANCHES:
        direction = "ASC" if asc else "DESC"
        ranks.append(
            f"ROW_NUMBER() OVER (ORDER BY avg_{c} {direction}, p.player_id ASC)"
            f" AS rank_{c}"
        )
    branches = []
    for label, c, _, positions, reason in RECOMMENDATION_BRANCHES:
        lbl = label.replace("'", "''")
        rsn = reason.replace("'", "''")
        pos_filter = (
            ""
            if positions is None
            else " AND position IN (" + ", ".join(f"'{p}'" for p in positions) + ")"
        )
        branches.append(
            f"SELECT '{lbl}' AS weakness_type, player_id, is_free_agent, "
            f"is_injured, player_name, avg_{c} AS metric_value, position, salary, "
            f"'{rsn}' AS reason FROM ranked WHERE rank_{c} <= 5{pos_filter}"
        )
    union = "\nUNION ALL\n".join(branches)
    return f"""
, p AS (SELECT DISTINCT player_id, player, position FROM players),
pgs AS (
  SELECT player_id, player_name, {avgs}
  FROM player_stats GROUP BY player_id, player_name
),
inj AS (SELECT player_id FROM injuries GROUP BY player_id),
sal AS (
  SELECT player_id, MAX(salary_usd) AS salary_usd FROM salaries GROUP BY player_id
),
ranked AS (
  SELECT p.player_id, p.player AS player_name, p.position,
    fa.player_id IS NOT NULL AS is_free_agent,
    i.player_id IS NOT NULL AS is_injured,
    CAST(s.salary_usd AS DOUBLE) AS salary,
    {", ".join(f"pgs.avg_{c}" for _, c, _, _ in WEAKNESS_METRICS)},
    {", ".join(ranks)}
  FROM p
  JOIN pgs ON p.player_id = pgs.player_id
  LEFT JOIN free_agents fa ON p.player_id = fa.player_id
  LEFT JOIN inj i ON p.player_id = i.player_id
  LEFT JOIN sal s ON p.player_id = s.player_id
),
top_targets AS ({union})
SELECT w.season2, w.weakness_type, t.player_name AS recommended_player,
  t.position, t.metric_value, t.salary, t.reason, t.player_id,
  t.is_free_agent, t.is_injured
FROM (SELECT season2, weakness_type FROM weaknesses
      WHERE resultado = 'Debilidad') w
JOIN top_targets t ON w.weakness_type = t.weakness_type
"""


@register(
    "gold_players_recommendations",
    group="gold 2.2-P7 2.3-J2/J3/J4/J5/J7 2.4-A7 2.5-W2 2.7-U3",
    oracle=f"WITH {SILVER_CTES}{_weakness_ctes()}{_recommendations_tail()}",
    doc="players_recommendations.sql end-to-end incl. the model->model "
    "edge onto team_weaknesses (dbt ref()). VARCHAR MAX(salary) quirk "
    "preserved; ROW_NUMBER tiebreak on player_id both sides.",
)
def gold_players_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gold.players_recommendations(
        _silver(spark), weaknesses=_weaknesses(spark)
    )
