"""DuckDB SQL rendering of the NBA silver fixture (mirror of synth.py).

Every expression here must stay in lockstep with
``nba_spurs_etl_spark.synth`` — ``tests/test_gold_parity.py`` (and the
driver's oracle comparison) enforce it row-for-row. The shared
pseudo-random source is the 60-bit md5 hash (``functions.scalar``):
DuckDB ``CAST(('0x'||substr(md5(k),1,15)) AS UBIGINT)::BIGINT`` ==
Spark ``conv(substr(md5(k),1,15),16,10)::long``.
"""

from __future__ import annotations

from ..synth import (
    GAMES_PER_DAY,
    GAMES_PER_PLAYER,
    N_GAMES,
    N_INJURY_ROWS,
    N_PLAYERS,
    N_TEAMS,
    PLAYERS_PER_TEAM,
    SEASON_START,
    SPURS_IDX,
)


def H(salt: str, key: str) -> str:
    """60-bit signed hash of salt||key (key: SQL expr yielding VARCHAR)."""
    return (
        f"CAST(CAST(('0x' || substr(md5('{salt}' || {key}), 1, 15)) AS UBIGINT) AS BIGINT)"
    )


def _pct(base: int, span: int, h: str) -> str:
    return f"'0.' || CAST({base} + {h} % {span} AS VARCHAR)"


_GS = "CAST(g AS VARCHAR)"

# one row per scheduled game (the pre-side 'base' in synth.build_games)
GAME_BASE_CTE = f"""
game_base AS (
  SELECT
    g,
    g // {GAMES_PER_DAY} AS d,
    (g // {GAMES_PER_DAY} + g % {GAMES_PER_DAY}) % {N_TEAMS} AS home,
    (g // {GAMES_PER_DAY} + {GAMES_PER_DAY}
     + (g % {GAMES_PER_DAY} + g // {GAMES_PER_DAY}) % {GAMES_PER_DAY})
      % {N_TEAMS} AS away,
    85 + ({H("ph", _GS)} % 38) * 2 AS pts_h,
    86 + ({H("pa", _GS)} % 38) * 2 AS pts_a
  FROM range(0, {N_GAMES}) AS t(g)
)"""


def _team_id(e: str) -> str:
    return f"CAST(1610612730 + {e} AS VARCHAR)"


def _team_name(e: str) -> str:
    return (
        f"CASE WHEN {e} = {SPURS_IDX} THEN 'San Antonio Spurs' "
        f"ELSE 'Team ' || CAST({e} AS VARCHAR) END"
    )


def _team_abbr(e: str) -> str:
    return (
        f"CASE WHEN {e} = {SPURS_IDX} THEN 'SAS' "
        f"ELSE 'T' || lpad(CAST({e} AS VARCHAR), 2, '0') END"
    )


def _games_side(side: str) -> str:
    is_home = side == "h"
    me, opp = ("home", "away") if is_home else ("away", "home")
    my_pts, opp_pts = ("pts_h", "pts_a") if is_home else ("pts_a", "pts_h")
    sep = " vs. " if is_home else " @ "
    fg_sas = _pct(300, 240, H("f1" + side, _GS))
    fg_reg = _pct(300, 300, H("f1" + side, _GS))
    return f"""
  SELECT
    '2024-25' AS season,
    {_team_id(me)} AS team_id,
    {_team_name(me)} AS team_name,
    {_team_abbr(me)} AS team_abbreviation,
    CAST(DATE '{SEASON_START}' + CAST(d AS INTEGER) AS VARCHAR) AS game_date,
    {_team_abbr(me)} || '{sep}' || {_team_abbr(opp)} AS matchup,
    CASE WHEN {my_pts} > {opp_pts} THEN 'W' ELSE 'L' END AS wl,
    CAST({my_pts} AS VARCHAR) AS pts,
    CAST({my_pts} - {opp_pts} AS VARCHAR) AS plus_minus,
    CASE WHEN {me} = {SPURS_IDX} THEN {fg_sas} ELSE {fg_reg} END AS fg_pct,
    {_pct(250, 200, H("f2" + side, _GS))} AS fg3_pct,
    CAST(CASE WHEN {me} = {SPURS_IDX}
         THEN 8 + {H("f3" + side, _GS)} % 18
         ELSE 5 + {H("f3" + side, _GS)} % 18 END AS VARCHAR) AS tov,
    CAST(CASE WHEN {me} = {SPURS_IDX}
         THEN 36 + {H("f4" + side, _GS)} % 31
         ELSE 30 + {H("f4" + side, _GS)} % 31 END AS VARCHAR) AS reb,
    CAST(1 + {H("f5" + side, _GS)} % 10 AS VARCHAR) AS blk,
    CAST(3 + {H("f6" + side, _GS)} % 13 AS VARCHAR) AS stl
  FROM game_base"""


GAMES_CTE = f"""
games AS ({_games_side("h")}
  UNION ALL{_games_side("a")}
)"""

_T = "CAST(t AS VARCHAR)"

TEAMS_CTE = f"""
teams AS (
  SELECT
    {_team_id("t")} AS id,
    {_team_name("t")} AS full_name,
    {_team_abbr("t")} AS abbreviation,
    'Nick' || {_T} AS nickname,
    'City' || {_T} AS city,
    'State' || CAST(t % 50 AS VARCHAR) AS state,
    CAST(1946 + {H("yf", _T)} % 60 AS VARCHAR) AS year_founded
  FROM range(0, {N_TEAMS}) AS r(t)
)"""

_PID = f"CAST(100000 + (i // {PLAYERS_PER_TEAM}) * 100 + i % {PLAYERS_PER_TEAM} AS VARCHAR)"
_POS = f"(['G','F','C','G-F','F-C'])[(i % 5) + 1]"

PLAYERS_CTE = f"""
players AS (
  SELECT
    {_PID} AS player_id,
    'Player_' || {_PID} AS player,
    {_POS} AS position,
    '2024' AS season,
    CAST(190 + {H("ht", _PID)} % 40 AS VARCHAR) AS height_cm,
    CAST(75 + {H("wt", _PID)} % 50 AS VARCHAR) AS weight_kg,
    CAST(19 + {H("ag", _PID)} % 20 AS VARCHAR) AS age
  FROM range(0, {N_PLAYERS}) AS r(i)
)"""

# player_stats: i ranges over players x games-per-player
_PS_P = f"(i // {GAMES_PER_PLAYER})"
_PS_T = f"({_PS_P} // {PLAYERS_PER_TEAM})"
_PS_PID = (
    f"CAST(100000 + {_PS_T} * 100 + {_PS_P} % {PLAYERS_PER_TEAM} AS VARCHAR)"
)
_PS_KEY = f"{_PS_PID} || '_' || CAST(i % {GAMES_PER_PLAYER} AS VARCHAR)"

PLAYER_STATS_CTE = f"""
player_stats AS (
  SELECT
    {_PS_PID} AS player_id,
    'Player_' || {_PS_PID} AS player_name,
    {_team_abbr(_PS_T)} AS team_abbreviation,
    {_pct(300, 300, H("q1", _PS_KEY))} AS fg_pct,
    {_pct(250, 200, H("q2", _PS_KEY))} AS fg3_pct,
    CAST({H("q3", _PS_KEY)} % 16 AS VARCHAR) AS reb,
    CAST({H("q4", _PS_KEY)} % 9 AS VARCHAR) AS tov,
    CAST({H("q5", _PS_KEY)} % 6 AS VARCHAR) AS stl,
    CAST({H("q6", _PS_KEY)} % 6 AS VARCHAR) AS blk,
    CAST({H("q7", _PS_KEY)} % 61 - 30 AS VARCHAR) AS plus_minus
  FROM range(0, {N_PLAYERS * GAMES_PER_PLAYER}) AS r(i)
)"""

SALARIES_CTE = f"""
salaries AS (
  SELECT
    {_PID} AS player_id,
    'Player_' || {_PID} AS player_name,
    '2024' AS season,
    CAST(500000 + {H("sd", _PID)} % 44500001 AS VARCHAR)
      || '.' || lpad(CAST({H("sc", _PID)} % 100 AS VARCHAR), 2, '0') AS salary_usd
  FROM range(0, {N_PLAYERS}) AS r(i)
)"""

FREE_AGENTS_CTE = f"""
free_agents AS (
  SELECT
    {_PID} AS player_id,
    'Player_' || {_PID} AS player_name,
    {_POS} AS position,
    CAST(19 + {H("fa_age", _PID)} % 20 AS VARCHAR) AS age,
    CAST(1 + {H("fa_exp", _PID)} % 15 AS VARCHAR) AS age_experience,
    CAST(2020 + {H("fa_av", _PID)} % 6 AS VARCHAR) || '-07-01' AS avalaiblefrom
  FROM range(0, {N_PLAYERS}) AS r(i)
  WHERE {H("fa_sel", _PID)} % 3 = 0
)"""

_INJ_IDX = f"({H('inj', 'CAST(r AS VARCHAR)')} % {N_PLAYERS})"
_INJ_PID = (
    f"CAST(100000 + ({_INJ_IDX} // {PLAYERS_PER_TEAM}) * 100"
    f" + {_INJ_IDX} % {PLAYERS_PER_TEAM} AS VARCHAR)"
)
_R = "CAST(r AS VARCHAR)"

INJURIES_CTE = f"""
injuries AS (
  SELECT
    {_INJ_PID} AS player_id,
    'Player_' || {_INJ_PID} AS player_name,
    'Lesion_' || CAST({H("les", _R)} % 10 AS VARCHAR) AS lesion,
    CAST(2020 + {H("iy", _R)} % 6 AS VARCHAR)
      || '-' || lpad(CAST(1 + {H("im", _R)} % 12 AS VARCHAR), 2, '0')
      || '-' || lpad(CAST(1 + {H("id", _R)} % 28 AS VARCHAR), 2, '0') AS date
  FROM range(0, {N_INJURY_ROWS}) AS r(r)
)"""

# all seven silver tables as one WITH-clause body (prefix with "WITH ")
SILVER_CTES = ",".join(
    [
        GAME_BASE_CTE,
        GAMES_CTE,
        TEAMS_CTE,
        PLAYERS_CTE,
        PLAYER_STATS_CTE,
        SALARIES_CTE,
        FREE_AGENTS_CTE,
        INJURIES_CTE,
    ]
)
