"""Deterministic NBA-shaped silver fixture generator.

Reproduces the seven silver tables of the reference
(``/root/reference/dags/spurs_historic_games.py:427-435``; schemas per
FIXTURES.md) with two deliberate upgrades over the reference's
unseeded ``random.*`` generators (``dags:185-285``):

1. **Determinism via hashing, not RNG.** Every synthetic value is
   derived from ``md5`` of a salted key (``functions.scalar.md5_long``),
   so the *identical* table can be regenerated in pure SQL by the
   DuckDB oracle — the whole silver layer becomes oracle-checkable.
2. **Schedule validity.** Games come from a rotating partition pairing
   (day d, slot k: home=(d+k)%30 vs away=(d+15+((k+d)%15))%30, 82
   days): the home half {d..d+14} and away half {d+15..d+29} partition
   the league, so every team plays exactly once per day — game_date is
   unique per team, which keeps the reference's ``SUM(..) OVER (ORDER
   BY game_date)`` windows tie-free (SURVEY §7.4.5) — while the
   within-half rotation by (k+d)%15 varies each team's opponent day to
   day (a fixed +15 partner would give every team ONE opponent all
   season, leaving the per-opponent logic — streaks' team_beat_by_most,
   opponent tie-breaks — exercised against a single value).

All columns are **strings** (the reference's all-VARCHAR silver,
``dags:380``); gold models re-cast. Spurs rows are biased (lower
fg_pct, higher tov, higher reb) so team_weaknesses yields both
Debilidad and Fortaleza rows and players_recommendations is non-empty
(FIXTURES.md cross-table invariants).

Scale note: fixtures are fixed-size (~13k games rows) regardless of sf —
they model the reference's one-season dataset. Generation is pure
column arithmetic over ``spark.range`` (no driver-side loops, no UDFs),
so the same code would generate arbitrarily large fixtures distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.scalar import md5_long

N_TEAMS = 30
N_DAYS = 82
GAMES_PER_DAY = N_TEAMS // 2
N_GAMES = N_DAYS * GAMES_PER_DAY  # 1230
PLAYERS_PER_TEAM = 18
N_PLAYERS = N_TEAMS * PLAYERS_PER_TEAM  # 540
GAMES_PER_PLAYER = 20
N_INJURY_ROWS = 200
SPURS_IDX = 29  # team index 29 -> id 1610612759 (the real Spurs id)
SEASON_START = "2024-10-22"

POSITIONS = ["G", "F", "C", "G-F", "F-C"]
INJURY_CATALOG = [f"Lesion_{i}" for i in range(10)]


def _h(salt: str, key: Column) -> Column:
    """60-bit hash of salt||key — the cross-engine 'random' source."""
    return md5_long(F.concat(F.lit(salt), key.cast("string")))


def _team_id(idx: Column) -> Column:
    return (F.lit(1610612730) + idx).cast("string")


def _team_name(idx: Column) -> Column:
    return F.when(idx == SPURS_IDX, F.lit("San Antonio Spurs")).otherwise(
        F.concat(F.lit("Team "), idx.cast("string"))
    )


def _team_abbr(idx: Column) -> Column:
    return F.when(idx == SPURS_IDX, F.lit("SAS")).otherwise(
        F.concat(F.lit("T"), F.lpad(idx.cast("string"), 2, "0"))
    )


def _pct_str(base: int, span: int, h: Column) -> Column:
    """'0.NNN' string in [base/1000, (base+span-1)/1000]."""
    return F.concat(F.lit("0."), (F.lit(base) + h % span).cast("string"))


def build_teams(spark: SparkSession) -> DataFrame:
    t = F.col("id").cast("int")
    return spark.range(N_TEAMS).select(
        _team_id(t).alias("id"),
        _team_name(t).alias("full_name"),
        _team_abbr(t).alias("abbreviation"),
        F.concat(F.lit("Nick"), t.cast("string")).alias("nickname"),
        F.concat(F.lit("City"), t.cast("string")).alias("city"),
        F.concat(F.lit("State"), (t % 50).cast("string")).alias("state"),
        (F.lit(1946) + _h("yf", t) % 60).cast("string").alias("year_founded"),
    )


def _games_side(games: DataFrame, side: str) -> DataFrame:
    """Project one team-side row per game (side in {'h','a'})."""
    is_home = side == "h"
    me = F.col("home") if is_home else F.col("away")
    opp = F.col("away") if is_home else F.col("home")
    my_pts = F.col("pts_h") if is_home else F.col("pts_a")
    opp_pts = F.col("pts_a") if is_home else F.col("pts_h")
    # Spurs bias: worse shooting + more turnovers (-> Debilidad rows),
    # more rebounds (-> Fortaleza row). Applied per-side so only SAS rows move.
    is_sas = me == SPURS_IDX
    fg = F.when(is_sas, _pct_str(300, 240, _h("f1" + side, F.col("g")))).otherwise(
        _pct_str(300, 300, _h("f1" + side, F.col("g")))
    )
    tov = F.when(is_sas, F.lit(8) + _h("f3" + side, F.col("g")) % 18).otherwise(
        F.lit(5) + _h("f3" + side, F.col("g")) % 18
    )
    reb = F.when(is_sas, F.lit(36) + _h("f4" + side, F.col("g")) % 31).otherwise(
        F.lit(30) + _h("f4" + side, F.col("g")) % 31
    )

    matchup = (
        F.concat(_team_abbr(me), F.lit(" vs. "), _team_abbr(opp))
        if is_home
        else F.concat(_team_abbr(me), F.lit(" @ "), _team_abbr(opp))
    )
    return games.select(
        F.lit("2024-25").alias("season"),
        _team_id(me).alias("team_id"),
        _team_name(me).alias("team_name"),
        _team_abbr(me).alias("team_abbreviation"),
        F.date_add(F.to_date(F.lit(SEASON_START)), F.col("d"))
        .cast("string")
        .alias("game_date"),
        matchup.alias("matchup"),
        F.when(my_pts > opp_pts, F.lit("W")).otherwise(F.lit("L")).alias("wl"),
        my_pts.cast("string").alias("pts"),
        (my_pts - opp_pts).cast("string").alias("plus_minus"),
        fg.alias("fg_pct"),
        _pct_str(250, 200, _h("f2" + side, F.col("g"))).alias("fg3_pct"),
        tov.cast("string").alias("tov"),
        reb.cast("string").alias("reb"),
        (F.lit(1) + _h("f5" + side, F.col("g")) % 10).cast("string").alias("blk"),
        (F.lit(3) + _h("f6" + side, F.col("g")) % 13).cast("string").alias("stl"),
    )


def build_games(spark: SparkSession) -> DataFrame:
    """2 rows per game x 1230 games. Home pts odd, away pts even ->
    no ties, complementary W/L, plus_minus sums to zero per game."""
    g = F.col("id").cast("int")
    base = spark.range(N_GAMES).select(
        g.alias("g"),
        (g % GAMES_PER_DAY).alias("k"),
        (g / GAMES_PER_DAY).cast("int").alias("d"),
    )
    base = base.select(
        "g",
        "d",
        ((F.col("d") + F.col("k")) % N_TEAMS).alias("home"),
        (
            (
                F.col("d")
                + GAMES_PER_DAY
                + (F.col("k") + F.col("d")) % GAMES_PER_DAY
            )
            % N_TEAMS
        ).alias("away"),
        (F.lit(85) + (_h("ph", F.col("g")) % 38) * 2).alias("pts_h"),
        (F.lit(86) + (_h("pa", F.col("g")) % 38) * 2).alias("pts_a"),
    )
    return _games_side(base, "h").unionByName(_games_side(base, "a"))


def _player_key(t: Column, j: Column) -> Column:
    return (F.lit(100000) + t * 100 + j).cast("string")


def build_players(spark: SparkSession) -> DataFrame:
    i = F.col("id").cast("int")
    t, j = (i / PLAYERS_PER_TEAM).cast("int"), i % PLAYERS_PER_TEAM
    pid = _player_key(t, j)
    pos = F.element_at(
        F.array(*[F.lit(p) for p in POSITIONS]), (i % len(POSITIONS) + 1).cast("int")
    )
    return spark.range(N_PLAYERS).select(
        pid.alias("player_id"),
        F.concat(F.lit("Player_"), pid).alias("player"),
        pos.alias("position"),
        F.lit("2024").alias("season"),
        (F.lit(190) + _h("ht", pid) % 40).cast("string").alias("height_cm"),
        (F.lit(75) + _h("wt", pid) % 50).cast("string").alias("weight_kg"),
        (F.lit(19) + _h("ag", pid) % 20).cast("string").alias("age"),
    )


def build_player_stats(spark: SparkSession) -> DataFrame:
    i = F.col("id").cast("int")
    p = (i / GAMES_PER_PLAYER).cast("int")  # player index 0..539
    gnum = i % GAMES_PER_PLAYER
    t = (p / PLAYERS_PER_TEAM).cast("int")
    j = p % PLAYERS_PER_TEAM
    pid = _player_key(t, j)
    key = F.concat(pid, F.lit("_"), gnum.cast("string"))
    return spark.range(N_PLAYERS * GAMES_PER_PLAYER).select(
        pid.alias("player_id"),
        F.concat(F.lit("Player_"), pid).alias("player_name"),
        _team_abbr(t).alias("team_abbreviation"),
        _pct_str(300, 300, _h("q1", key)).alias("fg_pct"),
        _pct_str(250, 200, _h("q2", key)).alias("fg3_pct"),
        (_h("q3", key) % 16).cast("string").alias("reb"),
        (_h("q4", key) % 9).cast("string").alias("tov"),
        (_h("q5", key) % 6).cast("string").alias("stl"),
        (_h("q6", key) % 6).cast("string").alias("blk"),
        (_h("q7", key) % 61 - 30).cast("string").alias("plus_minus"),
    )


def build_salaries(spark: SparkSession) -> DataFrame:
    i = F.col("id").cast("int")
    t, j = (i / PLAYERS_PER_TEAM).cast("int"), i % PLAYERS_PER_TEAM
    pid = _player_key(t, j)
    dollars = F.lit(500000) + _h("sd", pid) % 44500001
    cents = _h("sc", pid) % 100
    return spark.range(N_PLAYERS).select(
        pid.alias("player_id"),
        F.concat(F.lit("Player_"), pid).alias("player_name"),
        F.lit("2024").alias("season"),
        F.concat(
            dollars.cast("string"), F.lit("."), F.lpad(cents.cast("string"), 2, "0")
        ).alias("salary_usd"),
    )


def build_free_agents(spark: SparkSession) -> DataFrame:
    i = F.col("id").cast("int")
    t, j = (i / PLAYERS_PER_TEAM).cast("int"), i % PLAYERS_PER_TEAM
    pid = _player_key(t, j)
    pos = F.element_at(
        F.array(*[F.lit(p) for p in POSITIONS]), (i % len(POSITIONS) + 1).cast("int")
    )
    return (
        spark.range(N_PLAYERS)
        .select(
            pid.alias("player_id"),
            F.concat(F.lit("Player_"), pid).alias("player_name"),
            pos.alias("position"),
            (F.lit(19) + _h("fa_age", pid) % 20).cast("string").alias("age"),
            (F.lit(1) + _h("fa_exp", pid) % 15).cast("string").alias("age_experience"),
            F.concat((F.lit(2020) + _h("fa_av", pid) % 6).cast("string"), F.lit("-07-01"))
            .alias("avalaiblefrom"),  # sic — reference column name (dags:242)
            (_h("fa_sel", pid) % 3).alias("_sel"),
        )
        .filter(F.col("_sel") == 0)
        .drop("_sel")
    )


def build_injuries(spark: SparkSession) -> DataFrame:
    r = F.col("id").cast("int")
    h = _h("inj", r)
    idx = (h % N_PLAYERS).cast("int")
    t, j = (idx / PLAYERS_PER_TEAM).cast("int"), idx % PLAYERS_PER_TEAM
    pid = _player_key(t, j)
    lesion = F.element_at(
        F.array(*[F.lit(x) for x in INJURY_CATALOG]),
        (_h("les", r) % 10 + 1).cast("int"),
    )
    yy = (F.lit(2020) + _h("iy", r) % 6).cast("string")
    mm = F.lpad((F.lit(1) + _h("im", r) % 12).cast("string"), 2, "0")
    dd = F.lpad((F.lit(1) + _h("id", r) % 28).cast("string"), 2, "0")
    return spark.range(N_INJURY_ROWS).select(
        pid.alias("player_id"),
        F.concat(F.lit("Player_"), pid).alias("player_name"),
        lesion.alias("lesion"),
        F.concat_ws("-", yy, mm, dd).alias("date"),
    )


def build_silver(spark: SparkSession) -> dict[str, DataFrame]:
    """All seven silver tables, keyed as the reference's load map."""
    return {
        "games": build_games(spark),
        "teams": build_teams(spark),
        "players": build_players(spark),
        "player_stats": build_player_stats(spark),
        "salaries": build_salaries(spark),
        "free_agents": build_free_agents(spark),
        "injuries": build_injuries(spark),
    }
