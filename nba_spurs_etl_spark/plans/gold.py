"""The six gold models, re-expressed as idiomatic DataFrame pipelines.

Each function takes the dict of silver DataFrames (all-string columns,
``synth.build_silver`` or the real silver loader) and returns the gold
DataFrame. Semantics follow the reference dbt models line-for-line
(cited per function); deliberate, documented deviations:

- **Deterministic tiebreaks** added to every ORDER BY..LIMIT and
  ROW_NUMBER that the reference leaves ambiguous (SURVEY §7.4.5) —
  required for the value-hash oracle and for stable results at any
  parallelism.
- **Streak windows partition by season** (the reference's bare
  ``OVER (ORDER BY game_date)`` serializes onto one task;
  single-season data makes the two identical, and streaks crossing
  season boundaries would be a modeling bug anyway).
- **Exact decimal aggregation** (``davg``) instead of engine-native
  double AVG so results are bit-identical across engines
  (SURVEY §7.4.6).

Reference quirks preserved on purpose:

- ``plus_minus``/``salary_usd`` are compared as VARCHAR (lexicographic
  MAX/MIN!) exactly like the all-VARCHAR silver of the reference
  (streaks_and_rivals.sql:70,86; players_recommendations.sql:51).
- The season-normalization CASE is applied per-model and reused as a
  join key (SURVEY §7.4.3).
- Spanish output literals are byte-exact (SURVEY §7.4.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import davg, opponent_from_matchup, season_norm

# metric metadata shared by team_weaknesses + players_recommendations:
# (label, stat column, weakness polarity, best-team agg)
WEAKNESS_METRICS = [
    ("Porcentaje de tiro de campo", "fg_pct", "lt", "max"),
    ("Porcentaje de tres", "fg3_pct", "lt", "max"),
    ("Pérdidas de balón", "tov", "gt", "min"),  # fewer turnovers is better
    ("Rebotes", "reb", "lt", "max"),
    ("Robos", "stl", "lt", "max"),
    ("Bloqueos", "blk", "lt", "max"),
    ("Diferencial Puntos", "plus_minus", "lt", "max"),
]


def summary_by_season(silver: dict[str, DataFrame]) -> DataFrame:
    """League table: wins/losses/avg points + dense_rank per season.

    Reference: dbt/models/spurs_analysis/summary_by_season.sql:3-42.
    """
    games, teams = silver["games"], silver["teams"]
    nba = games.join(F.broadcast(teams), games.team_id == teams.id)
    base = nba.select(
        season_norm("season").alias("season"),
        "team_name",
        "wl",
        F.col("pts").cast("int").alias("pts"),
    )
    summarized = base.groupBy("season", "team_name").agg(
        F.count(F.lit(1)).alias("total_games"),
        F.sum(F.when(F.col("wl") == "W", 1).otherwise(0)).alias("wins"),
        F.sum(F.when(F.col("wl") == "L", 1).otherwise(0)).alias("losses"),
        F.round(davg("pts", scale=0), 2).alias("avg_points"),
    )
    w = Window.partitionBy("season").orderBy(
        F.desc("wins"), F.asc("losses"), F.desc("avg_points")
    )
    return summarized.select(
        "season",
        "team_name",
        "wins",
        "losses",
        "total_games",
        "avg_points",
        F.dense_rank().over(w).cast("int").alias("team_ranking"),
    )


def home_vs_away(silver: dict[str, DataFrame]) -> DataFrame:
    """Per-venue split (Home/Away from the matchup LIKE pattern).

    Reference: dbt/models/spurs_analysis/home_vs_away.sql.
    Note the model uses teams.full_name (not games.team_name).
    """
    games, teams = silver["games"], silver["teams"]
    nba = games.join(F.broadcast(teams), games.team_id == teams.id)
    base = nba.select(
        season_norm("season").alias("season"),
        F.col("full_name").alias("team_name"),
        F.when(F.col("matchup").like("%@%"), F.lit("Away"))
        .otherwise(F.lit("Home"))
        .alias("location"),
        "wl",
        F.col("pts").cast("int").alias("pts"),
    )
    return base.groupBy("season", "team_name", "location").agg(
        F.count(F.lit(1)).alias("games"),
        F.sum(F.when(F.col("wl") == "W", 1).otherwise(0)).alias("wins"),
        F.sum(F.when(F.col("wl") == "L", 1).otherwise(0)).alias("losses"),
        F.round(davg("pts", scale=0), 2).alias("avg_points"),
    )


def _seven_avgs(prefix: str = "avg_") -> list:
    # unbound F.col expressions: they aggregate whatever frame the
    # .agg() is applied to (a DataFrame parameter here would imply a
    # binding that does not exist)
    return [
        davg(col, scale=3).alias(f"{prefix}{col}") for _, col, _, _ in WEAKNESS_METRICS
    ]


def team_weaknesses_unpivoted(silver: dict[str, DataFrame]) -> DataFrame:
    """Spurs vs league average vs best team, one row per metric.

    Reference: dbt/models/spurs_analysis/team_weaknesses_unpivoted.sql.
    The 7-branch UNION ALL (which re-joins the same 3 CTEs seven times,
    :67-156) collapses to ONE 3-way join + a stack() unpivot — same
    rows, one pass.

    Round 5: the three CTEs themselves (spurs / league / best) fold
    into ONE grouped pass + a regroup instead of three aggregation
    subtrees joined on season2 — 5 Spark jobs -> 2 at fixture scale
    (each broadcast subtree was its own job), and one shuffle of the
    fact rows instead of three at any scale. Bit-exactness is by
    decimal decomposition: ``davg`` is
    ``cast(sum(decimal) as double) / count``, decimal sums re-sum
    exactly across the per-team grain, counts add, and the single IEEE
    division happens once at the end either way. The reference's CTE
    asymmetry is preserved: spurs aggregates ALL its games rows while
    league/best aggregate only rows that join teams — the teams join
    is LEFT here with a match flag, matched-only sums feeding
    league/best and all-rows sums feeding spurs. Seasons are emitted
    exactly when both the spurs CTE and the joined CTEs would be
    non-empty (the original INNER joins on season2).
    """
    games, teams = silver["games"], silver["teams"]
    # the all-rows (spurs) sums below equal the reference's UNJOINED
    # spurs CTE only while each games row matches <= 1 teams row —
    # guaranteed upstream: silver ingest PK-validates teams.id
    # (sources/silver.py raises on duplicates, like the reference's
    # INSERT)
    joined = games.join(F.broadcast(teams), games.team_id == teams.id, "left")
    matched = teams["id"].isNotNull()
    cols = [col for _, col, _, _ in WEAKNESS_METRICS]
    # the decimal cast of each VARCHAR metric is PROJECTED once: this
    # aggregate runs interpreted (no whole-stage codegen above the
    # cached fixture, hence no subexpression elimination), so inlining
    # the cast into all four aggregate families would parse each
    # string 4x per row. count(_d_c) == count(c): a non-null string
    # casts to a non-null decimal (ANSI raises on malformed input
    # rather than producing NULL, identically to the oracle's CAST).
    proj = joined.select(
        season_norm("season").alias("season2"),
        "team_name",
        matched.alias("_m"),
        *[F.col(c).cast("decimal(18,3)").alias(f"_d_{c}") for c in cols],
    )
    per_team = proj.groupBy("season2", "team_name").agg(
        F.count(F.lit(1)).alias("all_rows"),
        F.sum(F.when(F.col("_m"), 1).otherwise(0)).alias("m_rows"),
        *[
            F.sum(F.when(F.col("_m"), F.col(f"_d_{c}"))).alias(f"msum_{c}")
            for c in cols
        ],
        *[
            F.count(F.when(F.col("_m"), F.col(f"_d_{c}"))).alias(f"mcnt_{c}")
            for c in cols
        ],
        *[F.sum(F.col(f"_d_{c}")).alias(f"asum_{c}") for c in cols],
        *[F.count(F.col(f"_d_{c}")).alias(f"acnt_{c}") for c in cols],
    )
    sas = F.col("team_name") == "San Antonio Spurs"
    m_avg = {
        c: F.col(f"msum_{c}").cast("double") / F.col(f"mcnt_{c}") for c in cols
    }
    wide = (
        per_team.groupBy("season2")
        .agg(
            F.sum(F.when(sas, F.col("all_rows"))).alias("_spurs_rows"),
            F.sum("m_rows").alias("_m_rows"),
            *[
                F.max(
                    F.when(
                        sas,
                        F.col(f"asum_{c}").cast("double") / F.col(f"acnt_{c}"),
                    )
                ).alias(f"avg_{c}")
                for c in cols
            ],
            *[
                (
                    F.sum(F.when(F.col("m_rows") > 0, F.col(f"msum_{c}")))
                    .cast("double")
                    / F.sum(F.when(F.col("m_rows") > 0, F.col(f"mcnt_{c}")))
                ).alias(f"avg_league_{c}")
                for c in cols
            ],
            *[
                (F.min if agg == "min" else F.max)(
                    F.when(F.col("m_rows") > 0, m_avg[col])
                ).alias(f"best_{col}")
                for _, col, _, agg in WEAKNESS_METRICS
            ],
        )
        .filter(F.col("_spurs_rows").isNotNull() & (F.col("_m_rows") > 0))
        .drop("_spurs_rows", "_m_rows")
    )

    stack_args = []
    for label, col, polarity, _ in WEAKNESS_METRICS:
        op = "<" if polarity == "lt" else ">"
        lbl = label.replace("'", "''")
        stack_args.append(
            f"'{lbl}', avg_{col}, avg_league_{col}, best_{col}, "
            f"CASE WHEN avg_{col} {op} avg_league_{col} "
            f"THEN 'Debilidad' ELSE 'Fortaleza' END"
        )
    stack = F.expr(f"stack({len(WEAKNESS_METRICS)}, {', '.join(stack_args)})")
    return wide.select(
        "season2",
        stack.alias(
            "weakness_type", "valor_equipo", "valor_liga", "valor_mejor_equipo",
            "resultado",
        ),
    )


# The orphaned wide model's column naming + rating polarity
# (dbt/target/compiled/spurs_dbt/models/spurs_analysis/team_weaknesses.sql):
# (stat column, output alias, weakness comparison operator)
WIDE_METRICS = [
    ("fg_pct", "fg_pct", "<"),
    ("fg3_pct", "fg3_pct", "<"),
    ("tov", "turnovers", ">"),  # more turnovers = weakness
    ("reb", "rebounds", "<"),
    ("blk", "blocks", "<"),
    ("stl", "steals", "<"),
    ("plus_minus", "plus_minus", "<"),
]


def team_weaknesses_wide(silver: dict[str, DataFrame]) -> DataFrame:
    """The ORPHANED wide team_weaknesses model, reproduced faithfully.

    Reference: dbt/target/compiled/spurs_dbt/models/spurs_analysis/
    team_weaknesses.sql:1-120 (compiled but not in the live model dir —
    SURVEY §1.4). One row per season, 22 value columns + 14 Debilidad/
    Fortaleza ratings. Key semantic difference from the live unpivoted
    model: the "best team" is the single team with the highest average
    plus_minus that season (ROW_NUMBER, :56-80) and ALL seven best_*
    columns come from that one team — not the per-metric best.

    Deviation (documented): the reference window orders by
    avg_plus_minus alone, so ties are nondeterministic; we add
    team_id ASC as the tiebreak, mirrored in the oracle.
    """
    games, teams = silver["games"], silver["teams"]
    nba = games.join(F.broadcast(teams), games.team_id == teams.id)
    spurs = (
        nba.filter(F.col("team_id") == "1610612759")
        .groupBy(season_norm("season").alias("season2"))
        .agg(*[davg(c, scale=3).alias(f"avg_{a}") for c, a, _ in WIDE_METRICS])
    )
    league = nba.groupBy(season_norm("season").alias("season2")).agg(
        *[
            davg(c, scale=3).alias(f"avg_league_{a}")
            for c, a, _ in WIDE_METRICS
        ]
    )
    per_team = nba.groupBy(
        season_norm("season").alias("season2"), "team_id"
    ).agg(*[davg(c, scale=3).alias(f"avg_{a}") for c, a, _ in WIDE_METRICS])
    w = Window.partitionBy("season2").orderBy(
        F.desc("avg_plus_minus"), F.asc("team_id")
    )
    best = (
        per_team.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "season2",
            *[
                F.col(f"avg_{a}").alias(f"best_team_avg_{a}")
                for _, a, _ in WIDE_METRICS
            ],
        )
    )
    out = spurs.join(league, "season2").join(best, "season2")
    value_cols = []
    for _, a, _ in WIDE_METRICS:
        value_cols += [f"avg_{a}", f"avg_league_{a}", f"best_team_avg_{a}"]
    rating_cols = []
    for _, a, op in WIDE_METRICS:
        for ref, suffix in (
            (f"avg_league_{a}", "league"),
            (f"best_team_avg_{a}", "best_team"),
        ):
            rating_cols.append(
                F.when(
                    F.expr(f"avg_{a} {op} {ref}"), F.lit("Debilidad")
                )
                .otherwise(F.lit("Fortaleza"))
                .alias(f"{a}_rating_vs_{suffix}")
            )
    return out.select("season2", *value_cols, *rating_cols)


def spurs_player_contributions_unpivoted(silver: dict[str, DataFrame]) -> DataFrame:
    """Per-Spurs-player averages, long format.

    Reference: dbt/models/spurs_analysis/spurs_player_contributions_unpivoted.sql.
    """
    ps = silver["player_stats"]
    src = (
        ps.filter(F.col("team_abbreviation") == "SAS")
        .groupBy("player_id", "player_name", "team_abbreviation")
        .agg(*_seven_avgs())
    )
    stack_args = []
    for label, col, _, _ in WEAKNESS_METRICS:
        lbl = label.replace("'", "''")
        stack_args.append(f"'{lbl}', avg_{col}")
    stack = F.expr(f"stack({len(WEAKNESS_METRICS)}, {', '.join(stack_args)})")
    return src.select(
        "player_id", "player_name", stack.alias("rubro", "valor")
    )


def streaks_and_rivals(silver: dict[str, DataFrame]) -> DataFrame:
    """Longest win/loss streaks + biggest win/loss margins — one row.

    Reference: dbt/models/spurs_analysis/streaks_and_rivals.sql.
    Preserved quirk: plus_minus is compared as VARCHAR (lexicographic
    MAX/MIN, :70,:86). Preserved contract: exactly ONE row even when a
    branch is empty (scalar-subquery NULLs, :92-102). Deviations:
    streak windows partition by season; deterministic tiebreaks —
    (game_date, matchup) in the running-sum order, season+grp on the
    streak pick, opponent+season+game_date on the extreme-game pick.
    """
    games = silver["games"]
    spurs = games.filter(F.col("team_abbreviation") == "SAS").select(
        season_norm("season").alias("season"),
        "game_date",
        "matchup",
        "plus_minus",
        F.when(F.col("wl") == "W", 1).otherwise(0).alias("is_win"),
        F.when(F.col("wl") == "L", 1).otherwise(0).alias("is_loss"),
    )
    # matchup tiebreak: two games on one date would otherwise make the
    # running-sum ROWS frame (and so grp assignment) order-dependent
    w = (
        Window.partitionBy("season")
        .orderBy("game_date", "matchup")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # Round 5: the former four branch subtrees (two streak windows, two
    # extreme-game sorts), each materialized as its own broadcast job,
    # fold into two global aggregations — 7 Spark jobs -> 4 at fixture
    # scale. BOTH running sums ride ONE window pass; the win/loss grp
    # streams melt to long form and each pick is a min_by argmax whose
    # struct key reproduces the former ORDER BY exactly
    # ((length DESC, season ASC, grp ASC) == min of
    # (-length, season, grp); rows of the other kind carry a NULL key
    # and min_by skips them). A global aggregate returns exactly ONE
    # row even on empty input, so the reference's scalar-subquery
    # one-row contract (NULLs where a branch is empty, :92-102) holds
    # with no literal-anchor join chain.
    flagged = spurs.select(
        "season", "game_date", "matchup", "plus_minus", "is_win", "is_loss",
        F.sum("is_loss").over(w).alias("grp_w"),
        F.sum("is_win").over(w).alias("grp_l"),
    )
    long = (
        flagged.select(
            "season",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("win").alias("kind"),
                        F.col("grp_w").alias("grp"),
                        F.col("is_win").alias("flag"),
                    ),
                    F.struct(
                        F.lit("loss").alias("kind"),
                        F.col("grp_l").alias("grp"),
                        F.col("is_loss").alias("flag"),
                    ),
                )
            ).alias("s"),
        )
        .select("season", "s.kind", "s.grp", "s.flag")
        .filter(F.col("flag") == 1)
    )
    streaks = long.groupBy("kind", "season", "grp").agg(
        F.count(F.lit(1)).alias("streak_length")
    )
    # season in the tiebreak: grp restarts per season, so
    # (streak_length, grp) alone is not unique across seasons
    streak_key = F.struct(
        (-F.col("streak_length")).alias("k1"),
        F.col("season").alias("k2"),
        F.col("grp").alias("k3"),
    )
    streak_val = F.struct("season", "streak_length")
    picks_streak = streaks.agg(
        F.min_by(
            streak_val, F.when(F.col("kind") == "win", streak_key)
        ).alias("bws"),
        F.min_by(
            streak_val, F.when(F.col("kind") == "loss", streak_key)
        ).alias("wls"),
    )

    opponent = opponent_from_matchup("matchup")
    # VARCHAR max/min, as the reference (:70,:86); the equi-join on the
    # extreme value makes every surviving row's point_differential
    # EQUAL, so the former ORDER BY (pd, opponent, season, game_date)
    # reduces to the pure-ASC (opponent, season, game_date) min_by key
    ext = spurs.agg(
        F.max("plus_minus").alias("mx"), F.min("plus_minus").alias("mn")
    )
    matches = spurs.join(
        F.broadcast(ext),
        (spurs.plus_minus == ext.mx) | (spurs.plus_minus == ext.mn),
    ).select(
        "season", "game_date", opponent.alias("opponent"),
        F.col("plus_minus").alias("point_differential"), "mx", "mn",
    )
    game_key = F.struct(
        F.col("opponent").alias("k1"),
        F.col("season").alias("k2"),
        F.col("game_date").alias("k3"),
    )
    game_val = F.struct("season", "opponent", "point_differential")
    picks_game = matches.agg(
        F.min_by(
            game_val,
            F.when(F.col("point_differential") == F.col("mx"), game_key),
        ).alias("bw"),
        F.min_by(
            game_val,
            F.when(F.col("point_differential") == F.col("mn"), game_key),
        ).alias("bl"),
    )

    # Scalar-subquery semantics (streaks_and_rivals.sql:92-102): both
    # pick frames are GLOBAL aggregates — exactly one row each even on
    # empty input, with NULL structs where a branch is empty — so their
    # cross join is exactly one row and the struct fields unpack into
    # the reference's columns (NULL struct -> NULL fields).
    out = picks_streak.crossJoin(F.broadcast(picks_game))
    return out.select(
        F.col("bws.season").alias("best_winning_streak_season"),
        F.col("bws.streak_length").alias("best_winning_streak_length"),
        F.col("wls.season").alias("worst_losing_streak_season"),
        F.col("wls.streak_length").alias("worst_losing_streak_length"),
        F.col("bw.season").alias("biggest_win_season"),
        F.col("bw.opponent").alias("team_beat_by_most"),
        F.col("bw.point_differential").alias("biggest_win_margin"),
        F.col("bl.season").alias("biggest_loss_season"),
        F.col("bl.opponent").alias("team_lost_to_by_most"),
        F.col("bl.point_differential").alias("biggest_loss_margin"),
    )


# players_recommendations branch metadata — labels/positions/reasons are
# the reference's output contract (players_recommendations.sql:54-147)
RECOMMENDATION_BRANCHES = [
    ("Porcentaje de tiro de campo", "fg_pct", False, ("G", "F"),
     "Contratar un tirador de élite para mejorar la eficiencia del tiro."),
    ("Porcentaje de tres", "fg3_pct", False, ("G", "G-F", "F"),
     "Contratar un tirador de élite para abrir el campo."),
    ("Rebotes", "reb", False, ("F", "F-C", "C"),
     "Adquirir un rebotador consistente para controlar los tableros."),
    ("Pérdidas de balón", "tov", True, ("G",),
     "Incorporar un base que reduzca las pérdidas de balón."),
    ("Robos", "stl", False, ("G", "F"),
     "Firmar un defensor perimetral para mejorar la defensa en el robo de balones."),
    ("Bloqueos", "blk", False, ("F-C", "C"),
     "Contratar un defensor interior para proteger el aro y aumentar los bloqueos."),
    ("Diferencial Puntos", "plus_minus", False, None,
     "Contratar a un jugador con impacto positivo en el diferencial de puntos."),
]


def players_recommendations(
    silver: dict[str, DataFrame], weaknesses: DataFrame | None = None
) -> DataFrame:
    """Top-5 signing candidates per detected weakness.

    Reference: dbt/models/spurs_analysis/players_recommendations.sql.
    The one model->model edge: consumes team_weaknesses_unpivoted
    (ref() at :7). Deviations: ROW_NUMBER tiebreak on player_id;
    NULL metric averages rank last in BOTH directions (see inline
    note). Preserved quirk: MAX(salary_usd) over VARCHAR (:51).
    """
    if weaknesses is None:
        weaknesses = team_weaknesses_unpivoted(silver)

    players, ps = silver["players"], silver["player_stats"]
    p = players.select("player_id", "player", "position").distinct()
    pgs = ps.groupBy("player_id", "player_name").agg(*_seven_avgs())
    # Round 5: the three per-player side tables (free-agent flag,
    # injury flag, max-salary) fold into ONE union + groupBy and a
    # single broadcast, instead of three separately-materialized
    # broadcast subtrees (each was its own Spark job at fixture
    # scale). Equivalence: the former right sides were unique per
    # player_id (fa deduped upstream, inj .distinct(), sal grouped),
    # so each left join preserved row count — exactly what one left
    # join to a grouped frame does; EXISTS-ness becomes a max(flag),
    # and the VARCHAR MAX(salary_usd) quirk (:51) is associative, so
    # grouping the raw salary rows gives the identical max.
    flags = (
        silver["free_agents"]
        .select(
            F.col("player_id").alias("pid"),
            F.lit("fa").alias("kind"),
            F.lit(None).cast("string").alias("sal"),
        )
        .unionByName(
            silver["injuries"].select(
                F.col("player_id").alias("pid"),
                F.lit("inj").alias("kind"),
                F.lit(None).cast("string").alias("sal"),
            )
        )
        .unionByName(
            silver["salaries"].select(
                F.col("player_id").alias("pid"),
                F.lit("sal").alias("kind"),
                F.col("salary_usd").alias("sal"),
            )
        )
        .groupBy("pid")
        .agg(
            F.max(F.when(F.col("kind") == "fa", 1).otherwise(0)).alias("faf"),
            F.max(F.when(F.col("kind") == "inj", 1).otherwise(0)).alias("injf"),
            F.max(F.when(F.col("kind") == "sal", F.col("sal"))).alias(
                "salary_usd"
            ),  # VARCHAR max, as reference
        )
    )

    ranked = (
        p.join(pgs, "player_id")
        .join(F.broadcast(flags), p.player_id == flags.pid, "left")
        .select(
            "player_id",
            F.col("player").alias("player_name"),
            "position",
            F.coalesce(F.col("faf") == 1, F.lit(False)).alias("is_free_agent"),
            F.coalesce(F.col("injf") == 1, F.lit(False)).alias("is_injured"),
            F.col("salary_usd").cast("double").alias("salary"),
            *[F.col(f"avg_{c}") for _, c, _, _ in WEAKNESS_METRICS],
        )
    )
    # The reference computes 7 un-partitioned ROW_NUMBER windows (each a
    # single-partition global sort) and then filters the same subtree 7x
    # in a UNION ALL (players_recommendations.sql:26-32,54-147). Melting
    # the 7 metrics to long form turns that into ONE pass: one stack(),
    # one window partitioned by metric (7 parallel rank partitions), one
    # filter. Same rows; scales out instead of serializing.
    stack_args = ", ".join(
        f"'{col}', avg_{col}" for _, col, _, _, _ in RECOMMENDATION_BRANCHES
    )
    long = ranked.select(
        "player_id",
        "player_name",
        "position",
        "is_free_agent",
        "is_injured",
        "salary",
        F.expr(f"stack({len(RECOMMENDATION_BRANCHES)}, {stack_args})").alias(
            "metric", "metric_value"
        ),
    )
    asc_metrics = [c for _, c, asc, _, _ in RECOMMENDATION_BRANCHES if asc]
    is_asc = F.col("metric").isin(asc_metrics)
    # NULL metric averages rank LAST in both directions: the DuckDB
    # twin's default is nulls_last for ASC and DESC alike, and a
    # never-measured player topping a "best at X" list would be junk.
    # (The reference's Postgres differs on DESC — nulls-as-largest
    # puts them FIRST there — a deviation we take deliberately; the
    # sign-flip below maps null -> null, so placement must be explicit.)
    null_rank = F.when(F.col("metric_value").isNull(), 2).otherwise(1)
    sort_val = F.when(is_asc, F.col("metric_value")).otherwise(
        -F.col("metric_value")
    )
    rank_w = Window.partitionBy("metric").orderBy(
        null_rank.asc(), sort_val.asc(), F.asc("player_id")
    )
    # Rank over ALL players first, position-filter after — exactly the
    # reference's order of operations (rank_* <= 5 AND position IN ...).
    pos_ok = F.lit(False)
    label_col = F.lit(None).cast("string")
    reason_col = F.lit(None).cast("string")
    for label, col, _, positions, reason in RECOMMENDATION_BRANCHES:
        here = F.col("metric") == col
        allowed = (
            here if positions is None else here & F.col("position").isin(*positions)
        )
        pos_ok = pos_ok | allowed
        label_col = F.when(here, F.lit(label)).otherwise(label_col)
        reason_col = F.when(here, F.lit(reason)).otherwise(reason_col)
    top_targets = (
        long.withColumn("rank", F.row_number().over(rank_w))
        .filter((F.col("rank") <= 5) & pos_ok)
        .select(
            label_col.alias("weakness_type"),
            "player_id",
            "is_free_agent",
            "is_injured",
            "player_name",
            "metric_value",
            "position",
            "salary",
            reason_col.alias("reason"),
        )
    )

    weak = weaknesses.filter(F.col("resultado") == "Debilidad").select(
        "season2", "weakness_type"
    )
    return weak.join(top_targets, "weakness_type").select(
        "season2",
        "weakness_type",
        F.col("player_name").alias("recommended_player"),
        "position",
        "metric_value",
        "salary",
        "reason",
        "player_id",
        "is_free_agent",
        "is_injured",
    )


def build_all(silver: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """All six gold models in dependency order (the dbt DAG)."""
    weaknesses = team_weaknesses_unpivoted(silver)
    return {
        "summary_by_season": summary_by_season(silver),
        "home_vs_away": home_vs_away(silver),
        "team_weaknesses_unpivoted": weaknesses,
        "spurs_player_contributions_unpivoted": spurs_player_contributions_unpivoted(
            silver
        ),
        "streaks_and_rivals": streaks_and_rivals(silver),
        "players_recommendations": players_recommendations(silver, weaknesses),
    }
