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

Construction note (round 6): wide column families are built as SQL
strings (``F.expr`` / ``selectExpr``), not as Column-method chains.
Classic PySpark pays one py4j socket round-trip per Column call; these
models build hundreds of expressions, and profiling showed ~0.45 s of
each fresh build was py4j chatter — more than Catalyst optimization
and execution combined. An expr string is ONE round-trip parsed
JVM-side into the identical expression tree, so the logical plan (and
the bit-exact oracle parity) is unchanged; per-model fresh-build time
dropped 2-4x. The SQL fragments mirror the DuckDB oracle fragments in
``gold_fixture.py`` where the dialects agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import SEASON_NORM_SQL, davg_sql

#: Spark-side season normalization (reference summary_by_season.sql:13-14)
_SEASON2 = SEASON_NORM_SQL.format(c="season")

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


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def summary_by_season(silver: dict[str, DataFrame]) -> DataFrame:
    """League table: wins/losses/avg points + dense_rank per season.

    Reference: dbt/models/spurs_analysis/summary_by_season.sql:3-42.
    """
    games, teams = silver["games"], silver["teams"]
    nba = games.join(F.broadcast(teams), games.team_id == teams.id)
    base = nba.selectExpr(
        f"{_SEASON2} AS season",
        "team_name",
        "wl",
        "CAST(pts AS INT) AS pts",
    )
    summarized = base.groupBy("season", "team_name").agg(
        F.expr("COUNT(*) AS total_games"),
        F.expr("SUM(CASE WHEN wl = 'W' THEN 1 ELSE 0 END) AS wins"),
        F.expr("SUM(CASE WHEN wl = 'L' THEN 1 ELSE 0 END) AS losses"),
        F.expr(f"ROUND({davg_sql('pts', 0)}, 2) AS avg_points"),
    )
    return summarized.selectExpr(
        "season",
        "team_name",
        "wins",
        "losses",
        "total_games",
        "avg_points",
        "CAST(DENSE_RANK() OVER (PARTITION BY season "
        "ORDER BY wins DESC, losses ASC, avg_points DESC) AS INT) "
        "AS team_ranking",
    )


def home_vs_away(silver: dict[str, DataFrame]) -> DataFrame:
    """Per-venue split (Home/Away from the matchup LIKE pattern).

    Reference: dbt/models/spurs_analysis/home_vs_away.sql.
    Note the model uses teams.full_name (not games.team_name).
    """
    games, teams = silver["games"], silver["teams"]
    nba = games.join(F.broadcast(teams), games.team_id == teams.id)
    base = nba.selectExpr(
        f"{_SEASON2} AS season",
        "full_name AS team_name",
        "CASE WHEN matchup LIKE '%@%' THEN 'Away' ELSE 'Home' END "
        "AS location",
        "wl",
        "CAST(pts AS INT) AS pts",
    )
    return base.groupBy("season", "team_name", "location").agg(
        F.expr("COUNT(*) AS games"),
        F.expr("SUM(CASE WHEN wl = 'W' THEN 1 ELSE 0 END) AS wins"),
        F.expr("SUM(CASE WHEN wl = 'L' THEN 1 ELSE 0 END) AS losses"),
        F.expr(f"ROUND({davg_sql('pts', 0)}, 2) AS avg_points"),
    )


def _seven_avgs(prefix: str = "avg_") -> list:
    # unbound expressions: they aggregate whatever frame the .agg() is
    # applied to (a DataFrame parameter here would imply a binding that
    # does not exist)
    return [
        F.expr(f"{davg_sql(col, 3)} AS {prefix}{col}")
        for _, col, _, _ in WEAKNESS_METRICS
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
    cols = [col for _, col, _, _ in WEAKNESS_METRICS]
    # the decimal cast of each VARCHAR metric is PROJECTED once: this
    # aggregate runs interpreted (no whole-stage codegen above the
    # cached fixture, hence no subexpression elimination), so inlining
    # the cast into all four aggregate families would parse each
    # string 4x per row. count(_d_c) == count(c): a non-null string
    # casts to a non-null decimal (ANSI raises on malformed input
    # rather than producing NULL, identically to the oracle's CAST).
    proj = joined.selectExpr(
        f"{_SEASON2} AS season2",
        "team_name",
        "id IS NOT NULL AS _m",  # teams match flag (teams.id)
        *[f"CAST({c} AS DECIMAL(18,3)) AS _d_{c}" for c in cols],
    )
    per_team = proj.groupBy("season2", "team_name").agg(
        F.expr("COUNT(*) AS all_rows"),
        F.expr("SUM(CASE WHEN _m THEN 1 ELSE 0 END) AS m_rows"),
        *[
            F.expr(f"SUM(CASE WHEN _m THEN _d_{c} END) AS msum_{c}")
            for c in cols
        ],
        *[
            F.expr(f"COUNT(CASE WHEN _m THEN _d_{c} END) AS mcnt_{c}")
            for c in cols
        ],
        *[F.expr(f"SUM(_d_{c}) AS asum_{c}") for c in cols],
        *[F.expr(f"COUNT(_d_{c}) AS acnt_{c}") for c in cols],
    )
    sas = "team_name = 'San Antonio Spurs'"
    wide = (
        per_team.groupBy("season2")
        .agg(
            F.expr(f"SUM(CASE WHEN {sas} THEN all_rows END) AS _spurs_rows"),
            F.expr("SUM(m_rows) AS _m_rows"),
            *[
                F.expr(
                    f"MAX(CASE WHEN {sas} THEN "
                    f"CAST(asum_{c} AS DOUBLE) / acnt_{c} END) AS avg_{c}"
                )
                for c in cols
            ],
            *[
                F.expr(
                    f"CAST(SUM(CASE WHEN m_rows > 0 THEN msum_{c} END) "
                    f"AS DOUBLE) / SUM(CASE WHEN m_rows > 0 THEN mcnt_{c} "
                    f"END) AS avg_league_{c}"
                )
                for c in cols
            ],
            *[
                F.expr(
                    f"{agg.upper()}(CASE WHEN m_rows > 0 THEN "
                    f"CAST(msum_{col} AS DOUBLE) / mcnt_{col} END) "
                    f"AS best_{col}"
                )
                for _, col, _, agg in WEAKNESS_METRICS
            ],
        )
        .filter("_spurs_rows IS NOT NULL AND _m_rows > 0")
        .drop("_spurs_rows", "_m_rows")
    )

    stack_args = []
    for label, col, polarity, _ in WEAKNESS_METRICS:
        op = "<" if polarity == "lt" else ">"
        stack_args.append(
            f"{_sql_lit(label)}, avg_{col}, avg_league_{col}, best_{col}, "
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


def weakness_flags(silver: dict[str, DataFrame]) -> DataFrame:
    """(season2, weakness_type) rows where the Spurs trail the league —
    exactly ``team_weaknesses_unpivoted``'s Debilidad rows, computed
    without the parts the consumer never reads.

    ``players_recommendations`` joins only on these two columns, so the
    per-team grain and the best-of min/max aggregates (needed solely
    for ``valor_mejor_equipo``) are dead weight there — Catalyst cannot
    prune them because stack() computes every branch before the filter.
    One groupBy(season2) pass over the same left-join projection gives
    bit-identical spurs/league averages by the usual decimal
    decomposition: filter-then-sum equals group-by-team-then-pick for
    the single Spurs group, and the league division's operands are the
    same exact decimal total and count. The emit condition (spurs CTE
    non-empty AND any matched rows) and the CASE polarity (NULL
    comparison -> Fortaleza -> not emitted) are carried over verbatim.
    """
    games, teams = silver["games"], silver["teams"]
    joined = games.join(F.broadcast(teams), games.team_id == teams.id, "left")
    cols = [col for _, col, _, _ in WEAKNESS_METRICS]
    proj = joined.selectExpr(
        f"{_SEASON2} AS season2",
        "team_name = 'San Antonio Spurs' AS _sas",
        "id IS NOT NULL AS _m",
        *[f"CAST({c} AS DECIMAL(18,3)) AS _d_{c}" for c in cols],
    )
    per_season = proj.groupBy("season2").agg(
        F.expr("SUM(CASE WHEN _sas THEN 1 END) AS _spurs_rows"),
        F.expr("SUM(CASE WHEN _m THEN 1 ELSE 0 END) AS _m_rows"),
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN _sas THEN _d_{c} END) AS DOUBLE) "
                f"/ COUNT(CASE WHEN _sas THEN _d_{c} END) AS avg_{c}"
            )
            for c in cols
        ],
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN _m THEN _d_{c} END) AS DOUBLE) "
                f"/ COUNT(CASE WHEN _m THEN _d_{c} END) AS avg_league_{c}"
            )
            for c in cols
        ],
    )
    stack_args = []
    for label, col, polarity, _ in WEAKNESS_METRICS:
        op = "<" if polarity == "lt" else ">"
        stack_args.append(f"{_sql_lit(label)}, avg_{col} {op} avg_league_{col}")
    stack = F.expr(f"stack({len(WEAKNESS_METRICS)}, {', '.join(stack_args)})")
    return (
        per_season.filter("_spurs_rows IS NOT NULL AND _m_rows > 0")
        .select("season2", stack.alias("weakness_type", "_is_weak"))
        .filter("_is_weak")
        .select("season2", "weakness_type")
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

    Round 6 (VERDICT r05 item 2, the f191b8f recipe): the three
    aggregation subtrees over ``nba`` (spurs / league / per_team), each
    re-casting the VARCHAR metrics inside an interpreted aggregate,
    collapse to ONE grouped pass — casts projected once, per-team
    decimal sums + counts — followed by one window pass over the tiny
    (season, team) grain: league totals are season-window sums of the
    per-team sums, spurs values are the season-window pick of the one
    Spurs row, and the best team is the existing ROW_NUMBER top-1, all
    in the same window stage. Bit-exactness by decimal decomposition:
    ``davg`` is cast(sum(decimal(18,3)) as double)/count; decimal sums
    re-sum exactly across the per-team grain, counts add, and each
    IEEE division happens once at the end either way. One shuffle of
    the fact rows instead of three; no joins.
    """
    games, teams = silver["games"], silver["teams"]
    nba = games.join(F.broadcast(teams), games.team_id == teams.id)
    cols = [c for c, _, _ in WIDE_METRICS]
    sas = "team_id = '1610612759'"
    over = "OVER (PARTITION BY season2)"
    # casts projected once — this aggregate runs interpreted above the
    # cached fixture (no whole-stage codegen, hence no subexpression
    # elimination); count(_d_c) == count(c) because the ANSI cast
    # raises on malformed input rather than producing NULL, exactly
    # like the oracle's CAST.
    proj = nba.selectExpr(
        f"{_SEASON2} AS season2",
        "team_id",
        *[f"CAST({c} AS DECIMAL(18,3)) AS _d_{c}" for c in cols],
    )
    per_team = proj.groupBy("season2", "team_id").agg(
        *[F.expr(f"SUM(_d_{c}) AS sum_{c}") for c in cols],
        *[F.expr(f"COUNT(_d_{c}) AS cnt_{c}") for c in cols],
    )
    staged = per_team.selectExpr(
        "season2",
        "team_id",
        "CAST(sum_plus_minus AS DOUBLE) / cnt_plus_minus "
        "AS pt_avg_plus_minus",
        f"MAX(CASE WHEN {sas} THEN TRUE END) {over} AS _has_spurs",
        *[
            f"CAST(MAX(CASE WHEN {sas} THEN sum_{c} END) {over} AS DOUBLE)"
            f" / MAX(CASE WHEN {sas} THEN cnt_{c} END) {over} AS avg_{a}"
            for c, a, _ in WIDE_METRICS
        ],
        *[
            f"CAST(SUM(sum_{c}) {over} AS DOUBLE) / SUM(cnt_{c}) {over} "
            f"AS avg_league_{a}"
            for c, a, _ in WIDE_METRICS
        ],
        *[
            f"CAST(sum_{c} AS DOUBLE) / cnt_{c} AS best_team_avg_{a}"
            for c, a, _ in WIDE_METRICS
        ],
    )
    out = staged.withColumn(
        "rn",
        F.expr(
            "ROW_NUMBER() OVER (PARTITION BY season2 "
            "ORDER BY pt_avg_plus_minus DESC, team_id ASC)"
        ),
    ).filter("rn = 1 AND _has_spurs")
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
                f"CASE WHEN avg_{a} {op} {ref} THEN 'Debilidad' "
                f"ELSE 'Fortaleza' END AS {a}_rating_vs_{suffix}"
            )
    return out.selectExpr("season2", *value_cols, *rating_cols)


def spurs_player_contributions_unpivoted(silver: dict[str, DataFrame]) -> DataFrame:
    """Per-Spurs-player averages, long format.

    Reference: dbt/models/spurs_analysis/spurs_player_contributions_unpivoted.sql.
    """
    ps = silver["player_stats"]
    src = (
        ps.filter("team_abbreviation = 'SAS'")
        .groupBy("player_id", "player_name", "team_abbreviation")
        .agg(*_seven_avgs())
    )
    stack_args = [
        f"{_sql_lit(label)}, avg_{col}" for label, col, _, _ in WEAKNESS_METRICS
    ]
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
    spurs = games.filter("team_abbreviation = 'SAS'").selectExpr(
        f"{_SEASON2} AS season",
        "game_date",
        "matchup",
        "plus_minus",
        "CASE WHEN wl = 'W' THEN 1 ELSE 0 END AS is_win",
        "CASE WHEN wl = 'L' THEN 1 ELSE 0 END AS is_loss",
    )
    # matchup tiebreak: two games on one date would otherwise make the
    # running-sum ROWS frame (and so grp assignment) order-dependent
    run = (
        "OVER (PARTITION BY season ORDER BY game_date, matchup "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )

    # Round 7 (VERDICT r06 item 2): ONE job for all four picks. Round
    # 5's shape still ran 3 jobs (two broadcast builds + main); the
    # broadcast of the extreme plus_minus values is gone entirely —
    # instead of computing MAX/MIN(plus_minus) first and joining back,
    # every game row melts into 'bw'/'bl' candidates GROUPED BY its own
    # plus_minus value, each group pre-resolving the in-group argmin
    # (opponent, season, game_date), and the final global aggregate
    # picks the group whose plus_minus is the VARCHAR MAX (MAX_BY) /
    # MIN (MIN_BY). That two-level aggregation is exactly the old
    # "filter to pd = extreme, then argmin" because the extreme is a
    # single group key. Streak rows ride the SAME melt: both running
    # sums come from ONE window pass, melt to ('win'/'loss', season,
    # grp) groups whose COUNT(*) is the streak length, and the same
    # final aggregate argmins (length DESC, season ASC, grp ASC) ==
    # MIN_BY key (-length, season, grp). Rows of another kind carry a
    # NULL key and MIN_BY/MAX_BY skip them. A global aggregate returns
    # exactly ONE row even on empty input, so the reference's
    # scalar-subquery one-row contract (NULLs where a branch is empty,
    # :92-102) holds with no join at all. Scale: the melt is 4 rows per
    # game (linear); group count is bounded by #streaks + #distinct
    # margins, so the SinglePartition final agg sees a tiny frame.
    #
    # opponent extraction: 3-way CASE as in streaks_and_rivals.sql:63-67
    # (split_part returns '' when the delimiter is absent; ELSE passes
    # the raw matchup through, NOT NULL)
    opponent = (
        "CASE WHEN matchup LIKE '%vs.%' THEN split_part(matchup, 'vs. ', 2) "
        "WHEN matchup LIKE '%@%' THEN split_part(matchup, '@ ', 2) "
        "ELSE matchup END"
    )
    flagged = spurs.selectExpr(
        "season",
        "game_date",
        f"{opponent} AS opponent",
        "plus_minus",
        "is_win",
        "is_loss",
        f"SUM(is_loss) {run} AS grp_w",
        f"SUM(is_win) {run} AS grp_l",
    )
    # Uniform long schema: gseason/gk are the group key (gk carries the
    # streak grp as a string, or the raw VARCHAR plus_minus for game
    # rows — a NULL plus_minus groups under a NULL key and is skipped
    # by the final MAX_BY/MIN_BY, reproducing NULL-skipping MAX/MIN);
    # grp keeps the NUMERIC running-sum for the streak tiebreak.
    def _melt(kind, gseason, gk, grp, opp, gdate, pd, flag):
        return (
            f"STRUCT({kind} AS kind, {gseason} AS gseason, {gk} AS gk,"
            f" {grp} AS grp, season, {opp} AS opponent,"
            f" {gdate} AS gdate, {pd} AS pd, {flag} AS flag)"
        )

    null_s = "CAST(NULL AS STRING)"
    long = flagged.selectExpr(
        "INLINE(ARRAY("
        + ", ".join(
            [
                _melt("'win'", "season", "CAST(grp_w AS STRING)", "grp_w",
                      null_s, null_s, null_s, "is_win"),
                _melt("'loss'", "season", "CAST(grp_l AS STRING)", "grp_l",
                      null_s, null_s, null_s, "is_loss"),
                _melt("'bw'", null_s, "plus_minus", "CAST(NULL AS BIGINT)",
                      "opponent", "game_date", "plus_minus", "1"),
                _melt("'bl'", null_s, "plus_minus", "CAST(NULL AS BIGINT)",
                      "opponent", "game_date", "plus_minus", "1"),
            ]
        )
        + "))"
    ).filter("flag = 1")
    grouped = long.groupBy("kind", "gseason", "gk").agg(
        F.expr("COUNT(*) AS cnt"),
        F.expr("MIN(grp) AS grp"),
        F.expr("MIN(pd) AS pd"),
        F.expr(
            "MIN_BY(STRUCT(season, opponent, pd AS point_differential), "
            "STRUCT(opponent AS k1, season AS k2, gdate AS k3)) AS pick"
        ),
    )
    streak_key = "STRUCT(-cnt AS k1, gseason AS k2, grp AS k3)"
    streak_val = "STRUCT(gseason AS season, cnt AS streak_length)"
    out = grouped.agg(
        F.expr(
            f"MIN_BY({streak_val}, CASE WHEN kind = 'win' "
            f"THEN {streak_key} END) AS bws"
        ),
        F.expr(
            f"MIN_BY({streak_val}, CASE WHEN kind = 'loss' "
            f"THEN {streak_key} END) AS wls"
        ),
        F.expr("MAX_BY(pick, CASE WHEN kind = 'bw' THEN pd END) AS bw"),
        F.expr("MIN_BY(pick, CASE WHEN kind = 'bl' THEN pd END) AS bl"),
    )
    return out.selectExpr(
        "bws.season AS best_winning_streak_season",
        "bws.streak_length AS best_winning_streak_length",
        "wls.season AS worst_losing_streak_season",
        "wls.streak_length AS worst_losing_streak_length",
        "bw.season AS biggest_win_season",
        "bw.opponent AS team_beat_by_most",
        "bw.point_differential AS biggest_win_margin",
        "bl.season AS biggest_loss_season",
        "bl.opponent AS team_lost_to_by_most",
        "bl.point_differential AS biggest_loss_margin",
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
    weak = (
        weaknesses.filter("resultado = 'Debilidad'").select(
            "season2", "weakness_type"
        )
        if weaknesses is not None
        # standalone: the pruned one-pass form (bit-identical Debilidad
        # rows, none of the best-of work) — see weakness_flags
        else weakness_flags(silver)
    )

    players, ps = silver["players"], silver["player_stats"]
    pgs = ps.groupBy("player_id", "player_name").agg(*_seven_avgs())
    # Round 5 folded the three per-player side tables (free-agent flag,
    # injury flag, max-salary) into one union + groupBy; round 6
    # (VERDICT r05 item 7) folds the players DIM into the same union,
    # so the entire per-player side is ONE subtree broadcast ONCE
    # instead of two separately-materialized broadcast jobs.
    # Equivalence: the former p = players.select(...).distinct() is
    # exactly collect_set(struct(player, position)) per player_id
    # INLINE'd back out (set semantics = distinct triples; join-input
    # order is irrelevant); the flag right sides were unique per
    # player_id, so EXISTS-ness is a max(flag) — a pid with dim rows
    # but no flag rows gets 0, which the ==1 comparison maps to the
    # same False the former left-join NULL coalesced to; the VARCHAR
    # MAX(salary_usd) quirk (:51) is associative, so grouping the raw
    # salary rows gives the identical max, NULL when absent. A pid
    # with flag rows but no players row INLINEs zero dim structs —
    # the former INNER p join dropped it the same way.
    null_dim = "CAST(NULL AS STRUCT<player: STRING, position: STRING>) AS dim"

    def _side(tbl: str, kind: str, sal: str = "CAST(NULL AS STRING)",
              dim: str | None = None):
        return silver[tbl].selectExpr(
            "player_id AS pid",
            f"'{kind}' AS kind",
            f"{sal} AS sal",
            dim if dim is not None else null_dim,
        )

    side = (
        _side("players", "dim", dim="STRUCT(player, position) AS dim")
        .unionByName(_side("free_agents", "fa"))
        .unionByName(_side("injuries", "inj"))
        .unionByName(_side("salaries", "sal", sal="salary_usd"))
        .groupBy("pid")
        .agg(
            F.expr(
                "COLLECT_SET(CASE WHEN kind = 'dim' THEN dim END) AS dims"
            ),
            F.expr("MAX(CASE WHEN kind = 'fa' THEN 1 ELSE 0 END) AS faf"),
            F.expr("MAX(CASE WHEN kind = 'inj' THEN 1 ELSE 0 END) AS injf"),
            # VARCHAR max, as reference
            F.expr("MAX(CASE WHEN kind = 'sal' THEN sal END) AS salary_usd"),
        )
        .selectExpr("pid", "INLINE(dims)", "faf", "injf", "salary_usd")
    )

    # Round 7 (VERDICT r06 item 3): both former broadcast builds ran as
    # their own Spark jobs (collect + broadcast round trip each); as
    # shuffle-hash joins they are just extra tiny exchanges INSIDE the
    # one main job — 3 jobs -> 1 at fixture scale. At 100-TB scale this
    # is also the right plan shape: the per-player side is every player
    # (dim-bounded but not tiny), and hash-partitioning both per-player
    # frames on the join key beats shipping a full player-side build to
    # every executor.
    ranked = pgs.join(side.hint("merge"), pgs.player_id == side.pid).selectExpr(
        "player_id",
        "player AS player_name",
        "position",
        "faf = 1 AS is_free_agent",
        "injf = 1 AS is_injured",
        "CAST(salary_usd AS DOUBLE) AS salary",
        *[f"avg_{c}" for _, c, _, _ in WEAKNESS_METRICS],
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
    long = ranked.selectExpr(
        "player_id",
        "player_name",
        "position",
        "is_free_agent",
        "is_injured",
        "salary",
        f"stack({len(RECOMMENDATION_BRANCHES)}, {stack_args}) "
        "AS (metric, metric_value)",
    )
    asc_metrics = ", ".join(
        f"'{c}'" for _, c, asc, _, _ in RECOMMENDATION_BRANCHES if asc
    )
    # NULL metric averages rank LAST in both directions: the DuckDB
    # twin's default is nulls_last for ASC and DESC alike, and a
    # never-measured player topping a "best at X" list would be junk.
    # (The reference's Postgres differs on DESC — nulls-as-largest
    # puts them FIRST there — a deviation we take deliberately; the
    # sign-flip below maps null -> null, so placement must be explicit.)
    rank_sql = (
        "ROW_NUMBER() OVER (PARTITION BY metric ORDER BY "
        "CASE WHEN metric_value IS NULL THEN 2 ELSE 1 END ASC, "
        f"CASE WHEN metric IN ({asc_metrics}) THEN metric_value "
        "ELSE -metric_value END ASC, player_id ASC)"
    )
    # Rank over ALL players first, position-filter after — exactly the
    # reference's order of operations (rank_* <= 5 AND position IN ...).
    pos_branches = []
    label_branches = []
    reason_branches = []
    for label, col, _, positions, reason in RECOMMENDATION_BRANCHES:
        here = f"metric = '{col}'"
        if positions is None:
            pos_branches.append(here)
        else:
            in_list = ", ".join(f"'{p}'" for p in positions)
            pos_branches.append(f"({here} AND position IN ({in_list}))")
        label_branches.append(f"WHEN {here} THEN {_sql_lit(label)}")
        reason_branches.append(f"WHEN {here} THEN {_sql_lit(reason)}")
    top_targets = (
        long.withColumn("rank", F.expr(rank_sql))
        .filter(f"rank <= 5 AND ({' OR '.join(pos_branches)})")
        .selectExpr(
            f"CASE {' '.join(label_branches)} END AS weakness_type",
            "player_id",
            "is_free_agent",
            "is_injured",
            "player_name",
            "metric_value",
            "position",
            "salary",
            f"CASE {' '.join(reason_branches)} END AS reason",
        )
    )

    # at most |seasons| x 7 rows — pin the broadcast rather than leave
    # AQE to discover it from runtime stats (a merge join here would
    # ALSO exchange the probe side: the cached weaknesses frame hides
    # its partitioning behind an AdaptiveSparkPlan, so ENSURE_
    # REQUIREMENTS can't prove co-partitioning; broadcast keeps the
    # probe side exchange-free)
    return F.broadcast(weak).join(top_targets, "weakness_type").selectExpr(
        "season2",
        "weakness_type",
        "player_name AS recommended_player",
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
