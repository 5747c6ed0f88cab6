"""Spark 4 Python Data Source mapping the reference's NBA-API scans.

The reference's bronze layer is a sequence of driver-side fetch loops —
per-team roster requests with rate-limit sleeps
(``/root/reference/dags/spurs_historic_games.py:78-108``: one
``CommonTeamRoster`` call per team, records ``dict(zip(headers, row))``).
The idiomatic Spark mapping of "N independent API calls" is a custom
**DataSource** whose ``partitions()`` enumerate the calls: each team
becomes an ``InputPartition``, so the 30 fetches run distributed, and
the result is a DataFrame from the first line.

Two sources are provided:

- ``nba_api_stub`` serves deterministic hash-derived rows (identical to
  ``synth.build_players`` — same md5 salt convention) with no network;
- ``nba_api`` is the live form: same partition-per-team shape, each
  task calling ``CommonTeamRoster`` through a pluggable *transport*
  with the reference's retry policy (tenacity
  ``wait_exponential(multiplier=1, min=4, max=10)`` +
  ``stop_after_attempt(5)``, dags:138-141) re-implemented as a
  deterministic backoff loop — in-task retry for the rate-limit 429s
  the reference saw, with Spark task retry above it for node loss.

The partition-per-team shape is the part that matters at scale: a
paginated/keyed API fans out to |keys| partitions with bounded
per-task memory, instead of one driver loop.

Usage::

    spark.dataSource.register(NbaApiStubDataSource)
    roster = spark.read.format("nba_api_stub").load()

    spark.dataSource.register(NbaApiDataSource)     # needs network +
    live = (spark.read.format("nba_api")            # nba_api installed
            .option("season", "2024")
            .option("team_ids", "1610612759,1610612744")
            .load())
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..synth import N_TEAMS, PLAYERS_PER_TEAM, POSITIONS

ROSTER_SCHEMA = (
    "player_id string, player string, position string, season string, "
    "height_cm string, weight_kg string, age string"
)

#: (team_id, season) -> list of header->value dicts, one per roster row.
Transport = Callable[[int, str], list[dict]]


def _h(salt: str, key: str) -> int:
    """60-bit md5 hash — pure-Python twin of functions.scalar.md5_long."""
    return int(hashlib.md5((salt + key).encode()).hexdigest()[:15], 16)


class _TeamPartition(InputPartition):
    def __init__(self, team: int):
        self.team = team


class NbaRosterReader(DataSourceReader):
    def partitions(self) -> Sequence[InputPartition]:
        # one partition per team == one API call per task (dags:85-99)
        return [_TeamPartition(t) for t in range(N_TEAMS)]

    def read(self, partition: _TeamPartition) -> Iterator[tuple]:
        t = partition.team
        for j in range(PLAYERS_PER_TEAM):
            i = t * PLAYERS_PER_TEAM + j
            pid = str(100000 + t * 100 + j)
            yield (
                pid,
                f"Player_{pid}",
                POSITIONS[i % len(POSITIONS)],
                "2024",
                str(190 + _h("ht", pid) % 40),
                str(75 + _h("wt", pid) % 50),
                str(19 + _h("ag", pid) % 20),
            )


class NbaApiStubDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nba_api_stub"

    def schema(self) -> str:
        return ROSTER_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return NbaRosterReader()


# ---------------------------------------------------------------------------
# live mode: pluggable transport + reference retry semantics
# ---------------------------------------------------------------------------


def fetch_with_retry(
    transport: Transport,
    team_id: int,
    season: str,
    attempts: int = 5,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """Reference retry policy (dags:138-141) as a deterministic loop.

    tenacity's ``wait_exponential(multiplier=1, min=4, max=10)`` +
    ``stop_after_attempt(5)`` waits ~[4, 4, 4, 8] seconds between its 5
    tries; this loop doubles from 4s capped at 10s ([4, 8, 10, 10]) —
    same floor/ceiling contract, marginally gentler on the rate
    limiter. ``sleep`` is injectable so tests run without waiting.
    """
    delay = 4.0
    for attempt in range(1, attempts + 1):
        try:
            return transport(team_id, season)
        except Exception:
            if attempt == attempts:
                raise
            sleep(delay)
            delay = min(delay * 2, 10.0)
    raise AssertionError("unreachable")


def nba_api_transport(team_id: int, season: str) -> list[dict]:
    """The real CommonTeamRoster call (reference dags:85-99): returns
    one ``dict(zip(headers, row))`` per roster row. Imported lazily —
    ``nba_api`` is not in this container, so the import error surfaces
    only when live mode is actually requested."""
    from nba_api.stats.endpoints import commonteamroster  # env-gated

    d = commonteamroster.CommonTeamRoster(
        team_id=team_id, season=season
    ).get_dict()
    rs = d["resultSets"][0]
    return [dict(zip(rs["headers"], row)) for row in rs["rowSet"]]


def _roster_row_to_tuple(rec: dict, season: str) -> tuple:
    """Shape one API record onto ROSTER_SCHEMA (all-string silver
    contract; raw units pass through as strings, casts are gold's
    job — SURVEY §1.2)."""
    get = lambda *keys: next(  # noqa: E731 - tiny local accessor
        (str(rec[k]) for k in keys if rec.get(k) is not None), None
    )
    return (
        get("PLAYER_ID", "player_id"),
        get("PLAYER", "player"),
        get("POSITION", "position"),
        get("SEASON", "season") or season,
        get("HEIGHT", "height_cm"),
        get("WEIGHT", "weight_kg"),
        get("AGE", "age"),
    )


class LiveRosterReader(DataSourceReader):
    """Partition-per-team live reader: each task performs exactly one
    retried roster fetch, so executor memory holds one team's roster,
    never the league."""

    def __init__(
        self,
        team_ids: Sequence[int],
        season: str,
        transport: Transport | None = None,
        attempts: int = 5,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.team_ids = list(team_ids)
        self.season = season
        self.transport = transport or nba_api_transport
        self.attempts = attempts
        self.sleep = sleep

    def partitions(self) -> Sequence[InputPartition]:
        return [_TeamPartition(t) for t in self.team_ids]

    def read(self, partition: _TeamPartition) -> Iterator[tuple]:
        recs = fetch_with_retry(
            self.transport,
            partition.team,
            self.season,
            attempts=self.attempts,
            sleep=self.sleep,
        )
        for rec in recs:
            yield _roster_row_to_tuple(rec, self.season)


class NbaApiDataSource(DataSource):
    """Live NBA-API roster source (requires network + ``nba_api``).

    Options: ``season`` (default "2024"), ``team_ids`` (comma-separated
    numeric ids; default the reference's Spurs id), ``attempts``.
    """

    SPURS_TEAM_ID = 1610612759  # reference dags:115

    @classmethod
    def name(cls) -> str:
        return "nba_api"

    def schema(self) -> str:
        return ROSTER_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        season = self.options.get("season", "2024")
        raw = self.options.get("team_ids", str(self.SPURS_TEAM_ID))
        team_ids = [int(x) for x in str(raw).split(",") if x]
        attempts = int(self.options.get("attempts", 5))
        return LiveRosterReader(team_ids, season, attempts=attempts)


# ---------------------------------------------------------------------------
# streaming form: offset-tracked incremental feed
# ---------------------------------------------------------------------------
#
# The reference ingests by WEEKLY FULL REFRESH (drop + reload,
# /root/reference/dags/spurs_historic_games.py:220-268) — every run
# refetches everything. The streaming-native mapping is an
# offset-tracked incremental source: a monotonically increasing "game
# day" is the offset, each micro-batch covers [start_day, end_day) and
# fans out one partition per (team, day-range) — so a restart resumes
# from the committed day instead of refetching history, and the fetch
# loop distributes exactly like the batch source above.
#
# The stub transport is deterministic (same md5-salt convention as
# synth.py), so tests can assert exactly-once delivery byte-for-byte
# across stop/restart (tests/test_streaming.py).

GAME_FEED_SCHEMA = (
    "team_id int, day int, game_id string, points int, won int"
)


class _FeedRangePartition(InputPartition):
    def __init__(self, team: int, start_day: int, end_day: int):
        self.team = team
        self.start_day = start_day
        self.end_day = end_day


def feed_rows(team: int, day: int) -> list[tuple]:
    """Deterministic per-(team, day) game rows — the stub transport."""
    gid = f"G{day:05d}T{team:02d}"
    pts = 80 + _h("pts", gid) % 60
    return [(team, day, gid, pts, 1 if _h("won", gid) % 2 == 0 else 0)]


class GameFeedStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = next unread day.

    ``latestOffset`` advances at most ``days_per_batch`` per trigger
    (bounded batches — the Kafka ``maxOffsetsPerTrigger`` pattern) and
    never past ``max_day`` (the stub's notion of "now"; a live feed
    would read the upstream watermark instead).
    """

    def __init__(self, options):
        self.n_teams = int(options.get("teams", "4"))
        self.days_per_batch = int(options.get("days_per_batch", "3"))
        self.max_day = int(options.get("max_day", "10"))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def latestOffset(self) -> dict:
        # stateless planning: progress lives in the LAST COMMITTED
        # offset, which the engine replays through initialOffset/commit;
        # we only bound the step size here
        last = getattr(self, "_last_end", 0)
        return {"day": min(last + self.days_per_batch, self.max_day)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # after a checkpoint restart this reader is fresh (_last_end=0)
        # while `start` is the committed offset; tracking max(start, end)
        # re-anchors planning past the committed point, so the restart
        # costs at most one empty batch and never re-reads a day
        self._last_end = max(start["day"], end["day"])
        if end["day"] <= start["day"]:
            return [_FeedRangePartition(0, 0, 0)]  # empty batch
        return [
            _FeedRangePartition(t, start["day"], end["day"])
            for t in range(self.n_teams)
        ]

    def read(self, partition: _FeedRangePartition) -> Iterator[tuple]:
        for day in range(partition.start_day, partition.end_day):
            yield from feed_rows(partition.team, day)

    def commit(self, end: dict) -> None:
        self._last_end = max(getattr(self, "_last_end", 0), end["day"])


class GameFeedDataSource(DataSource):
    """``spark.readStream.format("nba_game_feed")`` — registered via
    ``spark.dataSource.register(GameFeedDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "nba_game_feed"

    def schema(self) -> str:
        return GAME_FEED_SCHEMA

    def streamReader(self, schema) -> GameFeedStreamReader:
        return GameFeedStreamReader(self.options)
