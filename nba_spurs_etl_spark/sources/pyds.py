"""Spark 4 Python Data Source mapping the reference's NBA-API scans.

The reference's bronze layer is a sequence of driver-side fetch loops —
per-team roster requests with rate-limit sleeps
(``/root/reference/dags/spurs_historic_games.py:78-108``: one
``CommonTeamRoster`` call per team, records ``dict(zip(headers, row))``).
The idiomatic Spark mapping of "N independent API calls" is a custom
**DataSource** whose ``partitions()`` enumerate the calls: each team
becomes an ``InputPartition``, so the 30 fetches run distributed with
Spark's own task retry replacing tenacity backoff, and the result is a
DataFrame from the first line.

This stub serves deterministic hash-derived rows (identical to
``synth.build_players`` — same md5 salt convention), because the
container has no network; swapping ``read()``'s body for a real
``nba_api`` call is the entire production delta. The partition-per-team
shape is the part that matters at scale: a paginated/keyed API fans out
to |keys| partitions with bounded per-task memory, instead of one
driver loop.

Usage::

    spark.dataSource.register(NbaApiStubDataSource)
    roster = spark.read.format("nba_api_stub").load()
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..synth import N_TEAMS, PLAYERS_PER_TEAM, POSITIONS

ROSTER_SCHEMA = (
    "player_id string, player string, position string, season string, "
    "height_cm string, weight_kg string, age string"
)


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
