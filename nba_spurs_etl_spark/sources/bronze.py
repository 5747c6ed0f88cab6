"""Bronze layer: entity fetchers -> JSON files.

The reference's bronze is 8 Airflow tasks pulling from the public
nba_api (or synthesizing fake data) into local JSON then MinIO
(``/root/reference/dags/spurs_historic_games.py:50-319``). Here each
fetcher is a DataFrame producer + a distributed JSON write:

- live API ingestion is driver-side by nature (HTTP) — stubbed behind
  ``fetch_live_*`` raising NotImplementedError (no network in this
  environment; the retry/backoff of the reference, dags:138-153, is a
  driver-side concern Spark task retries subsume);
- the synthetic generators (salaries/free agents/injuries,
  dags:185-285) are the seeded hash-deterministic versions in synth.py;
- the "upload to object store" step (dags:292-319) is just the write
  path prefix: pass ``s3a://bucket/spurs`` and the same code ships to
  S3/MinIO — no separate upload pass, no local staging dir coupling
  (the reference's /tmp handoff between tasks is a hidden same-host
  assumption; SURVEY §3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import synth

ENTITY_BUILDERS = {
    "teams": synth.build_teams,
    "players": synth.build_players,
    "games": synth.build_games,
    "player_stats": synth.build_player_stats,
    "salaries": synth.build_salaries,
    "free_agents": synth.build_free_agents,
    "injuries": synth.build_injuries,
}


def fetch_live_teams() -> None:
    """Live nba_api ingestion needs network access (reference dags:50-76).

    The wired live path is ``sources.pyds.NbaApiDataSource`` (register
    it and ``spark.read.format("nba_api")``): partition-per-team fetch
    with the reference's retry/backoff, transport-injectable for tests.
    This driver-side hook stays gated because the container has neither
    network nor the ``nba_api`` package."""
    raise NotImplementedError(
        "live NBA API ingestion is environment-gated; use the synth "
        "builders (deterministic fixtures) or register "
        "sources.pyds.NbaApiDataSource for the live partition-per-team "
        "scan."
    )


def write_entity(
    spark: SparkSession, name: str, out_dir: str, fmt: str = "json"
) -> str:
    """Materialize one bronze entity under out_dir/name (json default;
    csv/parquet/orc supported — same formats silver.read_entity accepts).

    Distributed write (one file per partition) — at scale this IS the
    object-store upload; mode=overwrite matches the reference's
    drop-and-replace refresh (dags:437-440).
    """
    if name not in ENTITY_BUILDERS:
        raise KeyError(f"unknown bronze entity {name!r}")
    path = os.path.join(out_dir, name)
    w = ENTITY_BUILDERS[name](spark).write.mode("overwrite")
    if fmt == "json":
        w.json(path)
    elif fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "parquet":
        w.parquet(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported bronze format {fmt!r}")
    return path


def write_all(spark: SparkSession, out_dir: str) -> dict[str, str]:
    """The 8-task bronze group as one loop (dependencies are data-free
    in the reference — its chain is an artifact of Airflow workers
    sharing /tmp, not of the data flow)."""
    return {name: write_entity(spark, name, out_dir) for name in ENTITY_BUILDERS}
