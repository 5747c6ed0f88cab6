"""nba_spurs_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of the reference ETL pipeline
(``Andrestuc79/nba-spurs-etl``: Airflow bronze → Postgres silver →
dbt gold), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, streaming).

Layout
------
- ``session``    : SparkSession factory tuned for local[32] and cluster use
- ``sources``    : readers/writers (JSON/Parquet), silver-load semantics
- ``normalize``  : key folding / renames / first-record-wins projection
- ``synth``      : seeded synthetic NBA silver fixture generators
- ``functions``  : scalar helpers shared across engines (Spark + DuckDB oracle)
- ``operators``  : generic operator library (joins/aggs/windows/unpivot/
                   dedup/similarity/text/multimodal)
- ``plans``      : the six gold models + the driver-facing query catalog
- ``streaming``  : Structured Streaming surface over the events table
- ``quality``    : dbt-style data-quality assertions (not_null/accepted_values)
"""

__version__ = "0.1.0"
