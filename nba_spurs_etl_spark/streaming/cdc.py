"""Streaming CDC apply: a changelog stream merged into a keyed snapshot.

The streaming half of ``operators/merge.py``: each micro-batch of I/U/D
changes is compacted to one winning op per key (``latest_by_key``) and
merged onto the current snapshot with ``merge_cdc`` inside a
``foreachBatch`` sink — the canonical Structured Streaming upsert
pattern (Delta/Iceberg ship it as MERGE in foreachBatch; this runs on
bare parquet).

Snapshot storage is a poor-man's table format: each applied batch
writes a NEW versioned directory ``v{n}`` and readers resolve the
highest committed version — never overwrite-in-place, because batch n+1
reads version n while writing n+1 (and a failed write must not corrupt
the readable snapshot). A ``_COMMITTED`` marker makes the version flip
atomic-enough for a filesystem without atomic rename; real deployments
swap this class for a table format and keep the foreachBatch body.

Scale: the per-batch merge is one key-partitioned full-outer join
(see merge.py); snapshot versions are bounded by retention (callers
vacuum old ``v*`` dirs). foreachBatch re-reads the snapshot per batch —
at scale that is exactly what MERGE INTO does too (the join IS the
apply); micro-batch sizing controls the amortization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import latest_by_key, merge_cdc


class CdcSnapshot:
    """Versioned parquet snapshot a CDC stream folds into."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: list[str],
        op_col: str = "op",
        order_col: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self.keys = keys
        self.op_col = op_col
        self.order_col = order_col

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("v") and name[1:].isdigit():
                if os.path.exists(os.path.join(self.root, name, "_COMMITTED")):
                    out.append(int(name[1:]))
        return sorted(out)

    def _vdir(self, v: int) -> str:
        return os.path.join(self.root, f"v{v}")

    def init(self, base: DataFrame) -> None:
        self._write(base, 0)

    def _write(self, df: DataFrame, version: int) -> None:
        path = self._vdir(version)
        df.write.mode("overwrite").parquet(path)
        with open(os.path.join(path, "_COMMITTED"), "w") as f:
            f.write("ok")

    def read(self) -> DataFrame:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        return self.spark.read.parquet(self._vdir(vs[-1]))

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` committed versions.

        The snapshot grows one version per applied micro-batch, so an
        unbounded stream needs retention; a version still being read
        by a concurrent query is the caller's coordination problem
        (exactly as with table-format VACUUM). Returns the removed
        version numbers."""
        import shutil

        vs = self._versions()
        drop = vs[: -keep_last] if keep_last > 0 else vs
        for v in drop:
            shutil.rmtree(self._vdir(v))
        return drop

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.order_col is not None:
            batch_df = latest_by_key(batch_df, self.keys, self.order_col).drop(
                self.order_col
            )
        merged = merge_cdc(self.read(), batch_df, self.keys, self.op_col)
        self._write(merged, self._versions()[-1] + 1)

    def attach(self, changelog: DataFrame, checkpoint_dir: str):
        """Wire a streaming changelog into this snapshot; returns the
        started query (availableNow drains what exists, then stops)."""
        return (
            changelog.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
