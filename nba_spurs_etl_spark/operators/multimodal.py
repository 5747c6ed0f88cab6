"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns + typed metadata; decode /
feature-extraction runs as Arrow-batched pandas over ``mapInPandas``
(the only operators in this engine where Python touches the hot path —
media codecs don't exist on the JVM).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_image``/``decode_audio`` STUB the decode behind
NotImplementedError, and ``featurize_binary`` computes deterministic
pseudo-features (byte stats + md5-derived fake dimensions) so the
Spark-side plumbing — schema, batching, partitioning, UDF signature —
is real and oracle-testable end-to-end.

Scale notes:
- one ``mapInPandas`` pass, no shuffle: featurization is per-row;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (media rows are fat — keep batches small, e.g. 1k);
- never collect binaries to the driver; write features, not bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc bigint, n_bytes bigint, byte_hash bigint, fake_width int, fake_height int"
)


def decode_image(data: bytes) -> object:
    """Real decode needs an image codec — not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg; wire in decode_image() when "
        "the codec is available. The surrounding Spark plumbing "
        "(binary column -> mapInPandas -> feature rows) is complete."
    )


def decode_audio(data: bytes) -> object:
    raise NotImplementedError("audio decode requires librosa/ffmpeg")


def _hash60(b: bytes) -> int:
    """Python twin of functions.scalar.md5_long (same 60-bit value)."""
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def featurize_binary(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Deterministic per-blob features via Arrow-batched mapInPandas.

    Stands in for decode+resize+embed: n_bytes and a content hash are
    real; fake_width/height are md5-derived stand-ins for decoded
    dimensions (replace with decode_image() output in production).
    """
    src = df.select(F.col(id_col).alias("doc"), F.col(bin_col).alias("data"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(x) for x in pdf["data"]]
            hashes = [_hash60(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"].astype("int64"),
                    "n_bytes": pd.Series(
                        [len(b) for b in blobs], dtype="int64"
                    ),
                    "byte_hash": pd.Series(hashes, dtype="int64"),
                    "fake_width": pd.Series(
                        [160 + h % 1760 for h in hashes], dtype="int32"
                    ),
                    "fake_height": pd.Series(
                        [90 + (h % 997) for h in hashes], dtype="int32"
                    ),
                }
            )

    return src.mapInPandas(feats, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc bigint, frame_idx int, frame_hash bigint"


def sample_frames(
    df: DataFrame, id_col: str, bin_col: str, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: ONE media row -> N frame rows.

    The shape that matters for video at scale: mapInPandas with output
    cardinality != input cardinality (a container parse emits a row per
    sampled frame), still one pass, no shuffle, frames written as rows
    so downstream ops (dedup, embed, filter) treat them like any other
    corpus. Codec-free stand-ins: frame count = 1 + md5(blob) %
    max_frames (container parse), frame_hash = md5(blob || ':' || idx)
    (decoded-frame content hash) — both reproduced verbatim by the
    DuckDB oracle.
    """
    src = df.select(F.col(id_col).alias("doc"), F.col(bin_col).alias("data"))

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, idxs, hashes = [], [], []
            for doc, blob in zip(pdf["doc"], pdf["data"]):
                b = bytes(blob)
                n = 1 + _hash60(b) % max_frames
                for i in range(n):
                    docs.append(doc)
                    idxs.append(i)
                    hashes.append(_hash60(b + f":{i}".encode()))
            yield pd.DataFrame(
                {
                    "doc": pd.Series(docs, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return src.mapInPandas(frames, schema=FRAME_SCHEMA)


def resize_fit(w_col: str, h_col: str, box: int = 224):
    """Aspect-preserving fit-to-box target dims as JVM expressions.

    The resize *plan* is pure arithmetic (floor(short_side * box /
    long_side) — exact for any realistic pixel dims, identical in
    DuckDB); only the pixel resample itself needs a codec, and that
    step slots into featurize_binary's pandas pass.
    """
    w, h = F.col(w_col), F.col(h_col)
    t_w = F.when(w >= h, F.lit(box)).otherwise(F.floor(w * box / h)).cast("int")
    t_h = F.when(w >= h, F.floor(h * box / w)).otherwise(F.lit(box)).cast("int")
    return t_w, t_h


def with_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Test adapter: treat utf-8 text bytes as the opaque media blob
    (the testdata has no real media; the bytes are equally opaque to
    the plumbing)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))
