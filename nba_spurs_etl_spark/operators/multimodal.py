"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns + typed metadata; decode /
feature-extraction runs as Arrow-batched pandas over ``mapInPandas``
(the only operators in this engine where Python touches the hot path —
media codecs don't exist on the JVM).

The compressed codecs (PIL/librosa/ffmpeg) are NOT in this container,
so JPEG/PNG/audio bitstreams are env-gated behind NotImplementedError —
but everything AROUND the codec is real: a deterministic FIMG raster
format gives ``decode_image`` a genuine parse path (header validation,
truncation errors), ``resize_nearest`` does real resampling math, and
``image_pipeline_features`` runs decode -> stats -> resize -> hash
with per-row error isolation (corrupt media becomes an ``error`` row,
never a task failure). ``featurize_binary`` additionally computes
codec-free byte-level features with a DuckDB oracle.

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


#: deterministic fake raster format: b"FIMG" + u16be width + u16be
#: height + width*height grayscale bytes. Real enough that decode,
#: malformed-input handling, pixel stats, and resampling are REAL code
#: paths; only the compressed-codec bitstreams (JPEG/PNG/...) remain
#: env-gated.
FAKE_MAGIC = b"FIMG"
_REAL_MAGICS = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff/webp-or-wav",
    b"GIF8": "gif",
}


def _md5_stream(seed: str, need: int) -> bytes:
    """Deterministic byte stream: concatenated md5(seed:i) digests —
    the one generator behind both fake-media encoders."""
    out = bytearray()
    i = 0
    while len(out) < need:
        out.extend(hashlib.md5(f"{seed}:{i}".encode()).digest())
        i += 1
    return bytes(out[:need])


def encode_fake_image(width: int, height: int, seed: str) -> bytes:
    """Deterministic FIMG blob: md5-stream pixels (test/data synth)."""
    return (
        FAKE_MAGIC
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + _md5_stream(seed, width * height)
    )


def _pil_module():
    """Import seam for the optional real codec (VERDICT r09 item 4):
    returns PIL.Image when Pillow is installed, else None. This
    container has no Pillow, so the compressed branches below stay
    env-gated NotImplementedError here — but on a PIL-equipped cluster
    the SAME decode_image contract decodes real JPEG/PNG (grayscale
    'L', the ITU-R 601-2 luma transform) with the identical per-row
    error-isolation behavior. Separated out so the env-gated pytest
    can monkeypatch-probe both branches deterministically."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_image(data: bytes) -> tuple[int, int, bytes]:
    """Decode a raster blob to (width, height, grayscale_pixels).

    FIMG blobs decode for real (header parse + length validation —
    ValueError on truncation/garbage, the malformed-media path a 100 TB
    crawl hits constantly). Compressed formats are recognized by magic
    and decode through Pillow when it is installed (grayscale 'L'
    pixels — same tuple contract as FIMG; a corrupt bitstream raises
    ValueError like a truncated FIMG, so pipeline error isolation is
    format-blind); without Pillow they raise NotImplementedError — the
    caller-visible contract is identical either way.
    """
    for magic, fmt in _REAL_MAGICS.items():
        if data[: len(magic)] == magic:
            Image = _pil_module()
            if Image is None:
                raise NotImplementedError(
                    f"{fmt} decode requires an image codec "
                    "(PIL/libjpeg); FIMG blobs exercise the same "
                    "pipeline codec-free"
                )
            import io

            try:
                with Image.open(io.BytesIO(data)) as im:
                    g = im.convert("L")
                    w, h = g.size
                    px = g.tobytes()
            except NotImplementedError:
                raise
            except Exception as e:
                # Pillow raises format-specific exceptions on corrupt
                # bitstreams; normalize to the FIMG malformed-media
                # contract so per-row isolation treats both identically
                raise ValueError(f"corrupt {fmt} bitstream: {e}") from e
            if w == 0 or h == 0:
                raise ValueError(f"degenerate dimensions: {w}x{h}")
            if len(px) != w * h:
                raise ValueError(
                    f"decoded pixel count mismatch: want {w * h}, "
                    f"got {len(px)}"
                )
            return w, h, px
    if data[:4] != FAKE_MAGIC or len(data) < 8:
        raise ValueError("not a raster blob (bad magic)")
    w = int.from_bytes(data[4:6], "big")
    h = int.from_bytes(data[6:8], "big")
    if w == 0 or h == 0:
        # w=0,h>0 passes the w*h==0 length check below but then blows
        # up as an uncaught numpy IndexError in resize_nearest — which
        # per-row error isolation does NOT catch, failing the whole
        # task instead of producing an error row (ADVICE r03)
        raise ValueError(f"degenerate dimensions: {w}x{h}")
    px = data[8:]
    if len(px) != w * h:
        raise ValueError(f"truncated pixels: want {w * h}, got {len(px)}")
    return w, h, px


def resize_nearest(px: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample — real resize math, codec-free.

    Index map: src = floor(dst * src_dim / dst_dim), the standard
    nearest-neighbor grid (deterministic, no filtering kernel).
    """
    import numpy as np

    a = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    return a[np.ix_(rows, cols)].tobytes()


#: deterministic fake audio format (the FIMG analog): b"FAUD" +
#: u32be sample_rate + u32be n_samples + n_samples i16be PCM samples.
#: Gives ``decode_audio`` a genuine parse path — header validation,
#: degenerate-rate/truncation errors, real signal math downstream —
#: while compressed bitstreams (WAV/MP3/OGG/FLAC) stay env-gated.
FAKE_AUDIO_MAGIC = b"FAUD"
_REAL_AUDIO_MAGICS = {
    b"RIFF": "riff/wav",
    b"ID3": "mp3",
    b"OggS": "ogg",
    b"fLaC": "flac",
}


def _is_mpeg_sync(data: bytes) -> bool:
    """Headerless MPEG audio frame: 11 sync bits (0xFF + top 3 bits of
    the next byte) — covers MPEG-1/2/2.5 layer frames (0xFFFB, 0xFFF3,
    0xFFF2, 0xFFE3, ...), not just the single 0xFFFB variant; matching
    only that one variant tagged common MP3s 'malformed' (permanently
    bad) instead of 'needs-codec' (reprocessable)."""
    return len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0


def encode_fake_audio(sample_rate: int, n_samples: int, seed: str) -> bytes:
    """Deterministic FAUD blob: md5-stream PCM (test/data synth)."""
    return (
        FAKE_AUDIO_MAGIC
        + sample_rate.to_bytes(4, "big")
        + n_samples.to_bytes(4, "big")
        + _md5_stream(seed, n_samples * 2)
    )


def decode_audio(data: bytes) -> tuple[int, "object"]:
    """Decode an audio blob to (sample_rate, int16 sample array).

    FAUD blobs decode for real (header parse + degenerate/truncation
    validation — ValueError, the malformed-media path). Compressed
    formats are recognized by magic and raise NotImplementedError until
    an audio codec (librosa/ffmpeg) is wired in — the caller-visible
    contract is identical either way, mirroring ``decode_image``.
    """
    import numpy as np

    for magic, fmt in _REAL_AUDIO_MAGICS.items():
        if data[: len(magic)] == magic:
            raise NotImplementedError(
                f"{fmt} decode requires an audio codec (librosa/ffmpeg); "
                "FAUD blobs exercise the same pipeline codec-free"
            )
    if _is_mpeg_sync(data):
        raise NotImplementedError(
            "mpeg-audio decode requires an audio codec (librosa/ffmpeg); "
            "FAUD blobs exercise the same pipeline codec-free"
        )
    if data[:4] != FAKE_AUDIO_MAGIC or len(data) < 12:
        raise ValueError("not an audio blob (bad magic)")
    sr = int.from_bytes(data[4:8], "big")
    n = int.from_bytes(data[8:12], "big")
    if sr == 0 or n == 0:
        # same guard class as decode_image's degenerate dims: a zero
        # rate would divide-by-zero in duration math downstream
        raise ValueError(f"degenerate audio header: rate={sr} samples={n}")
    pcm = data[12:]
    if len(pcm) != 2 * n:
        raise ValueError(f"truncated samples: want {2 * n} bytes, got {len(pcm)}")
    return sr, np.frombuffer(pcm, dtype=">i2")


def resample_nearest_audio(samples, src_rate: int, dst_rate: int):
    """Nearest-neighbor resample to ``dst_rate`` — the audio analog of
    ``resize_nearest`` (same floor-index grid, real DSP-free math)."""
    import numpy as np

    n_out = max(1, (len(samples) * dst_rate) // src_rate)
    # keep the index product minimal: an extra src_rate factor on both
    # sides cancels mathematically but runs in int64 — for minutes of
    # 48 kHz audio (len ~ 2^25) the inflated product tops 2^63 and
    # wraps negative, silently indexing from the array end
    idx = (np.arange(n_out) * len(samples)) // n_out
    return samples[np.minimum(idx, len(samples) - 1)]


AUDIO_SCHEMA = (
    "doc bigint, sample_rate int, n_samples int, duration_s double, "
    "rms double, peak int, zero_crossings int, resampled_hash bigint, "
    "error string"
)


def audio_pipeline_features(
    df: DataFrame, id_col: str, bin_col: str, target_rate: int = 8000
) -> DataFrame:
    """decode -> signal stats -> nearest resample -> resampled-content
    hash, one Arrow-batched ``mapInPandas`` pass (no shuffle) — the
    audio twin of ``image_pipeline_features``, with identical per-row
    error isolation (corrupt/codec-gated blobs become ``error`` rows,
    never task failures).
    """
    import numpy as np

    src = df.select(F.col(id_col).alias("doc"), F.col(bin_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc, blob in zip(pdf["doc"], pdf["data"]):
                if blob is None:
                    # bytes(None) is a TypeError no handler below
                    # catches — a NULL payload must be an error ROW,
                    # not a task failure (the isolation contract)
                    rows.append(
                        (doc, None, None, None, None, None, None, None,
                         "null-payload")
                    )
                    continue
                b = bytes(blob)
                try:
                    sr, s = decode_audio(b)
                    f = s.astype(np.float64)
                    zc = int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1])))
                    rz = resample_nearest_audio(s, sr, target_rate)
                    rows.append(
                        (doc, sr, len(s), len(s) / sr,
                         float(np.sqrt(np.mean(f * f))),
                         int(np.abs(f).max()), zc,
                         _hash60_hex(rz.tobytes()), None)
                    )
                except NotImplementedError as e:
                    rows.append(
                        (doc, None, None, None, None, None, None, None,
                         f"needs-codec:{e}")
                    )
                except ValueError as e:
                    rows.append(
                        (doc, None, None, None, None, None, None, None,
                         f"malformed:{e}")
                    )
            # dtype=object — same 60-bit-hash float64-rounding hazard
            # as image_pipeline_features (see comment there)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc", "sample_rate", "n_samples", "duration_s",
                    "rms", "peak", "zero_crossings", "resampled_hash",
                    "error",
                ],
                dtype=object,
            )

    return src.mapInPandas(run, schema=AUDIO_SCHEMA)


def _hash60(b: bytes) -> int:
    """Python twin of functions.scalar.md5_long (same 60-bit value)."""
    return int(hashlib.md5(b).hexdigest()[:15], 16)


def _hash60_hex(b: bytes) -> int:
    """Content hash computed in the HEX-STRING domain: md5 of the
    lowercase hex encoding of ``b`` (then the md5_long 60-bit trunc).
    Same fingerprinting power as hashing the raw bytes, but
    SQL-re-derivable: DuckDB's md5() accepts only VARCHAR, and raw
    pixel/PCM bytes are not valid UTF-8 — the hex text is. Used for
    the resized/resampled content hashes so the image/audio pipeline
    entries carry full DuckDB oracles (VERDICT r07 item 4)."""
    return _hash60(b.hex().encode())


def featurize_binary(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Deterministic per-blob features via Arrow-batched mapInPandas.

    Stands in for decode+resize+embed: n_bytes and a content hash are
    real; fake_width/height are md5-derived stand-ins for decoded
    dimensions (replace with decode_image() output in production).
    """
    src = df.select(F.col(id_col).alias("doc"), F.col(bin_col).alias("data"))

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> NULL features, exactly the oracle's
            # md5(NULL) = NULL row (bytes(None) would kill the task);
            # pandas nullable Int dtypes carry the NAs through Arrow
            blobs = [None if x is None else bytes(x) for x in pdf["data"]]
            hashes = [None if b is None else _hash60(b) for b in blobs]
            yield pd.DataFrame(
                {
                    "doc": pdf["doc"].astype("int64"),
                    "n_bytes": pd.Series(
                        [None if b is None else len(b) for b in blobs],
                        dtype="Int64",
                    ),
                    "byte_hash": pd.Series(hashes, dtype="Int64"),
                    "fake_width": pd.Series(
                        [None if h is None else 160 + h % 1760 for h in hashes],
                        dtype="Int32",
                    ),
                    "fake_height": pd.Series(
                        [None if h is None else 90 + (h % 997) for h in hashes],
                        dtype="Int32",
                    ),
                }
            )

    return src.mapInPandas(feats, schema=FEATURE_SCHEMA)


IMAGE_SCHEMA = (
    "doc bigint, width int, height int, mean_px double, min_px int, "
    "max_px int, resized_w int, resized_h int, resized_hash bigint, "
    "error string"
)


def image_pipeline_features(
    df: DataFrame, id_col: str, bin_col: str, box: int = 224
) -> DataFrame:
    """decode -> pixel stats -> aspect-fit resize -> resized-content
    hash, one Arrow-batched ``mapInPandas`` pass (no shuffle).

    Per-row error isolation: a corrupt blob yields a row with ``error``
    set and NULL features instead of failing the task — at crawl scale
    malformed media is data, not an exception. Codec-gated formats
    (JPEG/PNG) surface as ``error='needs-codec:...'`` the same way.
    """
    src = df.select(F.col(id_col).alias("doc"), F.col(bin_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc, blob in zip(pdf["doc"], pdf["data"]):
                if blob is None:
                    # NULL payload -> error row, never bytes(None)
                    rows.append(
                        (doc, None, None, None, None, None, None, None,
                         None, "null-payload")
                    )
                    continue
                b = bytes(blob)
                try:
                    w, h, px = decode_image(b)
                    a = np.frombuffer(px, dtype=np.uint8)
                    tw = box if w >= h else (w * box) // h
                    th = (h * box) // w if w >= h else box
                    tw, th = max(tw, 1), max(th, 1)
                    rz = resize_nearest(px, w, h, tw, th)
                    rows.append(
                        (doc, w, h, float(a.mean()), int(a.min()),
                         int(a.max()), tw, th, _hash60_hex(rz), None)
                    )
                except NotImplementedError as e:
                    rows.append(
                        (doc, None, None, None, None, None, None, None,
                         None, f"needs-codec:{e}")
                    )
                except ValueError as e:
                    rows.append(
                        (doc, None, None, None, None, None, None, None,
                         None, f"malformed:{e}")
                    )
            # dtype=object: a batch mixing feature rows and error rows
            # would otherwise coerce int columns with None to float64,
            # ROUNDING the 60-bit content hashes (2^60-magnitude ints
            # have 128-ulp spacing in float64 — caught by the r08
            # DuckDB oracle); Arrow casts object columns to the schema
            # types exactly
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc", "width", "height", "mean_px", "min_px",
                    "max_px", "resized_w", "resized_h", "resized_hash",
                    "error",
                ],
                dtype=object,
            )

    return src.mapInPandas(run, schema=IMAGE_SCHEMA)


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
                if blob is None:
                    # oracle twin: n_frames = 1 + md5(NULL) % 8 is
                    # NULL, and range(0, NULL) unnests to NOTHING —
                    # a NULL container yields zero frame rows
                    continue
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
    # greatest(1, ...): an extreme aspect ratio (long_side > box *
    # short_side) floors the short target to 0, and the pandas
    # executor (image_pipeline_features) clamps the SAME formula to
    # >= 1 — the plan and the execution must agree on the degenerate
    # case or a planned 0-dim image breaks the resample downstream.
    # NULL dims (undecodable payload) plan NULL targets EXPLICITLY:
    # without the guard, `w >= h` being NULL routes into the otherwise
    # branch and greatest() silently drops the NULL operand, planning
    # a "224 x 1" resize for an image with no known dims
    # (differential-fuzzer find).
    defined = w.isNotNull() & h.isNotNull()
    t_w = (
        F.when(defined & (w >= h), F.lit(box))
        .when(defined, F.greatest(F.lit(1), F.floor(w * box / h)))
        .cast("int")
    )
    t_h = (
        F.when(defined & (w >= h), F.greatest(F.lit(1), F.floor(h * box / w)))
        .when(defined, F.lit(box))
        .cast("int")
    )
    return t_w, t_h


def with_binary_payload(df: DataFrame, text_col: str) -> DataFrame:
    """Test adapter: treat utf-8 text bytes as the opaque media blob
    (the testdata has no real media; the bytes are equally opaque to
    the plumbing)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))
