"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested — schemas, batch iteration,
partition sizing, UDF signatures. The *codec* step is stubbed: the
container has no image/audio libraries, so decode falls back to a
clearly-marked deterministic fake (derived from the payload bytes) and
``decode_images(..., strict=True)`` raises NotImplementedError exactly
where a real codec (PIL/ffmpeg) would plug in.

Scale design: mapInPandas streams Arrow batches — peak memory is
O(batch), not O(partition). Binary payloads at 100 TB should ride their
own partitioning (repartition by a size-balanced key before decode;
``target_batch_rows`` guards per-batch blob volume via
spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary(
    df: DataFrame, src_col: str = "text", out_col: str = "blob"
) -> DataFrame:
    """Materialize a binary payload column (here: utf-8 bytes of a string
    column — the fixtures carry no real media; in production this is the
    raw image/audio bytes from the lake)."""
    return df.withColumn(out_col, F.col(src_col).cast("binary"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic FAKE decode: pseudo-dimensions from a digest of the
    payload. Stands in for PIL/libvips; replace in `_decode_one`."""
    d = hashlib.md5(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + (d[2] % 2) * 2  # 1 or 3
    return width, height, channels, "fake"


def _decode_one(payload: bytes, strict: bool) -> tuple[int, int, int, str]:
    try:
        from PIL import Image  # absent in this container; real elsewhere
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands()), im.format or "?"
    except ImportError:
        if strict:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "install Pillow or use strict=False for the fake decoder"
            )
        return _fake_decode(payload)
    except Exception:
        # Codec present but the payload is not a decodable image (the
        # fixtures carry utf-8 text blobs). strict surfaces it; otherwise
        # fall back to the deterministic fake so pipelines keep moving.
        if strict:
            raise
        return _fake_decode(payload)


def decode_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    strict: bool = False,
    target_batch_rows: int | None = None,
) -> DataFrame:
    """Decode image metadata from binary payloads via mapInPandas.

    Output schema: id, n_bytes, width, height, channels, format.

    ``target_batch_rows``, when set, caps Arrow batch row counts via
    spark.sql.execution.arrow.maxRecordsPerBatch — a SESSION-wide
    setting (it outlives this call); set it when blobs are large enough
    that the default 10k-row batches would not fit executor memory.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
        + list(IMAGE_META_SCHEMA.fields)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [_decode_one(bytes(b), strict) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[blob_col].map(len).astype("int64"),
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "format": [m[3] for m in metas],
                }
            )

    narrow = df.select(id_col, blob_col)
    if target_batch_rows is not None:
        narrow.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(target_batch_rows),
        )
    return narrow.mapInPandas(batches, out_schema)


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    dims: int = 16,
) -> DataFrame:
    """Deterministic fake feature vector (md5-seeded) per payload —
    the plumbing for a model-based embedder: same signature, same
    array<float> output column, mapInPandas batching."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[blob_col]:
                d = hashlib.md5(bytes(b)).digest()
                feats.append([((d[i % 16] / 255.0) * 2 - 1) for i in range(dims)])
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, blob_col).mapInPandas(batches, schema)


def resize_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
    strict: bool = False,
) -> DataFrame:
    """Resize stub with real Spark plumbing: mapInPandas over Arrow
    batches, output (id, width, height, resized_bytes). The resample
    kernel is the stubbed codec step — strict=True raises where
    PIL.Image.resize would run; the fake path emits a deterministic
    payload of the target size derived from the source digest, so batch
    shapes, schemas, and partitioning are exercised end-to-end."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized_bytes", T.BinaryType()),
        ]
    )

    def _fake_resize(b: bytes) -> bytes:
        # FAKE resample: digest-seeded bytes, one per target pixel
        # (single channel) — deterministic and size-correct.
        seed = hashlib.md5(b).digest()
        n = width * height
        return (seed * (n // len(seed) + 1))[:n]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image
            import io

            def _resize(b: bytes) -> bytes:
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        return im.convert("L").resize((width, height)).tobytes()
                except Exception:
                    if strict:
                        raise
                    return _fake_resize(b)

        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image codec not available; install Pillow or "
                    "use strict=False for the deterministic fake"
                )
            _resize = _fake_resize

        for pdf in it:
            payloads = [_resize(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized_bytes": payloads,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, out_schema)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("format", T.StringType()),
    ]
)


def decode_audio(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    strict: bool = False,
) -> DataFrame:
    """Audio metadata decode stub (the soundfile/ffprobe seam):
    mapInPandas plumbing real, codec faked deterministically from the
    payload (strict=True raises NotImplementedError at the codec)."""
    out_schema = T.StructType(
        [T.StructField("id", T.LongType())] + list(AUDIO_META_SCHEMA.fields)
    )

    def _fake_audio(b: bytes) -> tuple[int, int, float, str]:
        d = hashlib.md5(b).digest()
        rate = (8000, 16000, 22050, 44100)[d[0] % 4]
        n = len(b) * 16 + d[1]
        return rate, n, round(n / rate, 6), "fake"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import soundfile as sf
            import io

            def _probe(b: bytes) -> tuple[int, int, float, str]:
                try:
                    info = sf.info(io.BytesIO(b))
                    return (
                        info.samplerate,
                        info.frames,
                        round(info.frames / info.samplerate, 6),
                        info.format,
                    )
                except Exception:
                    if strict:
                        raise
                    return _fake_audio(b)

        except ImportError:
            if strict:
                raise NotImplementedError(
                    "audio codec not available; install soundfile "
                    "or use strict=False for the deterministic fake"
                )
            _probe = _fake_audio

        for pdf in it:
            metas = [_probe(bytes(b)) for b in pdf[blob_col]]
            rates = [m[0] for m in metas]
            counts = [m[1] for m in metas]
            durs = [m[2] for m in metas]
            fmts = [m[3] for m in metas]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "sample_rate": rates,
                    "n_samples": counts,
                    "duration_sec": durs,
                    "format": fmts,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(batches, out_schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """'Video' frame sampling stand-in: slice the payload into frame
    chunks (JVM-side — no Python needed for the slicing itself), explode
    to (id, frame_idx, frame_bytes). The real codec swaps the slicer for
    keyframe extraction; the explode/partition shape is identical."""
    last = F.greatest(
        F.lit(0),
        F.floor((F.length(blob_col) - 1) / every_n_bytes).cast("int"),
    )
    idx = F.sequence(F.lit(0), F.least(F.lit(max_frames - 1), last))
    exploded = (
        df.select(id_col, blob_col)
        .withColumn("frame_idx", F.explode(idx))
        .select(
            F.col(id_col).alias("id"),
            "frame_idx",
            F.expr(
                f"substring({blob_col}, frame_idx * {every_n_bytes} + 1,"
                f" {every_n_bytes})"
            ).alias("frame_bytes"),
        )
    )
    return exploded
