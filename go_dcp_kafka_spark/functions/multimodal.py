"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — each raises NotImplementedError unless the deterministic fake is
requested), but everything Spark-side is real and tested: schemas, batch
iteration shape, output schema contracts, partition sizing.

Pattern notes for 100 TB:
- binary payloads make row-groups huge: size
  ``spark.sql.files.maxPartitionBytes`` down so one task holds a few
  hundred blobs, and NEVER collect payload columns;
- metadata (width/height/duration/codec) lives in sibling scalar columns so
  filters prune files without touching bytes;
- mapInPandas streams Arrow batches — bounded memory per task regardless of
  partition size (vs applyInPandas per full group).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)

#: Oracle-checkable feature row: scalar columns only (an array<float> column
#: is unsortable by the driver's row canonicalizer — round-1 lesson).
FEATURE_SCALAR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        *[T.StructField(f"f{j}", T.DoubleType(), True) for j in range(8)],
    ]
)

_KINDS = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Media table derived from the documents corpus: payload = utf-8 bytes
    of the text (a stand-in blob whose byte content an SQL oracle can reason
    about), kind cycled by doc_id. Pure projection — no UDF, no shuffle."""
    from pyspark.sql import functions as F

    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    mime = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        mime.alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = pd.DataFrame(
        {
            "media_id": np.arange(n, dtype=np.int64),
            "kind": np.array(["image", "audio", "video"], dtype=object)[np.arange(n) % 3],
            "payload": [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes() for sz in rng.integers(64, 2048, n)],
            "mime": np.array(["image/png", "audio/wav", "video/mp4"], dtype=object)[np.arange(n) % 3],
            "width": pd.array(rng.integers(16, 512, n), dtype="Int32"),
            "height": pd.array(rng.integers(16, 512, n), dtype="Int32"),
            "duration_ms": pd.array(rng.integers(100, 60000, n), dtype="Int32"),
        }
    )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_feature(payload: pd.Series, dim: int = 8) -> pd.Series:
    """Deterministic stand-in for a real encoder: fold bytes into `dim`
    float accumulators. NOTE: numpy-per-row over the Arrow batch (payloads
    are variable-length, so rows can't share one matrix); a REAL encoder
    would pad/stack the batch and run one batched matmul per Arrow batch —
    the mapInPandas plumbing is identical either way."""

    def enc(b: bytes | None):
        if b is None:
            return None
        arr = np.frombuffer(b, dtype=np.uint8)
        pad = (-len(arr)) % dim
        arr = np.pad(arr, (0, pad)).reshape(-1, dim)
        return (arr.sum(axis=0) % 251).astype(np.float32) / 251.0

    return payload.map(enc)


def extract_features(media: DataFrame, use_fake: bool = False, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas. Real decode (PIL/librosa/
    ffmpeg) is not available in this container: raises NotImplementedError
    unless ``use_fake`` selects the deterministic stand-in. The Spark
    plumbing (schema, Arrow batching, column pruning) is identical either
    way."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "pass use_fake=True for the deterministic test kernel"
                )
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": b["payload"].map(lambda x: 0 if x is None else len(x)).astype("int64"),
                    "feature": _fake_feature(b["payload"]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def extract_features_scalar(media: DataFrame, use_fake: bool = False) -> DataFrame:
    """Oracle-checkable variant of ``extract_features``: the fake encoder
    emits 8 md5-digest-derived scalar floats (digest byte j / 255, 6 dp) plus
    the byte count — every column reproducible in ANSI SQL over the source
    text, and every column sortable. Same mapInPandas plumbing as the array
    variant (Arrow batches, payload never collected)."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not use_fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "pass use_fake=True for the deterministic test kernel"
                )
            digests = b["payload"].map(lambda x: hashlib.md5(x).digest() if x is not None else None)
            out = {
                "media_id": b["media_id"],
                "kind": b["kind"],
                "n_bytes": b["payload"].map(lambda x: 0 if x is None else len(x)).astype("int64"),
            }
            for j in range(8):
                out[f"f{j}"] = digests.map(lambda d, j=j: None if d is None else round(d[j] / 255.0, 6))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(fn, FEATURE_SCALAR_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("n_bytes_out", T.LongType(), False),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize_media(media: DataFrame, out_w: int = 64, out_h: int = 64, use_fake: bool = False) -> DataFrame:
    """Image resize via mapInPandas (1 binary row -> 1 smaller binary row) —
    the third multimodal kernel shape next to feature-extract (N scalars out)
    and frame-sample (1->N rows). The fake kernel crops the payload to
    out_w*out_h bytes (so ``n_bytes_out = min(n_bytes, out_w*out_h)`` is
    SQL-reproducible); a real kernel would PIL-decode, resize, re-encode —
    identical plumbing: binary in, binary out, bounded Arrow batches,
    metadata as sibling scalar columns. Only kind='image' rows are read
    (filter prunes before bytes are touched)."""
    budget = out_w * out_h

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not use_fake:
                raise NotImplementedError("real image resize requires PIL; pass use_fake=True")
            resized = b["payload"].map(lambda x: None if x is None else bytes(x[:budget]))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "out_w": np.int32(out_w),
                    "out_h": np.int32(out_h),
                    "n_bytes_out": resized.map(lambda x: 0 if x is None else len(x)).astype("int64"),
                    "resized": resized,
                }
            )

    return media.filter("kind = 'image'").select("media_id", "payload").mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 4, use_fake: bool = False) -> DataFrame:
    """Frame sampling (1 media row -> N frame rows) via mapInPandas — the
    video analog of explode. The fake kernel slices the payload at fixed
    strides; a real one would ffmpeg-seek keyframes."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not use_fake:
                raise NotImplementedError("real frame extraction requires ffmpeg")
            out = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(out)

    return media.filter("kind = 'video'").select("media_id", "payload").mapInPandas(fn, FRAME_SCHEMA)
