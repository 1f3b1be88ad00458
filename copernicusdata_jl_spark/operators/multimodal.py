"""Multimodal columns: opaque ``binary`` media + typed metadata, decoded /
feature-extracted via Arrow-batched ``mapInPandas`` (SURVEY.md training-data
extensions).

The Spark-side plumbing is real and tested — schema, partition-preserving
mapInPandas, Arrow batch shapes, deterministic outputs. The *codec* layer is
stubbed: real image/audio decoding needs PIL/ffmpeg which are not in this
container, so ``decode_real`` raises NotImplementedError behind an
import-try, and ``decode_fake`` is a deterministic pure-arithmetic stand-in
(dimensions derived from byte length, features from byte prefixes) used by
tests and the DuckDB oracle.

Scale notes: media bytes never leave the executor — mapInPandas streams
Arrow batches through Python without a shuffle; per-batch memory is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch; downstream joins/aggs use
only the extracted scalar/vector features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table: utf-8 text bytes as the opaque payload
    (the engine treats media as bytes regardless of codec)."""
    return docs.select(
        "doc_id",
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("media"),
        F.create_map(F.lit("src"), F.col("source")).alias("meta"),
    )


def _try_real_decoder():
    try:  # pragma: no cover - PIL absent in this container by design
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_real(media: bytes, kind: str):  # pragma: no cover - gated stub
    """Real codec path (PIL/ffmpeg); STUB — not available in this
    environment. The mapInPandas plumbing below is identical either way."""
    img = _try_real_decoder()
    if img is None:
        raise NotImplementedError("image/audio codecs not installed; use decode_fake")
    raise NotImplementedError("real decode wiring lands when codecs are installable")


def fake_dims(n_bytes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-in dims from byte length (pure arithmetic so the
    SQL oracle re-derives them)."""
    w = (n_bytes % 640 + 1).astype(np.int32)
    h = ((n_bytes // 7) % 480 + 1).astype(np.int32)
    return w, h


def decode_media(df: DataFrame, n_features: int = 4, use_real: bool = False) -> DataFrame:
    """media → per-item features via mapInPandas (no shuffle; Arrow batch
    in, Arrow batch out)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["media"]
            if use_real:  # pragma: no cover
                decode_real(raw.iloc[0], pdf["kind"].iloc[0])
            nb = raw.map(len).to_numpy(dtype=np.int64)
            w, h = fake_dims(nb)
            # features: mean byte value of k equal slices, scaled to [0,1]
            feats = []
            for b in raw:
                arr = np.frombuffer(b, dtype=np.uint8)
                if len(arr) == 0:
                    feats.append([0.0] * n_features)
                    continue
                chunks = np.array_split(arr, n_features)
                # exact double means (ints < 2^53 sum exactly) — no rounding
                # here so downstream parity doesn't depend on np rounding mode
                feats.append([float(c.mean()) / 255.0 if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": w,
                    "height": h,
                    "n_channels": np.full(len(pdf), 3, dtype=np.int32),
                    "n_bytes": nb,
                    "feature": feats,
                }
            )

    return df.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling over a frames table (doc_id, frame_idx,
    media): keep every n-th frame — pure Catalyst filter, no Python."""
    return df.filter(F.col("frame_idx") % every_n == 0)
