"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode step is STUBBED (no image/audio libraries in this container) —
either raises ``NotImplementedError`` (``decoder="real"``) or produces a
deterministic fake feature vector (``decoder="fake"``, default for tests).
Everything around the stub is real and tested: the typed schema, the
``mapInPandas`` batch shape (one Arrow batch of binary blobs in, one batch
of fixed-width float arrays out), and the partition strategy (blobs stay
where they were read; no shuffle before feature extraction).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),        # image|audio|video
    T.StructField("payload", T.BinaryType(), True),     # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

FEATURE_DIM = 8

_FEAT_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
])


def media_from_docs(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Synthesize a media table from the documents table (payload = utf-8
    bytes of the text): exercises the binary-column plumbing end to end."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> list:
    """Deterministic fake feature vector: md5-seeded floats in [0, 1)."""
    d = hashlib.md5(payload or b"").digest()
    return [
        round(int.from_bytes(d[2 * i: 2 * i + 2], "big") / 65536.0, 6)
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract each blob in Arrow batches (mapInPandas).

    ``decoder="real"`` marks where an actual image/audio decode would run —
    it raises NotImplementedError because the libs are absent here. The
    batch shape, schema, and partitioning are the production design.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "image/audio decode libraries are not available in this "
                    "container; plug a real decoder here"
                )
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "features": [_fake_decode(bytes(p or b"")) for p in pdf["payload"]],
            })

    return media.select("media_id", "kind", "payload").mapInPandas(fn, _FEAT_SCHEMA)
