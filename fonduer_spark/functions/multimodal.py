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
                    text_col: str = "text",
                    with_duration: bool = False) -> DataFrame:
    """Synthesize a media table from the documents table (payload = utf-8
    bytes of the text): exercises the binary-column plumbing end to end.
    ``with_duration=True`` types the rows as video with a deterministic
    duration (10 ms per payload character) so frame sampling has metadata
    to plan against."""
    dur = (F.length(F.col(text_col)) * 10).cast("int") if with_duration \
        else F.lit(None).cast("int")
    kind = "video" if with_duration else "image"
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        dur.alias("duration_ms"),
    )


def _fake_decode(payload: bytes) -> list:
    """Deterministic fake feature vector: md5-seeded floats in [0, 1)."""
    d = hashlib.md5(payload or b"").digest()
    return [
        round(int.from_bytes(d[2 * i: 2 * i + 2], "big") / 65536.0, 6)
        for i in range(FEATURE_DIM)
    ]


# --- the real decoder (import-gated) -------------------------------------
#
# FEATURE CONTRACT shared by the fake and real paths (what
# tests/test_multimodal_contract.py pins, mirroring the lingual
# conformance contract): exactly FEATURE_DIM floats, each in [0, 1),
# rounded to 6 decimals, deterministic for identical payload bytes.


def _real_decode_image(payload: bytes) -> list:
    """Real image decode + feature extraction (requires Pillow): 8 summary
    statistics of the decoded RGB raster, every one normalized into [0, 1)
    and 6-dp rounded per the shared feature contract — [clamped w/4096,
    clamped h/4096, mean R, mean G, mean B, mean gray, std gray, mean
    horizontal gradient]. Raises NotImplementedError when Pillow is absent
    (the honest env gate); decode errors propagate — per-row isolation is
    the caller's policy, not silent zeros."""
    try:
        import io

        import numpy as np
        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "image decode libraries (Pillow) are not available in this "
            "container; plug a real decoder here"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    w, h = img.size
    arr = np.asarray(img, dtype=np.float64) / 255.0  # (h, w, 3)
    gray = arr.mean(axis=2)
    grad = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
    feats = [
        min(w, 4095) / 4096.0,
        min(h, 4095) / 4096.0,
        float(arr[..., 0].mean()),
        float(arr[..., 1].mean()),
        float(arr[..., 2].mean()),
        float(gray.mean()),
        float(gray.std()),
        grad,
    ]
    return [round(min(f, 0.999999), 6) for f in feats]


def _real_resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize (requires Pillow): decode -> bilinear resize ->
    re-encode PNG. Raises NotImplementedError when Pillow is absent."""
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "image decode/resize libraries (Pillow) are not available in "
            "this container; plug a real resizer here"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    out = io.BytesIO()
    # explicit BILINEAR — PIL's default is BICUBIC, which would contradict
    # the documented resample mode
    img.resize((width, height),
               resample=Image.Resampling.BILINEAR).save(out, format="PNG")
    return out.getvalue()


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract each blob in Arrow batches (mapInPandas).

    ``decoder="real"`` runs the Pillow-backed decode (_real_decode_image)
    when the library exists and raises NotImplementedError otherwise — the
    same feature contract (FEATURE_DIM floats in [0,1), 6-dp) either way,
    asserted by tests/test_multimodal_contract.py. The batch shape, schema,
    and partitioning are the production design.
    """
    decode = _real_decode_image if decoder == "real" else _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "features": [decode(bytes(p or b"")) for p in pdf["payload"]],
            })

    return media.select("media_id", "kind", "payload").mapInPandas(fn, _FEAT_SCHEMA)


_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  decoder: str = "fake") -> DataFrame:
    """Image resize plumbing: binary in -> binary out with updated dims,
    one Arrow batch at a time, partition-local (no shuffle). The pixel
    transform: ``decoder="real"`` runs the Pillow-backed
    decode -> bilinear resize -> PNG re-encode (_real_resize_image; raises
    NotImplementedError without Pillow); the fake path emits a
    deterministic payload (md5 of payload:WxH, hex bytes) so tests pin the
    batch shape and the metadata update end to end."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                out_payload = [
                    _real_resize_image(bytes(p or b""), width, height)
                    for p in pdf["payload"]
                ]
                yield pd.DataFrame({
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": width, "height": height,
                    "payload": out_payload,
                })
                continue
            out_payload = [
                hashlib.md5(
                    bytes(p or b"") + f":{width}x{height}".encode()
                ).hexdigest().encode()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "width": width, "height": height,
                "payload": out_payload,
            })

    return media.select("media_id", "payload").mapInPandas(fn, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("t_ms", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), True),
    T.StructField("frame_hash", T.StringType(), True),
])


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decoder: str = "fake") -> DataFrame:
    """Video frame sampling: each blob row expands into one row per sampled
    timestamp (t = 0, every_ms, ... < duration_ms) inside mapInPandas —
    partition-local fan-out whose factor is bounded by every_ms, no shuffle
    before downstream feature extraction. The sampling PLAN comes from the
    duration metadata alone (no decode needed to know the frame grid); the
    per-frame decode is the stub: ``decoder="real"`` raises, the fake path
    emits a deterministic frame payload (hex md5 of "text:idx" for utf-8
    payloads) whose hash the SQL oracle reproduces as md5(md5(text||':'||i))."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "video decode libraries are not available in this "
                    "container; plug a real frame extractor here")
            ids, idxs, ts, frames, hashes = [], [], [], [], []
            for mid, payload, dur in zip(
                    pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n = 0 if dur is None or pd.isna(dur) \
                    else int(dur) // every_ms
                raw = bytes(payload or b"")
                for i in range(n):
                    frame = hashlib.md5(
                        raw + b":" + str(i).encode()).hexdigest().encode()
                    ids.append(int(mid))
                    idxs.append(i)
                    ts.append(i * every_ms)
                    frames.append(frame)
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "t_ms": pd.Series(ts, dtype="int32"),
                "frame": frames,
                "frame_hash": hashes,
            })

    return media.select("media_id", "payload", "duration_ms") \
        .mapInPandas(fn, _FRAME_SCHEMA)


def media_dedup_exact(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact binary dedup over an opaque media column: content key =
    md5 of the payload BYTES (no decode — works for any modality),
    canonical = smallest id per content group. The image/audio twin of
    dedup.exact_duplicates, returning per-row keep decisions:
    (media_id, content_key, canonical, n_copies, kept).

    Scale: ONE md5 projection + ONE map-side-combinable groupBy on the
    128-bit key + a hash join back — the content never shuffles, only
    (id, key) pairs; AQE handles hot keys (a viral image is exactly a
    skewed content_key)."""
    keyed = media.select(
        F.col(id_col), F.md5(F.col(payload_col)).alias("content_key"))
    groups = keyed.groupBy("content_key").agg(
        F.min(id_col).alias("canonical"),
        F.count(F.lit(1)).alias("n_copies"))
    return keyed.join(groups, "content_key").select(
        id_col, "content_key", "canonical",
        F.col("n_copies").cast("long").alias("n_copies"),
        (F.col(id_col) == F.col("canonical")).cast("int").alias("kept"))
