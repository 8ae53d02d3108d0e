"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
`binary` columns with typed metadata, processed by Arrow-batched pandas
UDFs over mapInPandas. The image/audio codec libraries are NOT in this
container (environment constraint), so the decode kernels are STUBBED —
clearly marked — behind a deterministic fake: the Spark-side plumbing
(schema, partitioning, UDF signatures, batch shapes) is real and tested;
swapping `_fake_decode_rgb_stats` for a PIL/ffmpeg call is a one-function
change on a real cluster.

Ops:
  - media_schema / attach_media: the typed envelope (payload + mime + meta)
  - image_features: decode -> (width, height, channels, mean_luma) batch op
  - frame_sample: video -> every-nth-frame rows (fan-out op; fake frames)
  - resize_plan: pure-metadata resize computation (real logic, no decode)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, mime string, payload binary, width int, height int, duration_ms int"
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        mime = ["image/png", "image/jpeg", "video/mp4"][i % 3]
        payload = (b"%08d" % i) * (8 + i % 5)
        w, h = 64 + (i % 7) * 32, 48 + (i % 5) * 24
        dur = 0 if mime.startswith("image") else 1000 + i * 40
        rows.append((i, mime, payload, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_rgb_stats(payload: bytes) -> tuple[int, float]:
    """STUB for the real image decode (PIL/libjpeg not in this container).

    Deterministic fake: channels + mean luminance derived from payload
    bytes. Replace with `PIL.Image.open(io.BytesIO(payload))` on a real
    cluster — the surrounding Arrow plumbing is unchanged.
    """
    if not payload:
        raise ValueError("empty payload")
    arr = np.frombuffer(payload, dtype=np.uint8)
    return 3, float(arr.mean())


def image_features(df: DataFrame) -> DataFrame:
    """(media_id, channels, mean_luma, error): Arrow-batched decode with
    per-record error isolation (quarantine pattern, reference T3)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, mime, payload in zip(b["media_id"], b["mime"], b["payload"]):
                if not str(mime).startswith("image/"):
                    out.append((mid, None, None, f"not an image: {mime}"))
                    continue
                try:
                    ch, luma = _fake_decode_rgb_stats(bytes(payload) if payload is not None else b"")
                    out.append((mid, ch, round(luma, 4), None))
                except Exception as e:  # noqa: BLE001 — quarantine semantics
                    out.append((mid, None, None, str(e)))
            yield pd.DataFrame(out, columns=["media_id", "channels", "mean_luma", "error"])

    return df.select("media_id", "mime", "payload").mapInPandas(
        feats, schema="media_id long, channels int, mean_luma double, error string"
    )


def frame_sample(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video -> frame rows (media_id, frame_idx, ts_ms, frame: binary).

    The frame extraction itself is STUBBED (no ffmpeg here): frame payloads
    are deterministic slices of the source payload. The fan-out shape —
    one input row to ceil(duration/every_ms) output rows via mapInPandas —
    is the real operator."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, mime, payload, dur in zip(
                b["media_id"], b["mime"], b["payload"], b["duration_ms"]
            ):
                if not str(mime).startswith("video/") or not dur:
                    continue
                p = bytes(payload) if payload is not None else b""
                for j, ts in enumerate(range(0, int(dur), every_ms)):
                    fake = p[j % max(len(p), 1):] + bytes([j % 256])
                    rows.append((mid, j, ts, fake))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return df.select("media_id", "mime", "payload", "duration_ms").mapInPandas(
        frames, schema="media_id long, frame_idx int, ts_ms int, frame binary"
    )


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-metadata resize computation (REAL logic, JVM-side): target dims
    preserving aspect ratio with the long side capped at max_side."""
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest("width", "height").cast("double")
    )
    return df.select(
        "media_id", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
        F.round(scale, 6).alias("scale"),
    )
