"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference's multimodal analog is its artifact pipeline: download
opaque .zip/.schematic blobs (selenium_scraper.py:577-608), classify by
suffix (world2vecDriver.py:145-163), decode via external tools (patool/
JVM), and emit fixed-shape tensors (world2vec.py:546-572). This module
re-expresses that shape Spark-first for image/audio/video payloads:

- schema: ``(asset_id long, kind string, payload binary, meta map<string,string>)``
- ``classify_assets``      suffix/magic-byte routing (JVM expressions)
- ``decode_assets``        mapInPandas decode → feature columns. Real
  codecs (PIL/ffmpeg) are NOT in this container, so the decode step is
  STUBBED: by default it raises ``NotImplementedError`` unless
  ``fake=True``, which substitutes a deterministic fake decoder
  (byte-statistics features) so the Spark-side plumbing — schema,
  batching, partitioning, UDF signature — is real and tested.
- ``frame_sample``         deterministic frame/window sampling over a
  byte payload (the .mca-chunk-iteration analog, world2vec.py:145-162).

Everything stays Arrow-batched; payload bytes never pass through
row-at-a-time Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, kind string, payload binary, meta map<string,string>"

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"PK\x03\x04": "archive/zip",
    b"Rar!": "archive/rar",
}


def classify_assets(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte content routing (JVM substring comparisons — the
    suffix-whitelist F5 analog for binary payloads)."""
    p = F.col(payload_col)
    expr = F.lit("unknown")
    for magic, kind in reversed(list(_MAGIC.items())):
        expr = F.when(
            F.substring(p, 1, len(magic)) == F.lit(magic), F.lit(kind)
        ).otherwise(expr)
    return df.withColumn("detected_kind", expr)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: byte statistics as
    'features'. Stable across runs — used to test the plumbing."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return {"width": 0, "height": 0, "mean": 0.0, "features": [0.0] * 8}
    hist = np.bincount(arr % 8, minlength=8).astype(np.float64)
    return {
        "width": int(arr.size % 1024),
        "height": int(arr.size // 1024),
        "mean": float(arr.mean()),
        "features": (hist / hist.sum()).tolist(),
    }


DECODED_SCHEMA = (
    "asset_id long, kind string, width int, height int, mean double, "
    "features array<double>"
)


def decode_assets(df: DataFrame, fake: bool = False,
                  batch_limit: int | None = None) -> DataFrame:
    """Decode/feature-extract stage as ``mapInPandas``.

    With real codecs absent in this container, ``fake=False`` raises
    NotImplementedError at executor time (clearly marked stub); pass
    ``fake=True`` for the deterministic fake decoder. The Spark-side
    contract (Arrow batch iterator in/out, column pruning, partition
    preservation) is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio codecs are not available in this "
                    "container — decode_assets(fake=True) exercises the "
                    "same plumbing with a deterministic fake decoder"
                )
            rows = []
            it = pdf.itertuples(index=False)
            for i, r in enumerate(it):
                if batch_limit is not None and i >= batch_limit:
                    break
                d = _fake_decode(r.payload or b"")
                rows.append(
                    (r.asset_id, r.kind, d["width"], d["height"], d["mean"], d["features"])
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "width", "height", "mean", "features"]
            )

    return df.select("asset_id", "kind", "payload").mapInPandas(run, DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 256, max_frames: int = 16,
                 payload_col: str = "payload") -> DataFrame:
    """Deterministic 'frame' sampling: one 4-byte window every
    ``every_n_bytes`` — the video-frame-sample / region-chunk-scan shape.
    Pure JVM (sequence + transform over the binary column)."""
    p = F.col(payload_col)
    n_frames = F.least(
        F.floor(F.length(p) / every_n_bytes).cast("int"), F.lit(max_frames)
    )
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    frames = F.when(F.length(p) < every_n_bytes, F.array()).otherwise(
        F.transform(idx, lambda i: F.substring(p, i * every_n_bytes + 1, 4))
    )
    return df.withColumn("frames", frames).withColumn(
        "n_frames", F.size("frames")
    )


def synthetic_assets(spark, n: int = 200) -> DataFrame:
    """Deterministic fake asset table (seeded payload bytes)."""
    d = F.col("id")
    magic = (
        F.when(d % 4 == 0, F.lit(b"\x89PNG"))
        .when(d % 4 == 1, F.lit(b"\xff\xd8\xff"))
        .when(d % 4 == 2, F.lit(b"RIFF"))
        .otherwise(F.lit(b"PK\x03\x04"))
    )
    body = F.encode(
        F.concat_ws("", F.transform(F.sequence(F.lit(1), (d % 64 + 8).cast("int")),
                                    lambda i: (d * 31 + i * 7).cast("string"))),
        "UTF-8",
    )
    kind = (
        F.when(d % 4 == 0, F.lit("image"))
        .when(d % 4 == 1, F.lit("image"))
        .when(d % 4 == 2, F.lit("audio"))
        .otherwise(F.lit("archive"))
    )
    return spark.range(n).select(
        d.alias("asset_id"),
        kind.alias("kind"),
        F.concat(magic, body).alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )
