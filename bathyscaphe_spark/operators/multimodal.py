"""Multimodal payload plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container ships no image/audio libraries, so the DECODE step is a
clearly-marked stub (``NotImplementedError`` unless ``fake=True``); the
Spark-side plumbing — schema, Arrow batch shapes, ``mapInPandas``
signatures, partitioning — is real and tested.  In production the fake
kernels swap for Pillow/torchaudio/pyav calls with identical frames.

Schema: (item_id long, modality string, payload binary,
         meta map<string,string>).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODALITIES = ("image", "audio", "video")

FEATURE_DIM = 16


def synth_payloads(spark: SparkSession, n: int, parallelism: int | None = None) -> DataFrame:
    """Deterministic synthetic multimodal table: payload bytes derive
    from the item id (pure column expressions)."""
    rng = spark.range(0, n, 1, parallelism) if parallelism else spark.range(n)
    m = F.element_at(
        F.array(*[F.lit(x) for x in MODALITIES]),
        (F.pmod(F.col("id"), F.lit(len(MODALITIES))) + 1).cast("int"),
    )
    payload = F.concat(
        F.lit("PAYLOAD:"), m, F.lit(":"), F.col("id").cast("string"),
        F.repeat(F.lit("«"), F.pmod(F.col("id"), F.lit(64)).cast("int")),
    ).cast("binary")
    meta = F.create_map(
        F.lit("width"), (F.pmod(F.col("id"), F.lit(1920)) + 1).cast("string"),
        F.lit("height"), (F.pmod(F.col("id"), F.lit(1080)) + 1).cast("string"),
        F.lit("codec"), F.concat(F.lit("c"), F.pmod(F.col("id"), F.lit(4)).cast("string")),
    )
    return rng.select(
        F.col("id").alias("item_id"), m.alias("modality"),
        payload.alias("payload"), meta.alias("meta"),
    )


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256(payload) bytes →
    FEATURE_DIM floats in [0,1).  Replaced by a real encoder in prod."""
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, b in enumerate(payloads):
        digest = hashlib.sha256(bytes(b or b"")).digest()
        out[i] = np.frombuffer(digest[: 2 * FEATURE_DIM], dtype=np.uint16).astype(
            np.float32
        ) / 65536.0
    return out


def extract_features(
    df: DataFrame, fake: bool = True, batch_note: str = "decode"
) -> DataFrame:
    """(item_id, modality, payload, meta) → (item_id, modality,
    features array<float>, n_bytes).

    ``fake=False`` requires real codecs and raises NotImplementedError —
    the production integration point.  The mapInPandas batch shape
    (iterator of pdf in, pdf out, arrow-typed array column) is exactly
    what a real decoder would use.
    """
    schema = "item_id long, modality string, features array<float>, n_bytes long"

    def _run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    f"real {batch_note} requires image/audio codecs not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "modality": pdf["modality"],
                    "features": list(feats),
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                }
            )

    return df.mapInPandas(_run, schema=schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan (metadata only — no decode): one output
    row per planned frame index, derived from meta['height'] as a fake
    frame count.  Demonstrates the explode-based fan-out a real sampler
    uses."""
    frames = F.sequence(
        F.lit(0),
        F.least(
            F.coalesce(
                F.element_at("meta", "height").cast("int"), F.lit(0)
            ),
            F.lit(300),
        ),
        F.lit(every_n),
    )
    return (
        df.where(F.col("modality") == "video")
        .select("item_id", F.explode(frames).alias("frame_idx"))
    )
