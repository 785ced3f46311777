"""Multimodal (image/audio/video) column operators.

Design for 100 TB multimodal corpora: media lives in opaque ``binary``
columns (or object-store URIs) beside typed metadata structs; all
decode / feature-extraction runs in Arrow-batched ``mapInPandas`` so
bytes never round-trip through row-at-a-time Python.

The decode kernels themselves are STUBBED in this container (no
image/audio libs): each raises NotImplementedError unless
``deterministic_fake=True``, which produces seeded, content-derived
fake outputs so the Spark-side plumbing (schemas, batching,
partitioning) is fully testable. Swapping a real decoder in is a
one-function change — the Spark plan is identical.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical schema for a multimodal asset row
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),  # inline bytes (small) ...
        StructField("uri", StringType(), True),  # ... or object-store pointer
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("embedding", ArrayType(DoubleType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def _decode_image(content: bytes) -> tuple[int, int, list[float]]:
    """STUB: real impl would use PIL/opencv (not in this container)."""
    raise NotImplementedError(
        "image decode requires an imaging library; pass deterministic_fake=True"
    )


def _fake_image_features(content: Optional[bytes], dim: int = 8):
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    w = 64 + h[0]  # content-derived, deterministic
    ht = 64 + h[1]
    emb = [((h[i] / 255.0) * 2 - 1) for i in range(dim)]
    return w, ht, emb


def image_features(
    assets: DataFrame,
    deterministic_fake: bool = False,
    embedding_dim: int = 8,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + embed image assets via Arrow-batched mapInPandas.

    Partition-parallel; each Python worker sees pandas batches of
    (asset_id, content) only — column pruning keeps bytes out of rows
    that don't need them.
    """
    pruned = assets.select("asset_id", "content")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "embedding": []}
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                if deterministic_fake:
                    w, h, emb = _fake_image_features(content, embedding_dim)
                else:
                    w, h, emb = _decode_image(content)  # pragma: no cover
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["embedding"].append(emb)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("mfcc", ArrayType(DoubleType()), True),
    ]
)


def _fake_audio_features(content: Optional[bytes], n_mfcc: int):
    import hashlib

    h = hashlib.sha256(b"audio:" + (content or b"")).digest()
    rate = 8000 * (1 + h[0] % 6)  # 8/16/24/32/40/48 kHz
    mfcc = [((h[i % 32] / 255.0) * 40 - 20) for i in range(n_mfcc)]
    return rate, mfcc


def audio_features(
    assets: DataFrame,
    deterministic_fake: bool = False,
    n_mfcc: int = 13,
) -> DataFrame:
    """Decode + feature-extract audio assets (MFCC-shaped vector) via
    Arrow-batched mapInPandas — same plumbing contract as
    image_features: column-pruned input, partition-parallel, swap the
    stub kernel for librosa/torchaudio without touching the plan."""
    pruned = assets.select(
        "asset_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"asset_id": [], "sample_rate": [], "duration_ms": [], "mfcc": []}
            for aid, content, dur in zip(
                pdf["asset_id"], pdf["content"], pdf["duration_ms"]
            ):
                if not deterministic_fake:
                    raise NotImplementedError(
                        "audio decode requires an audio library; "
                        "pass deterministic_fake=True"
                    )  # pragma: no cover
                rate, mfcc = _fake_audio_features(content, n_mfcc)
                out["asset_id"].append(aid)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(dur)
                out["mfcc"].append(mfcc)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(
    assets: DataFrame,
    every_ms: int = 1000,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Sample video frames every `every_ms` — expands one asset row into
    N frame rows (mapInPandas so output cardinality is free-form)."""
    pruned = assets.select("asset_id", "content", F.col("meta.duration_ms").alias("duration_ms"))

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for aid, content, dur in zip(
                pdf["asset_id"], pdf["content"], pdf["duration_ms"]
            ):
                if not deterministic_fake:
                    raise NotImplementedError(
                        "video decode requires a media library; "
                        "pass deterministic_fake=True"
                    )
                n = max(int((dur or 0) // every_ms), 0)
                for i in range(n):
                    seed = hashlib.sha256(
                        (content or b"") + i.to_bytes(4, "little")
                    ).digest()
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(seed[:16])
            yield pd.DataFrame(rows)

    return pruned.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def make_fake_assets(spark, n: int = 8, modality: str = "image") -> DataFrame:
    """Deterministic asset table for tests (content = seeded bytes)."""
    import hashlib

    rows = []
    for i in range(n):
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                modality,
                bytearray(content),
                f"s3://bucket/assets/{i}",
                (640, 480, 5000 + 1000 * i, "fake"),
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
