"""Multimodal column handling: binary payloads + typed metadata
(SURVEY.md extension set for training-data pipelines).

Design: image/audio/video travel as opaque ``binary`` columns with a
``media_type`` tag; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages over (id, payload) with fixed
output schemas.  The sandbox has no image/audio libs, so the decoders
are STUBBED exactly as the brief requires: ``decode_image``/
``decode_audio`` raise ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded hash-based feature
vector stands in — the Spark-side plumbing (schema, projection,
partitioning, batch shape) is real and tested either way.

HTML -> text extraction IS fully implemented (regex strip over decoded
bytes) because the pages input (BASELINE.json input_hint) carries
``html: binary``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 32

MEDIA_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def html_to_text(pages: DataFrame, html_col: str = "html", out_col: str = "text_from_html") -> DataFrame:
    """Decode html binary -> text (JVM-side: cast + regex tag strip).
    Real implementation, no UDF."""
    decoded = F.decode(F.col(html_col), "UTF-8")
    stripped = F.regexp_replace(decoded, r"<[^>]*>", " ")
    # (?U): Java \s is ASCII-only by default; pages carry unicode ws (P2)
    return pages.withColumn(out_col, F.trim(F.regexp_replace(stripped, r"(?U)\s+", " ")))


def _fake_feature(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in feature: seeded from the payload digest —
    stable across runs/machines, shaped like a real extractor output."""
    digest = hashlib.md5(media_type.encode() + (payload or b"")).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, FEATURE_DIM).astype(np.float32)


def make_media_feature_fn(media_type: str, deterministic_fake: bool = True):
    """mapInPandas stage: (id, payload:binary) -> MEDIA_FEAT_SCHEMA rows.

    With ``deterministic_fake=False`` this raises NotImplementedError —
    the decode step needs Pillow/librosa/pyav, absent in this sandbox;
    the call site, batching, and schema are the production shape.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    f"{media_type} decode requires a codec library not present "
                    "in this environment; run with deterministic_fake=True "
                    "or install the decoder and swap it in here"
                )
            feats = [
                _fake_feature(p, media_type) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": media_type,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return extract


def media_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type: str,
    deterministic_fake: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed feature extraction over a binary column.

    Projection happens BEFORE the UDF (only id + payload cross the
    Arrow boundary); payloads are large, so repartition by id hash to
    size-balance Arrow batches (same salting argument as the tagger).
    """
    narrow = df.select(
        F.col(id_col).cast("string").alias("id"), F.col(payload_col).alias("payload")
    )
    if n_partitions:
        narrow = narrow.repartition(n_partitions, F.xxhash64("id"))
    return narrow.mapInPandas(make_media_feature_fn(media_type, deterministic_fake), MEDIA_FEAT_SCHEMA)
