"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow batches.

The decode step is STUBBED (image/audio codec libraries are not in
this container): ``decode_media`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic hash-derived feature
vector. Everything around the stub — schema, Arrow batch shape,
mapInPandas plumbing, partitioning — is real and tested, so swapping
in a real decoder is a one-function change.

Media rows ride the same ``documents(doc_id, spans)`` model: a media
span's ``media_ref`` keys into a ``media(media_ref, kind, payload,
meta)`` side table (this module), joined on demand. Payloads never
pass through Python row-at-a-time — only Arrow batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 8
FEATURES_SCHEMA = (
    "media_ref string, kind string, n_bytes bigint, "
    f"features array<float>"
)


def media_from_documents(nested: DataFrame) -> DataFrame:
    """Synthesize a media side table from the nested corpus: one row
    per media span, payload = deterministic bytes derived from the
    media_ref (stands in for real blobs; same shape and size math)."""
    refs = (
        nested.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )
    return refs.select(
        "media_ref",
        F.lit("image").alias("kind"),
        # deterministic fake payload: repeated sha-like bytes
        F.to_binary(F.sha2(F.col("media_ref"), 256), F.lit("hex")).alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_media(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """Decode one payload into a feature vector.

    REAL DECODER NOT AVAILABLE IN THIS ENVIRONMENT — with
    ``fake=False`` this raises NotImplementedError (the honest stub);
    ``fake=True`` returns a deterministic hash-derived vector with the
    exact shape a real embedding would have.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "container; pass fake=True for the deterministic test double"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the media table via
    mapInPandas: ``(media_ref, kind, n_bytes, features)``.

    Batches stream through the python worker with
    ``maxRecordsPerBatch`` bounding memory per batch — payload columns
    are the big ones, so this matters more here than anywhere else.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p or b"")),
                    "features": [
                        decode_media(p, k, fake=fake)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame
    timestamp. Payload decode is stubbed like decode_media; the
    timestamp fan-out (the Spark-side shape: explode over a computed
    sequence) is real."""
    frames = F.when(
        F.col("duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "media_ref",
        "kind",
        F.explode(frames).alias("frame_ts_ms"),
    )
