"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed in Arrow batches.

Decode support is format-tiered:

* REAL decoders (stdlib/numpy only, no codec libraries needed):
  ``audio/wav`` (RIFF parse via the ``wave`` module → duration,
  sample rate, channels, RMS) and ``image/ppm`` (binary P6 parse →
  dimensions, per-channel means). These run the full Arrow path
  end to end on genuine bytes.
* STUBBED formats (jpeg/png/mp4 — codec libraries are not in this
  container): ``decode_media`` raises NotImplementedError unless
  ``fake=True``, which substitutes a deterministic hash-derived
  feature vector. Everything around the stub — schema, Arrow batch
  shape, mapInPandas plumbing, partitioning — is identical to the
  real-format path, so adding a codec is a one-function change.

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


def decode_wav(payload: bytes) -> list[float]:
    """REAL WAV decode (stdlib ``wave`` + numpy, 16-bit PCM):
    ``[duration_s, sample_rate/48000, n_channels, rms, peak, 0, 0, 1]``
    (padded to FEATURE_DIM; trailing 1 marks a real decode)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        n_frames = w.getnframes()
        sampwidth = w.getsampwidth()
        raw = w.readframes(n_frames)
    if sampwidth != 2:
        raise NotImplementedError("only 16-bit PCM WAV supported")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    rms = float(np.sqrt((samples * samples).mean())) if len(samples) else 0.0
    peak = float(np.abs(samples).max()) if len(samples) else 0.0
    duration = n_frames / sr if sr else 0.0
    return [duration, sr / 48000.0, float(n_ch), rms, peak, 0.0, 0.0, 1.0]


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header -> (width, height, maxval,
    pixel_offset); comments stripped per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary PPM (P6) supported")
    # header: magic, width, height, maxval as whitespace-separated
    # tokens (comments stripped), then one whitespace byte, then pixels
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    return fields[0], fields[1], fields[2], pos


def decode_ppm(payload: bytes) -> list[float]:
    """REAL binary-PPM (P6) decode (header parse + numpy):
    ``[w/4096, h/4096, mean_r, mean_g, mean_b, maxval/255, 0, 1]``."""
    import numpy as np

    w, h, maxval, pos = _ppm_header(payload)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    means = px.reshape(-1, 3).mean(axis=0) / float(maxval)
    return [
        w / 4096.0,
        h / 4096.0,
        float(means[0]),
        float(means[1]),
        float(means[2]),
        maxval / 255.0,
        0.0,
        1.0,
    ]


def decode_media(payload: bytes, kind: str, fake: bool = False) -> list[float]:
    """Decode one payload into a FEATURE_DIM feature vector.

    ``audio/wav`` and ``image/ppm`` decode for REAL (stdlib parsers,
    see :func:`decode_wav` / :func:`decode_ppm`). Other kinds need
    codec libraries not present in this container: with ``fake=False``
    they raise NotImplementedError (the honest stub); ``fake=True``
    returns a deterministic hash-derived vector with the exact shape a
    real embedding would have.
    """
    if not fake:
        if kind == "audio/wav":
            return decode_wav(payload)
        if kind == "image/ppm":
            return decode_ppm(payload)
        raise NotImplementedError(
            f"decoding {kind!r} requires codec libraries not present in "
            "this container; pass fake=True for the deterministic test "
            "double (audio/wav and image/ppm decode for real)"
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


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize of a binary PPM (P6) — pure numpy
    index selection, emits a valid P6 payload."""
    import numpy as np

    w, h, maxval, pos = _ppm_header(payload)
    px = np.frombuffer(
        payload, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3)
    iy = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ix = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    out = px[iy][:, ix]
    header = f"P6\n{out_w} {out_h}\n{maxval}\n".encode()
    return header + out.tobytes()


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Arrow-batched image resize over the media table:
    ``(media_ref, kind, width, height, payload)`` — the training-
    pipeline normalize-resolution stage. ``image/ppm`` resizes for
    REAL (:func:`resize_ppm`); codec formats (jpeg/png/...) need
    libraries absent from this container — with ``fake=False`` they
    raise NotImplementedError (honest stub), with ``fake=True`` the
    payload passes through unchanged so the Spark-side plumbing
    (schema, batching, partitioning) is exercised end to end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(p: bytes, kind: str) -> bytes:
            if kind == "image/ppm":
                return resize_ppm(p or b"", width, height)
            if fake:
                return p
            raise NotImplementedError(
                f"resizing {kind!r} requires codec libraries not present "
                "in this container (image/ppm resizes for real)"
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": [
                        one(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(
        run,
        "media_ref string, kind string, width int, height int, payload binary",
    )


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
