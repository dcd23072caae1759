"""Deterministic synthesis of the canonical nested input table
(BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

FIXTURES.md §1.1 rules, seed=42: each source text splits into 1-4
text spans at whitespace boundaries (so concatenated text-span
tokenization equals whole-text tokenization); media spans
(``media_ref = media://{doc_id}/{i}``) are interleaved after ~20% of
text spans. Per-document determinism comes from an RNG seeded by
(seed, doc_id) — synthesis is embarrassingly parallel and stable
under repartitioning, the property that makes the corpus reproducible
at 10^12 rows.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

NESTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_SCHEMA)),
    ]
)


def build_spans(doc_id: str, text: str, seed: int = 42) -> list[dict]:
    """Deterministic span list for one document (plain Python)."""
    rng = random.Random(
        int.from_bytes(
            hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()[:8], "big"
        )
    )
    n_spans = rng.randint(1, 4)
    # split points at whitespace boundaries: cut after a whitespace run
    words = text.split(" ") if text else []
    spans: list[dict] = []
    offset = 0
    if not words:
        chunks = [text]
    else:
        cuts = sorted(rng.sample(range(1, len(words)), min(n_spans - 1, max(len(words) - 1, 0))))
        chunks = []
        prev = 0
        for c in cuts:
            chunks.append(" ".join(words[prev:c]) + " ")
            prev = c
        chunks.append(" ".join(words[prev:]))
    for chunk in chunks:
        spans.append(
            {"kind": "text", "text": chunk, "media_ref": None, "offset": offset}
        )
        offset += 1
        if rng.random() < 0.2:
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": f"media://{doc_id}/{offset}",
                    "offset": offset,
                }
            )
            offset += 1
    return spans


def nested_from_texts(
    spark: SparkSession, texts: dict[str, str], seed: int = 42
) -> DataFrame:
    """Small fixture corpora: driver-side synthesis."""
    rows = [(doc_id, build_spans(doc_id, t, seed)) for doc_id, t in texts.items()]
    return spark.createDataFrame(rows, NESTED_SCHEMA)


def nested_from_flat(
    df: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed synthesis from a flat (doc_id, text) table via
    mapInPandas — per-doc determinism makes this shuffle-invariant."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "spans": [
                        build_spans(str(d), t or "", seed)
                        for d, t in zip(pdf[id_col], pdf[text_col])
                    ],
                }
            )
            yield out

    return df.mapInPandas(gen, NESTED_SCHEMA)
