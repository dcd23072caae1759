"""Sources (reference file_utils semantics), streaming variants,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from textalyzer_spark.corpus import nested_from_texts
from textalyzer_spark.operators.multimodal import (
    decode_media,
    extract_media_features,
    media_from_documents,
    sample_frames,
)
from textalyzer_spark.sources.readers import read_text_corpus
from textalyzer_spark.streaming.jobs import (
    run_to_completion,
    streaming_word_frequency,
)


def test_read_text_corpus_recursive(spark, tmp_path):
    # mirrors the reference nested-dir fixture (file_utils.rs:226-252)
    (tmp_path / "nested" / "nested2").mkdir(parents=True)
    (tmp_path / "a.txt").write_text("alpha beta\n")
    (tmp_path / "nested" / "b.txt").write_text("gamma delta\n")
    (tmp_path / "nested" / "nested2" / "c.txt").write_text("epsilon\n")
    (tmp_path / "empty.txt").write_text("")
    (tmp_path / "bin.dat").write_bytes(b"ab\x00cd")
    df = read_text_corpus(spark, str(tmp_path))
    rows = {r["doc_id"].rsplit("/", 1)[-1]: r["text"] for r in df.collect()}
    # binary dropped; empty files skipped by the Spark source
    # (documented deviation — zero lines/tokens either way)
    assert set(rows) == {"a.txt", "b.txt", "c.txt"}
    assert rows["c.txt"] == "epsilon\n"


def test_streaming_word_frequency(spark, tmp_path):
    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    spark.createDataFrame(
        [("d1", "spark spark flink"), ("d2", "spark beam")],
        "doc_id string, text string",
    ).write.parquet(inp)
    rows = run_to_completion(
        streaming_word_frequency(spark, inp), ckpt, output_mode="complete"
    )
    got = {r["word"]: r["count"] for r in rows}
    assert got == {"spark": 3, "flink": 1, "beam": 1}


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    from textalyzer_spark.streaming.jobs import streaming_first_seen

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    # batch 1: two unique docs + an intra-batch duplicate
    spark.createDataFrame(
        [("a", "alpha text"), ("b", "beta text"), ("a2", "alpha text")],
        "doc_id string, text string",
    ).write.mode("append").parquet(inp)
    from textalyzer_spark.streaming.jobs import run_to_completion_foreach

    rows1 = run_to_completion_foreach(
        streaming_first_seen(spark, inp), ckpt, output_mode="update"
    )
    assert {r["doc_id"] for r in rows1} == {"a", "b"}  # a2 deduped in-batch

    # batch 2 (same checkpoint → only new files processed): one dup of
    # batch 1, one genuinely new doc — state must drop the former
    spark.createDataFrame(
        [("c", "alpha text"), ("d", "gamma text")],
        "doc_id string, text string",
    ).write.mode("append").parquet(inp)
    rows2 = run_to_completion_foreach(
        streaming_first_seen(spark, inp), ckpt, output_mode="update"
    )
    assert {r["doc_id"] for r in rows2} == {"d"}


def test_decode_media_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)
    v1 = decode_media(b"payload", "image", fake=True)
    v2 = decode_media(b"payload", "image", fake=True)
    assert v1 == v2 and len(v1) == 8
    assert all(0.0 <= x <= 1.0 for x in v1)


def test_media_feature_extraction(spark):
    texts = {f"d{i}": "alpha beta gamma delta epsilon zeta" for i in range(30)}
    nested = nested_from_texts(spark, texts, seed=1)
    media = media_from_documents(nested)
    n_media = media.count()
    assert n_media > 0
    feats = extract_media_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == n_media
    for r in rows:
        assert len(r["features"]) == 8
        assert r["n_bytes"] == 32  # sha256 payload bytes


def test_sample_frames(spark):
    media = spark.createDataFrame(
        [("m1", "video", b"", 0, 0, 3500), ("m2", "image", b"", 0, 0, None)],
        "media_ref string, kind string, payload binary, width int, height int, duration_ms int",
    )
    out = sample_frames(media, every_ms=1000).collect()
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_ts_ms"])
    assert sorted(by_ref["m1"]) == [0, 1000, 2000, 3000]
    assert by_ref["m2"] == [0]
