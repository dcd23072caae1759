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
    # binary dropped; empty files KEPT as empty-string entries
    # (reference parity, file_utils.rs:122-128)
    assert set(rows) == {"a.txt", "b.txt", "c.txt", "empty.txt"}
    assert rows["c.txt"] == "epsilon\n"
    assert rows["empty.txt"] == ""


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


def test_read_text_corpus_keeps_empty_files(spark, tmp_path):
    """Reference parity file_utils.rs:122-128: empty files appear as
    empty-string entries (binaryFile alone would skip them)."""
    (tmp_path / "full.txt").write_text("hello world")
    (tmp_path / "empty.txt").write_text("")
    from textalyzer_spark.sources.readers import read_text_corpus

    rows = {r["doc_id"]: r["text"] for r in read_text_corpus(spark, str(tmp_path)).collect()}
    assert len(rows) == 2
    texts = sorted(rows.values())
    assert texts == ["", "hello world"]
    # empty entry's doc_id uses the same URI shape as binaryFile's
    full_id = next(k for k, v in rows.items() if v)
    empty_id = next(k for k, v in rows.items() if not v)
    assert full_id.split(":", 1)[0] == empty_id.split(":", 1)[0]


def test_read_text_corpus_ignore_rules(spark, tmp_path):
    """Reference parity file_utils.rs:60-97: .gitignore/.ignore rules
    honored, .git skipped, negation wins later."""
    (tmp_path / "keep.txt").write_text("keep")
    (tmp_path / "skip.log").write_text("skip")
    (tmp_path / ".gitignore").write_text("*.log\nbuild/\n!important.log\n")
    (tmp_path / "important.log").write_text("negated keep")
    (tmp_path / "build").mkdir()
    (tmp_path / "build" / "artifact.txt").write_text("ignored dir")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "inner.log").write_text("inherited skip")
    (tmp_path / "sub" / ".ignore").write_text("private*\n")
    (tmp_path / "sub" / "private.txt").write_text("local skip")
    (tmp_path / "sub" / "ok.txt").write_text("sub keep")
    (tmp_path / ".git").mkdir()
    (tmp_path / ".git" / "HEAD").write_text("ref: refs/heads/main")
    from textalyzer_spark.sources.readers import read_text_corpus

    rows = read_text_corpus(spark, str(tmp_path), use_ignore_rules=True).collect()
    names = sorted(r["doc_id"].rsplit("/", 1)[-1] for r in rows)
    # hidden files (incl. the ignore files themselves) are skipped,
    # like the reference's WalkBuilder hidden-file default
    assert names == ["important.log", "keep.txt", "ok.txt"]


def test_format_duplications_files_only():
    """Reference parity output.rs:110 (--files-only): location lists
    without the content blocks."""
    from textalyzer_spark.formatting import format_duplications

    rows = [
        ("dup content line", [("a.txt", 3), ("b.txt", 7)]),
        ("other block", [("c.txt", 1), ("c.txt", 9)]),
    ]
    full = format_duplications(rows, files_only=False)
    fo = format_duplications(rows, files_only=True)
    assert "Found 2 duplicate entries" in full and "Found 2 duplicate entries" in fo
    assert "a.txt:3" in fo and "c.txt:9" in fo
    assert "dup content line" in full and "dup content line" not in fo
    assert "-" * 80 in full and "-" * 80 not in fo
    assert format_duplications([], files_only=True) == "No duplications found.\n"


def _make_wav(freq_hz: float = 440.0, seconds: float = 0.25, sr: int = 8000) -> bytes:
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    n = int(sr * seconds)
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(0.5 * 32767 * math.sin(2 * math.pi * freq_hz * i / sr))
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def _make_ppm(w: int = 4, h: int = 2, rgb=(255, 0, 128)) -> bytes:
    header = f"P6\n# test\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def test_real_wav_and_ppm_decode_through_arrow_path(spark):
    """audio/wav and image/ppm decode for REAL (stdlib parsers) through
    the same mapInPandas plumbing the stubbed formats use."""
    import math

    from textalyzer_spark.operators.multimodal import extract_media_features

    rows = [
        ("wav1", "audio/wav", _make_wav(), None, None, 250),
        ("ppm1", "image/ppm", _make_ppm(), 4, 2, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_ref string, kind string, payload binary, "
        "width int, height int, duration_ms int",
    )
    out = {
        r["media_ref"]: r
        for r in extract_media_features(media, fake=False).collect()
    }
    wavf = out["wav1"]["features"]
    assert abs(wavf[0] - 0.25) < 1e-6          # duration seconds
    assert abs(wavf[1] - 8000 / 48000) < 1e-6  # sample rate
    assert wavf[2] == 1.0                      # channels
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert abs(wavf[3] - 0.5 / math.sqrt(2)) < 0.01
    ppmf = out["ppm1"]["features"]
    assert abs(ppmf[0] - 4 / 4096) < 1e-6 and abs(ppmf[1] - 2 / 4096) < 1e-6
    assert abs(ppmf[2] - 1.0) < 1e-3    # mean R
    assert abs(ppmf[3] - 0.0) < 1e-3    # mean G
    assert abs(ppmf[4] - 128 / 255) < 1e-3  # mean B
    # unsupported format still raises the honest stub error
    import pytest as _pytest

    from textalyzer_spark.operators.multimodal import decode_media

    with _pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg", fake=False)


def test_iceberg_paths_gated_honestly(spark):
    """The Iceberg entry points must detect the missing runtime (this
    sandbox has no Iceberg jar) rather than fail mid-write; on a real
    cluster iceberg_available flips true and the same calls run."""
    from textalyzer_spark.sources.iceberg import (
        iceberg_available,
        write_documents_iceberg,
    )

    available = iceberg_available(spark)
    if available:
        df = spark.createDataFrame([(1, "t")], "doc_id bigint, text string")
        write_documents_iceberg(df, "lake.db.docs_test")
        assert spark.read.table("lake.db.docs_test").count() == 1
    else:
        import pytest as _pytest

        df = spark.createDataFrame([(1, "t")], "doc_id bigint, text string")
        with _pytest.raises(Exception):
            write_documents_iceberg(df, "lake.db.docs_test")


def test_streaming_near_dup_across_batches(spark, tmp_path):
    """Stateful streaming NEAR-dup: a later microbatch's document must
    match a near-duplicate admitted in an EARLIER batch (state
    survival), while unrelated docs emit nothing."""
    from textalyzer_spark.streaming.jobs import (
        run_to_completion_foreach,
        streaming_near_dup,
    )

    inp, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    spark.createDataFrame(
        [("a", base), ("u1", "totally different words about engines here today")],
        "doc_id string, text string",
    ).write.mode("append").parquet(inp)
    rows1 = run_to_completion_foreach(
        streaming_near_dup(spark, inp, k=3, min_est_jaccard=0.5), ckpt
    )
    assert rows1 == []  # nothing similar within batch 1

    # batch 2: one near-dup of "a" (one word changed), one fresh doc
    near = base.replace("kappa", "kappazz")
    spark.createDataFrame(
        [("b", near), ("u2", "yet another unrelated text body entirely")],
        "doc_id string, text string",
    ).write.mode("append").parquet(inp)
    rows2 = run_to_completion_foreach(
        streaming_near_dup(spark, inp, k=3, min_est_jaccard=0.5), ckpt
    )
    matches = {(r["doc_id"], r["dup_of"]) for r in rows2}
    assert matches == {("b", "a")}
    assert all(r["est_jaccard"] >= 0.5 for r in rows2)


def test_streaming_near_dup_recency_eviction(spark, tmp_path):
    """Round-3 VERDICT stretch: a FULL bucket with first-come-forever
    state goes blind to duplicates of anything admitted later; the
    recency ring keeps catching them. Construction: find a chimera
    triple (A, B, C) where C shares its band-1 bucket with A and its
    band-2 bucket with B but equals neither signature. Batch 1 fills
    both of C's buckets (cap=1) with A and B; C arrives (silent, est
    < 1 against both) and — under recency — rotates A/B out; several
    batches later an exact duplicate of C arrives and is caught ONLY
    because C was admitted over the full bucket. admit-first mode is
    asserted provably silent on the same stream."""
    from textalyzer_spark.operators.dedup import minhash_signatures
    from textalyzer_spark.streaming.jobs import (
        run_to_completion_foreach,
        streaming_near_dup,
    )

    base = (
        "orange apple cherry walnut pecan almond plum grape melon "
        "fig date kiwi mango papaya guava lime lemon peach pear cedar"
    ).split()
    # single-token substitutions of one base: most of the 8 minhashes
    # survive each edit, so per-band collisions between DIFFERENT
    # signatures are plentiful (2000+ triples in this pool)
    pool = [("base", " ".join(base))]
    for i in range(len(base)):
        for sub in ("zz", "qq", "ww"):
            toks = list(base)
            toks[i] = sub + str(i)
            pool.append((f"v{i}{sub}", " ".join(toks)))
    sigs = {
        r["doc_id"]: tuple(r["signature"])
        for r in minhash_signatures(
            spark.createDataFrame(pool, "doc_id string, text string"),
            k=3, num_hashes=8,
        ).collect()
    }
    b1 = {d: s[:4] for d, s in sigs.items()}
    b2 = {d: s[4:] for d, s in sigs.items()}
    triple = None
    for c in sigs:
        for a in sigs:
            if sigs[a] == sigs[c] or b1[a] != b1[c] or b2[a] == b2[c]:
                continue
            for b in sigs:
                if (
                    sigs[b] != sigs[c]
                    and b2[b] == b2[c]
                    and b1[b] != b1[c]
                    and b1[b] != b1[a]
                    and b2[b] != b2[a]
                ):
                    triple = (a, b, c)
                    break
            if triple:
                break
        if triple:
            break
    assert triple, "no chimera triple in the deterministic pool"
    a_id, b_id, c_id = triple
    texts = dict(pool)

    def batch(rows):
        spark.createDataFrame(rows, "doc_id string, text string").write.mode(
            "append"
        ).parquet(inp)

    for mode, caught in (("recency", True), ("admit-first", False)):
        inp = str(tmp_path / f"in_{mode}")
        ckpt = str(tmp_path / f"ck_{mode}")
        kw = dict(
            k=3, num_hashes=8, bands=2, min_est_jaccard=1.0,
            max_bucket_state=1, eviction=mode,
        )
        batch([("A", texts[a_id]), ("B", texts[b_id])])
        r1 = run_to_completion_foreach(
            streaming_near_dup(spark, inp, **kw), ckpt
        )
        assert r1 == []
        batch([("C", texts[c_id])])  # full buckets; est<1 vs A and B
        r2 = run_to_completion_foreach(
            streaming_near_dup(spark, inp, **kw), ckpt
        )
        assert r2 == []
        batch([("U", "completely unrelated filler body of words here")])
        run_to_completion_foreach(streaming_near_dup(spark, inp, **kw), ckpt)
        batch([("C2", texts[c_id])])  # late exact dup of the RECENT doc
        r4 = run_to_completion_foreach(
            streaming_near_dup(spark, inp, **kw), ckpt
        )
        got = {(r["doc_id"], r["dup_of"]) for r in r4}
        assert got == ({("C2", "C")} if caught else set()), (mode, got)


def test_resize_ppm_real_and_stub(spark):
    """image/ppm resizes for REAL (nearest-neighbor numpy, valid P6
    out); codec formats stub honestly (raise) or pass through under
    fake=True — completing the decode/feature/resize/frame-sample
    multimodal verb set."""
    import pytest as _pytest

    from textalyzer_spark.operators.multimodal import (
        _ppm_header,
        decode_ppm,
        resize_images,
        resize_ppm,
    )

    # 4x2 image, left half red, right half blue
    header = b"P6\n4 2\n255\n"
    row = bytes([255, 0, 0] * 2 + [0, 0, 255] * 2)
    src = header + row * 2
    out = resize_ppm(src, 2, 1)
    w, h, maxval, pos = _ppm_header(out)
    assert (w, h, maxval) == (2, 1, 255)
    assert out[pos:] == bytes([255, 0, 0, 0, 0, 255])  # one red, one blue
    assert decode_ppm(out)[2] > 0.4  # mean_r sane on the resized image

    media = spark.createDataFrame(
        [("p1", "image/ppm", src), ("j1", "image/jpeg", b"\xff\xd8junk")],
        "media_ref string, kind string, payload binary",
    )
    real = {
        r["media_ref"]: r
        for r in resize_images(
            media.filter("kind = 'image/ppm'"), 2, 1
        ).collect()
    }
    assert _ppm_header(bytes(real["p1"]["payload"]))[:2] == (2, 1)
    # honest stub: codec formats raise without fake=True
    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_images(media, 2, 1).collect()
    passthru = {
        r["media_ref"]: bytes(r["payload"])
        for r in resize_images(media, 2, 1, fake=True).collect()
    }
    assert passthru["j1"] == b"\xff\xd8junk"


def test_streaming_near_dup_metrics_counters(spark, tmp_path):
    """Round-5 observability: output='metrics' exposes the per-bucket
    state counters a long-running stream alerts on. Five identical
    docs through cap-2 buckets: recency rings evict and keep hitting;
    admit-first rejects instead and its n_evicted stays 0."""
    from textalyzer_spark.streaming.jobs import (
        run_to_completion_foreach,
        streaming_near_dup,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    for mode in ("recency", "admit-first"):
        inp = str(tmp_path / f"in_{mode}")
        ckpt = str(tmp_path / f"ck_{mode}")
        kw = dict(
            k=3, num_hashes=8, bands=2, min_est_jaccard=1.0,
            max_bucket_state=2, eviction=mode, output="metrics",
        )
        rows = []
        for i in range(5):
            spark.createDataFrame(
                [(f"D{i}", text)], "doc_id string, text string"
            ).write.mode("append").parquet(inp)
            rows = run_to_completion_foreach(
                streaming_near_dup(spark, inp, **kw), ckpt
            )
        # final emission per bucket carries the cumulative counters
        last = {(r["band"], r["bucket"]): r for r in rows}
        assert len(last) == 2  # one bucket per band (identical sigs)
        for m in last.values():
            assert m["n_seen"] == 5
            # every later doc matched a stored signature exactly
            assert m["n_hits"] == 4
            assert m["n_state"] <= 2
            if mode == "recency":
                assert m["n_evicted"] == 3 and m["n_rejected"] == 0
            else:
                assert m["n_rejected"] == 3 and m["n_evicted"] == 0


def test_streaming_stateless_twins_match_batch(spark, tmp_path):
    """VERDICT r5 item 5: the round-5 stateless operators (PII
    redaction stats, stratified sampling, contamination vs a
    broadcast benchmark set) as streaming twins — checkpoint-restart
    across two microbatches, output identical to the batch operators
    over the same files."""
    from textalyzer_spark.operators.dedup import contamination_stats
    from textalyzer_spark.operators.pii import pii_stats
    from textalyzer_spark.operators.quality import lang_id
    from textalyzer_spark.operators.sampling import stratified_sample
    from textalyzer_spark.streaming.jobs import (
        run_to_completion_foreach,
        streaming_contamination,
        streaming_pii_stats,
        streaming_stratified_sample,
    )

    inp = str(tmp_path / "in")
    b1 = [
        ("d1", "contact bob@example.com or 10.0.3.7 the a is and of it"),
        ("d2", "der und das ist nicht ein zu hund im schnee heute"),
    ]
    b2 = [
        ("d3", "the quick brown fox jumps over the lazy benchmark dog"),
        ("d4", "short"),
    ]
    bench = spark.createDataFrame(
        [("b1", "quick brown fox jumps over")], "doc_id string, text string"
    )
    rates = {"en": 0.9, "de": 0.8}
    spark.createDataFrame(b1, "doc_id string, text string").write.mode(
        "append"
    ).parquet(inp)
    ck = {n: str(tmp_path / f"ck_{n}") for n in ("pii", "strat", "cont")}
    got: dict = {"pii": [], "strat": [], "cont": []}

    def drain():
        got["pii"] += run_to_completion_foreach(
            streaming_pii_stats(spark, inp), ck["pii"], "append"
        )
        got["strat"] += run_to_completion_foreach(
            streaming_stratified_sample(spark, inp, rates, salt="s"),
            ck["strat"],
            "append",
        )
        got["cont"] += run_to_completion_foreach(
            streaming_contamination(spark, inp, bench, k=5),
            ck["cont"],
            "append",
        )

    drain()
    assert len(got["pii"]) == 2
    n_strat_1 = len(got["strat"])
    # second microbatch lands; the restarted stream (same checkpoint)
    # processes ONLY the new files
    spark.createDataFrame(b2, "doc_id string, text string").write.mode(
        "append"
    ).parquet(inp)
    drain()
    assert len(got["pii"]) == 4
    assert {r["doc_id"] for r in got["pii"][2:]} == {"d3", "d4"}

    def by_id(rows):
        return {r["doc_id"]: tuple(r)[1:] for r in rows}

    batch = spark.read.parquet(inp)
    assert by_id(got["pii"]) == by_id(pii_stats(batch).collect())
    sb = stratified_sample(
        lang_id(batch).select("doc_id", "pred_lang"), "pred_lang", rates,
        0.0, salt="s",
    )
    assert by_id(got["strat"]) == by_id(sb.collect())
    assert len(got["strat"]) >= n_strat_1
    cb = contamination_stats(batch, bench, k=5)
    assert by_id(got["cont"]) == by_id(cb.collect())
    # the planted benchmark 5-gram is detected through the stream path
    cont = by_id(got["cont"])["d3"]
    assert cont[1] >= 1 and cont[2] > 0


def test_streaming_catalog_maintenance_exact(spark, tmp_path):
    """Continuous exact-dedup catalog maintenance: per-batch survivors
    + one committed snapshot per micro-batch; cross-run restart from
    the checkpoint continues the slot sequence; the union of per-batch
    survivors equals the batch-path dedup of the union corpus."""
    from textalyzer_spark.operators import incremental as inc
    from textalyzer_spark.streaming.jobs import streaming_catalog_maintenance

    inp = str(tmp_path / "in")
    cat = str(tmp_path / "cat")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    # batch 0: docs 1,2 + intra-batch duplicate 3
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id bigint, text string",
    ).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(spark, inp, cat, out, ckpt)
    assert inc.latest_catalog_snapshot(spark, cat) == 1
    b0 = {r["doc_id"] for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert b0 == {1, 2}

    # batch 1 (same checkpoint): dup-of-1 (10) + new doc (11)
    spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text")],
        "doc_id bigint, text string",
    ).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(spark, inp, cat, out, ckpt)
    assert inc.latest_catalog_snapshot(spark, cat) == 2
    b1 = {r["doc_id"] for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert b1 == {11}
    assert spark.read.parquet(f"{cat}/snapshot=2").count() == 3

    # slot-bounded replay: recomputing batch 1 against the catalog
    # "as of before its slot" (snapshot 1, NOT the already-committed
    # snapshot 2) re-derives the same survivors — crash idempotency
    prev = inc.latest_catalog_snapshot(spark, cat, max_snapshot=1)
    assert prev == 1
    replay = inc.incremental_exact_dedup(
        spark.createDataFrame(
            [(10, "alpha text"), (11, "gamma text")],
            "doc_id bigint, text string",
        ),
        spark.read.parquet(f"{cat}/snapshot={prev}"),
    )
    assert {r["doc_id"] for r in replay.collect()} == b1


def test_streaming_catalog_maintenance_minhash(spark, tmp_path):
    """Minhash signature-catalog maintenance: batch-2 near-dups of
    batch-1 docs surface as cross-snapshot pairs; every ingested doc's
    signature lands in the catalog (NULL for shingle-less)."""
    from textalyzer_spark.operators import incremental as inc
    from textalyzer_spark.streaming.jobs import streaming_catalog_maintenance

    inp = str(tmp_path / "in")
    cat = str(tmp_path / "cat")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    base = "the quick brown fox jumps over the lazy dog again and again"
    spark.createDataFrame(
        [(1, base), (2, "completely different words about other topics here")],
        "doc_id bigint, text string",
    ).write.mode("append").parquet(inp)
    kw = dict(k=3, num_hashes=16, bands=8, threshold=0.3, seed=7)
    streaming_catalog_maintenance(
        spark, inp, cat, out, ckpt, method="minhash", **kw
    )
    assert spark.read.parquet(f"{out}/batch=0").count() == 0  # empty catalog
    assert spark.read.parquet(f"{cat}/snapshot=1").count() == 2

    spark.createDataFrame(
        [(10, base + " extra"), (11, ""), (12, "unrelated fresh content")],
        "doc_id bigint, text string",
    ).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(
        spark, inp, cat, out, ckpt, method="minhash", **kw
    )
    pairs = spark.read.parquet(f"{out}/batch=1").collect()
    assert {(r["doc_old"], r["doc_new"]) for r in pairs} == {(1, 10)}
    snap2 = spark.read.parquet(f"{cat}/snapshot=2")
    assert snap2.count() == 5  # every ingested doc, incl. shingle-less 11
    assert snap2.filter("signature IS NULL").count() == 1


def test_streaming_sketch_maintenance_hll_and_cms(spark, tmp_path):
    """Sketch-catalog maintenance: one committed register snapshot per
    micro-batch; after two batches the catalog equals the union
    corpus's sketch EXACTLY (register-wise MAX / element-wise SUM
    mergeability through the stream path), and the per-batch output
    carries the running estimate."""
    from textalyzer_spark.functions.alphabet import WS_SPLIT
    from textalyzer_spark.operators import incremental as inc
    from textalyzer_spark.operators import sketch as sk
    from textalyzer_spark.streaming.jobs import streaming_sketch_maintenance

    b0 = [(1, "alpha beta gamma alpha"), (2, "delta beta")]
    b1 = [(10, "alpha epsilon zeta"), (11, "")]

    def toks(rows):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return df.select(
            F.explode(
                F.filter(F.split(F.col("text"), WS_SPLIT), lambda t: t != "")
            ).alias("tok")
        )

    for kind, params in (("hll", dict(p=8)), ("cms", dict(depth=3, width_p=8))):
        inp = str(tmp_path / f"{kind}_in")
        cat = str(tmp_path / f"{kind}_cat")
        out = str(tmp_path / f"{kind}_out")
        ckpt = str(tmp_path / f"{kind}_ck")
        spark.createDataFrame(b0, "doc_id bigint, text string").write.mode(
            "append"
        ).parquet(inp)
        streaming_sketch_maintenance(
            spark, inp, cat, out, ckpt, kind=kind, **params
        )
        assert inc.latest_catalog_snapshot(spark, cat) == 1
        spark.createDataFrame(b1, "doc_id bigint, text string").write.mode(
            "append"
        ).parquet(inp)
        streaming_sketch_maintenance(
            spark, inp, cat, out, ckpt, kind=kind, **params
        )
        assert inc.latest_catalog_snapshot(spark, cat) == 2

        union_toks = toks(b0 + b1)
        got = {
            tuple(r)
            for r in spark.read.parquet(f"{cat}/snapshot=2").collect()
        }
        if kind == "hll":
            want = {
                (r["bucket"], r["rho"])
                for r in sk.hll_registers(union_toks, "tok", **params).collect()
            }
            est = spark.read.parquet(f"{out}/batch=1").collect()[0]
            want_est = sk.hll_estimate(
                sk.hll_registers(union_toks, "tok", **params), **params
            ).collect()[0]
            assert tuple(est) == tuple(want_est)
        else:
            want = {
                (r["r"], r["bucket"], r["cnt"])
                for r in sk.cms_table(union_toks, "tok", **params).collect()
            }
            mass = spark.read.parquet(f"{out}/batch=1").collect()[0]
            # 6 tokens in b0 + 3 in b1 (the empty doc adds none), x depth
            assert mass["total_cnt"] == 9 * params["depth"]
        assert got == want


def test_streaming_catalog_maintenance_bloom(spark, tmp_path):
    """Bloom-mode catalog maintenance: the approximate twin of the
    exact mode — identical survivors on an unsaturated filter, but
    the committed catalog is the merged bit table (bounded rows),
    never one fingerprint row per ingested doc."""
    from textalyzer_spark.operators import incremental as inc
    from textalyzer_spark.operators import sketch as sk
    from textalyzer_spark.streaming.jobs import streaming_catalog_maintenance

    inp = str(tmp_path / "in")
    cat = str(tmp_path / "cat")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id bigint, text string",
    ).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(spark, inp, cat, out, ckpt, method="bloom")
    b0 = {r["doc_id"] for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert b0 == {1, 2}  # intra-batch dup 3 grouped away

    spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text")],
        "doc_id bigint, text string",
    ).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(spark, inp, cat, out, ckpt, method="bloom")
    b1 = {r["doc_id"] for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert b1 == {11}  # 10 is a seen duplicate - bloom can never keep it

    # the committed state is the union BIT TABLE, not per-doc rows
    snap2 = spark.read.parquet(f"{cat}/snapshot=2")
    assert snap2.columns == ["bit"]
    fps = [
        r["fingerprint"]
        for r in spark.read.parquet(inp)
        .select(F.md5("text").alias("fingerprint"))
        .distinct()
        .collect()
    ]
    want_bits = {
        r["bit"]
        for r in sk.bloom_bits(
            spark.createDataFrame([(f,) for f in fps], "fingerprint string"),
            "fingerprint",
        ).collect()
    }
    assert {r["bit"] for r in snap2.collect()} == want_bits
    assert inc.latest_catalog_snapshot(spark, cat) == 2


def test_streaming_catalog_maintenance_span(spark, tmp_path):
    """Span-mode catalog maintenance: batch docs are REBUILT against
    the prior snapshots' first-occurrence span-hash catalog (C4-style
    boilerplate stripping); checkpoint restart continues the slot
    sequence; each batch's output equals the incremental batch path
    against the slot-bounded prior catalog (crash idempotency); with
    monotone ids the two batches together equal one-shot span_dedup
    over the union corpus."""
    from textalyzer_spark.operators import incremental as inc
    from textalyzer_spark.operators import span_dedup as sd
    from textalyzer_spark.streaming.jobs import streaming_catalog_maintenance

    inp = str(tmp_path / "in")
    cat = str(tmp_path / "cat")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    footer = "accept cookies\nprivacy policy\nall rights reserved"
    rows0 = [(1, "alpha one\nbeta two\n" + footer), (2, "gamma\n" + footer)]
    rows1 = [(10, footer + "\ndelta four"), (11, "unique\nlines\nonly here")]
    schema = "doc_id bigint, text string"

    spark.createDataFrame(rows0, schema).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(spark, inp, cat, out, ckpt, method="span")
    assert inc.latest_catalog_snapshot(spark, cat) == 1
    b0 = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    }
    # batch-0 footer survives once (doc 1's occurrence is first)
    assert b0[1] == ("alpha one\nbeta two\n" + footer, 5, 0)
    assert b0[2] == ("gamma", 1, 3)

    spark.createDataFrame(rows1, schema).write.mode("append").parquet(inp)
    streaming_catalog_maintenance(spark, inp, cat, out, ckpt, method="span")
    assert inc.latest_catalog_snapshot(spark, cat) == 2
    b1 = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in spark.read.parquet(f"{out}/batch=1").collect()
    }
    assert b1[10] == ("delta four", 1, 3)  # cataloged footer stripped
    assert b1[11] == ("unique\nlines\nonly here", 3, 0)

    # slot-bounded replay: batch 1 against snapshot 1 (NOT the
    # already-committed snapshot 2) re-derives the same output
    replay = sd.incremental_span_dedup(
        spark.createDataFrame(rows1, schema),
        spark.read.parquet(f"{cat}/snapshot=1"),
        n=3,
    )
    assert {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in replay.collect()
    } == b1

    # monotone-id batch-equivalence: streamed outputs == one-shot
    # span_dedup over the union corpus
    union = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in sd.span_dedup(
            spark.createDataFrame(rows0 + rows1, schema), n=3
        ).collect()
    }
    assert {**b0, **b1} == union


def test_streaming_sketch_maintenance_hist(spark, tmp_path):
    """Histogram-kind sketch maintenance: after two batches the
    committed catalog equals the union corpus's length histogram and
    the per-batch output is the running quantile report."""
    from textalyzer_spark.operators import sketch as sk
    from textalyzer_spark.streaming.jobs import streaming_sketch_maintenance

    b0 = [(1, "x" * 10), (2, "y" * 200)]
    b1 = [(10, "z" * 90), (11, "w" * 900)]
    inp = str(tmp_path / "in")
    cat = str(tmp_path / "cat")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    for batch in (b0, b1):
        spark.createDataFrame(batch, "doc_id bigint, text string").write.mode(
            "append"
        ).parquet(inp)
        streaming_sketch_maintenance(
            spark, inp, cat, out, ckpt, kind="hist", hist_width=64
        )
    union = spark.createDataFrame(b0 + b1, "doc_id bigint, text string")
    want_hist = {
        (r["bucket"], r["cnt"])
        for r in sk.value_histogram(
            union.selectExpr("length(text) AS _len"), "_len", bucket_width=64
        ).collect()
    }
    got_hist = {
        tuple(r) for r in spark.read.parquet(f"{cat}/snapshot=2").collect()
    }
    assert got_hist == want_hist
    report = {
        r["q"]: (r["value_lo"], r["value_hi"])
        for r in spark.read.parquet(f"{out}/batch=1").collect()
    }
    # lengths 10, 90, 200, 900 -> exact quantile values bracketed
    for q, v in ((0.0, 10), (0.25, 10), (0.5, 90), (0.75, 200), (1.0, 900)):
        lo, hi = report[q]
        assert lo <= v <= hi, (q, v, lo, hi)


def test_streaming_sketch_maintenance_drift(spark, tmp_path):
    """Drift-kind sketch maintenance: batch 0 has no prior (NULL
    tv_distance, n_a=0); batch 1's alarm row equals the batch-path
    histogram_drift(hist(batch0), hist(batch1)); the committed
    snapshot is still the union histogram."""
    from textalyzer_spark.operators import sketch as sk
    from textalyzer_spark.streaming.jobs import streaming_sketch_maintenance

    b0 = [(1, "x" * 10), (2, "y" * 20), (3, "q" * 30)]
    b1 = [(10, "z" * 500), (11, "w" * 900)]  # shifted distribution
    inp = str(tmp_path / "in")
    cat = str(tmp_path / "cat")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    for batch in (b0, b1):
        spark.createDataFrame(batch, "doc_id bigint, text string").write.mode(
            "append"
        ).parquet(inp)
        streaming_sketch_maintenance(
            spark, inp, cat, out, ckpt, kind="drift", hist_width=64
        )
    r0 = spark.read.parquet(f"{out}/batch=0").collect()[0]
    assert (r0["n_a"], r0["n_b"]) == (0, 3) and r0["tv_distance"] is None
    r1 = spark.read.parquet(f"{out}/batch=1").collect()[0]

    def hist(rows):
        return sk.value_histogram(
            spark.createDataFrame(rows, "doc_id bigint, text string")
            .selectExpr("length(text) AS _len"),
            "_len",
            bucket_width=64,
        )

    want = sk.histogram_drift(hist(b0), hist(b1)).collect()[0]
    assert tuple(r1) == tuple(want)
    assert r1["tv_distance"] == 1.0  # disjoint length supports
    union_hist = {
        tuple(r)
        for r in sk.histogram_merge(hist(b0), hist(b1)).collect()
    }
    got = {tuple(r) for r in spark.read.parquet(f"{cat}/snapshot=2").collect()}
    assert got == union_hist
