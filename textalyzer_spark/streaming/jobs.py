"""Structured Streaming jobs over a documents stream.

The reference has no streaming concepts (SURVEY.md §2.9); these wrap
the same batch operators for continuously-landing corpora: new parquet
files appearing under a directory are the stream. Aggregations run in
update/complete mode with checkpointing — the streaming-native
counterpart of the batch lineage/resume in lineage.py.

All transformations reuse the batch operator expressions — a pipeline
verified in batch is the same Catalyst plan under the streaming
microbatcher (Trigger.AvailableNow makes that literal: each test runs
the stream to completion over the current files and stops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textalyzer_spark.functions.tokenize import tokens_col

DOCS_SCHEMA = "doc_id string, text string"


def _stream(spark: SparkSession, input_dir: str, schema: str = DOCS_SCHEMA) -> DataFrame:
    return spark.readStream.schema(schema).parquet(input_dir)


def streaming_word_frequency(spark: SparkSession, input_dir: str) -> DataFrame:
    """Running word-frequency over a document stream (complete-mode
    aggregation; same shape as the batch operator)."""
    docs = _stream(spark, input_dir)
    return (
        docs.select(F.explode(tokens_col("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def streaming_quality_scores(spark: SparkSession, input_dir: str) -> DataFrame:
    """Per-document quality scores, append-mode (stateless projection
    — each document scores once on arrival)."""
    from textalyzer_spark.operators.quality import quality_score

    return quality_score(_stream(spark, input_dir))


def streaming_pii_stats(spark: SparkSession, input_dir: str) -> DataFrame:
    """PII detect/redact audit over a document stream — the pure scan
    projection ``pii_stats`` is stateless, so the streaming twin is
    the batch operator on the stream source verbatim (append mode,
    zero state; VERDICT r5 item 5)."""
    from textalyzer_spark.operators.pii import pii_stats

    return pii_stats(_stream(spark, input_dir))


def streaming_hash_sample(
    spark: SparkSession, input_dir: str, rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic hash sampling of a stream: the keep decision is
    a pure function of (salt, doc_id), so the streaming run keeps
    EXACTLY the rows the batch run over the same files keeps —
    stateless scan filter, append mode."""
    from textalyzer_spark.operators.sampling import hash_sample

    return hash_sample(_stream(spark, input_dir), rate, salt=salt)


def streaming_stratified_sample(
    spark: SparkSession,
    input_dir: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Language-stratified deterministic sampling of a stream: lang_id
    (a per-row projection) buckets each arriving doc, the md5 variate
    decides — both stateless, so the streamed keep set matches the
    batch operator on the same files. Output (doc_id, pred_lang, u),
    the batch gate's columns."""
    from textalyzer_spark.operators.quality import lang_id
    from textalyzer_spark.operators.sampling import stratified_sample

    buckets = lang_id(_stream(spark, input_dir)).select(
        "doc_id", "pred_lang"
    )
    return stratified_sample(
        buckets, "pred_lang", rates, default_rate, salt=salt
    )


def streaming_contamination(
    spark: SparkSession,
    input_dir: str,
    benchmark: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Benchmark-contamination stats over a stream — the broadcast
    side (the benchmark's DISTINCT k-gram set) is collected ONCE at
    plan build (bounded: benchmarks are thousands of docs by
    definition) and shipped in the Arrow-pass closure; each arriving
    document is scored row-locally, so the operator stays stateless
    (no stream-side groupBy, no state store) and emits the SAME
    ``(doc_id, n_kgrams, n_contaminated, contamination_frac)`` rows
    as the batch ``contamination_stats`` on the same files."""
    from collections.abc import Iterator

    import pandas as pd

    from textalyzer_spark.operators.shingles import doc_shingles

    bench = {
        r["shingle"]
        for r in doc_shingles(benchmark, k)
        .select("shingle")
        .distinct()
        .collect()
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from textalyzer_spark.functions.tokenize import tokenize_text

        for pdf in batches:
            ids, n_kg, n_ct, frac = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = tokenize_text(text or "")
                n = max(0, len(toks) - k + 1)
                hits = sum(
                    1
                    for i in range(n)
                    if " ".join(toks[i : i + k]) in bench
                )
                ids.append(doc_id)
                n_kg.append(n)
                n_ct.append(hits)
                frac.append(hits / n if n > 0 else None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_kgrams": n_kg,
                    "n_contaminated": n_ct,
                    "contamination_frac": frac,
                }
            )

    return _stream(spark, input_dir).mapInPandas(
        run,
        "doc_id string, n_kgrams bigint, n_contaminated bigint, "
        "contamination_frac double",
    )


def streaming_first_seen(spark: SparkSession, input_dir: str) -> DataFrame:
    """Custom stateful streaming operator: cross-batch exact dedup.

    Emits each document the FIRST time its content fingerprint is
    seen across the lifetime of the stream; later microbatches
    containing the same fingerprint emit nothing. State (one flag per
    fingerprint) lives in the streaming state store and survives
    restarts via the checkpoint — the streaming twin of the batch
    ``exact_dedup`` operator, built on ``applyInPandasWithState``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    docs = _stream(spark, input_dir)
    keyed = docs.withColumn("fingerprint", F.md5("text"))

    def first_seen(key, pdfs, state):
        if state.exists:
            return  # fingerprint already emitted in an earlier batch
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.sort_values("doc_id").iloc[:1]
        if first is not None:
            state.update((1,))
            yield pd.DataFrame(
                {
                    "doc_id": first["doc_id"].astype(str),
                    "fingerprint": [key[0]],
                }
            )

    return keyed.groupBy("fingerprint").applyInPandasWithState(
        first_seen,
        outputStructType="doc_id string, fingerprint string",
        stateStructType="seen int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_near_dup(
    spark: SparkSession,
    input_dir: str,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.5,
    max_bucket_state: int = 1000,
    eviction: str = "recency",
    output: str = "pairs",
) -> DataFrame:
    """Custom stateful streaming operator: cross-batch NEAR-duplicate
    detection — the streaming twin of ``minhash_lsh_pairs``.

    Each document's MinHash signature is banded exactly like the
    batch operator; the stream is keyed by (band, bucket) and the
    state store holds the signatures previously admitted to that
    bucket. A newly arriving document that collides with a stored one
    at estimated jaccard >= ``min_est_jaccard`` (matching-minhash
    fraction — the standard unbiased estimator; the raw text is NOT
    kept in state) emits ``(doc_id, dup_of, est_jaccard, band)``.
    A pair colliding in several bands emits once per band — aggregate
    downstream with ``groupBy(doc_id, dup_of).max(est_jaccard)`` if a
    unique row is needed.

    ``max_bucket_state`` caps per-bucket state (the streaming form of
    the batch operator's mega-bucket guard) — unbounded state is how
    streaming dedup dies at 10^12 docs. ``eviction`` picks what a
    FULL bucket does with new arrivals:

    * ``"recency"`` (default): the bucket is a recency ring — a new
      signature is admitted and the OLDEST is evicted, so a
      long-running stream keeps detecting duplicates of recent
      documents forever (first-come-forever state goes blind to
      everything after the first ``max_bucket_state`` arrivals —
      round-3 VERDICT stretch item).
    * ``"admit-first"``: round-3 behavior — new arrivals in a full
      bucket still match against the stored signatures but are never
      added; keeps the earliest documents canonical at the price of
      missing dups among later arrivals.

    ``output`` selects the emitted rows — the STATE evolves
    identically either way (cumulative counters ride in the state
    store next to the signatures):

    * ``"pairs"`` (default): the duplicate matches described above;
    * ``"metrics"``: one observability row per active bucket per
      microbatch — ``(band, bucket, n_state, n_seen, n_evicted,
      n_rejected, n_hits)`` (cumulative) — so a long-running stream
      can alert on recall decay: a climbing ``n_evicted`` (recency)
      means the ring is cycling faster than duplicates arrive, and a
      climbing ``n_rejected`` (admit-first) measures exactly how much
      of the stream the bucket has gone blind to. Run it as a second
      query over the same input with its own checkpoint.

    Checkpoint compatibility: round 5 grew the state schema from
    (ids, sigs) to six fields (counters appended). The processor
    tolerates a legacy 2-field state tuple (counters restart at 0),
    but if Spark's state-store schema check itself rejects the old
    checkpoint, discard the checkpoint directory and re-drain — the
    input is replayable by construction (file source).
    """
    if eviction not in ("recency", "admit-first"):
        raise ValueError(f"unknown eviction {eviction!r}")
    if output not in ("pairs", "metrics"):
        raise ValueError(f"unknown output {output!r}: pairs | metrics")
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from textalyzer_spark.operators.dedup import minhash_signatures

    rows = num_hashes // bands
    docs = _stream(spark, input_dir)
    sigs = minhash_signatures(docs, k=k, num_hashes=num_hashes)
    buckets = sigs.select(
        "doc_id",
        "signature",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bnd: F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("signature"), bnd * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ),
                ),
            )
        ).alias("band", "bucket"),
    )

    def proc(key, pdfs, state):
        # Vectorized per microbatch (round-2 nit: the old loop did a
        # per-ROW np.vstack + iterrows — O(n^2) state copies). The
        # sequential semantics are preserved exactly: docs are ordered
        # by doc_id, each matches the prior state PLUS earlier
        # in-batch docs that were ADMITTED (first cap-S of the batch),
        # with argmax ties resolved in admission order (state first).
        if state.exists:
            # tolerate a pre-metrics 2-field checkpoint (ids, sigs):
            # counters default to 0 rather than crashing the restart
            # (ADVICE r5; NOTE Spark's state-schema compat check may
            # still reject the old schema — then the checkpoint must
            # be discarded, see the docstring)
            got = tuple(state.get)
            if len(got) >= 6:
                ids, sigs_flat, n_seen, n_evicted, n_rejected, n_hits = (
                    got[:6]
                )
            else:
                ids, sigs_flat = got[0], got[1]
                n_seen = n_evicted = n_rejected = n_hits = 0
            known_ids = list(ids)
            known = (
                np.asarray(sigs_flat, dtype=np.int64).reshape(
                    len(known_ids), num_hashes
                )
                if known_ids
                else np.empty((0, num_hashes), dtype=np.int64)
            )
        else:
            known_ids, known = [], np.empty((0, num_hashes), dtype=np.int64)
            n_seen = n_evicted = n_rejected = n_hits = 0
        parts = [p for p in pdfs if len(p)]
        out_doc, out_dup, out_est = [], [], []
        if parts:
            pdf = pd.concat(parts, ignore_index=True).sort_values(
                "doc_id", kind="stable"
            )
            batch = np.stack(
                [np.asarray(s, dtype=np.int64) for s in pdf["signature"]]
            )
            ids_b = pdf["doc_id"].tolist()
            n_b, n_s = len(ids_b), len(known_ids)
            n_admit = (
                n_b
                if eviction == "recency"
                else max(0, min(n_b, max_bucket_state - n_s))
            )
            chunk = 128  # bounds the (chunk x candidates x hashes) bools
            j_idx = np.arange(n_b)
            k_idx = np.arange(n_s)
            for c0 in range(0, n_b, chunk):
                sl = batch[c0 : c0 + chunk]
                i_idx = np.arange(c0, c0 + len(sl))
                ests = []
                if n_s:
                    es = (known[None, :, :] == sl[:, None, :]).mean(axis=2)
                    if eviction == "recency":
                        # doc i has admitted i in-batch predecessors,
                        # ring-evicting the oldest state entries first:
                        # state slot k survives iff k >= n_s+i-cap
                        alive = k_idx[None, :] >= (
                            n_s + i_idx[:, None] - max_bucket_state
                        )
                        es = np.where(alive, es, -1.0)
                    ests.append(es)
                # in-batch: j visible to i iff j < i AND j admitted
                # AND (recency) j not yet ring-evicted: n_s+j >= n_s+i-cap
                eb = (batch[None, :, :] == sl[:, None, :]).mean(axis=2)
                vis = (j_idx[None, :] < i_idx[:, None]) & (
                    j_idx[None, :] < n_admit
                )
                if eviction == "recency":
                    vis &= j_idx[None, :] >= (i_idx[:, None] - max_bucket_state)
                ests.append(np.where(vis, eb, -1.0))
                allest = np.concatenate(ests, axis=1)
                best = allest.argmax(axis=1)
                bestv = allest[np.arange(len(sl)), best]
                for r in np.nonzero(bestv >= min_est_jaccard)[0]:
                    b = int(best[r])
                    out_doc.append(ids_b[c0 + r])
                    out_dup.append(
                        known_ids[b] if b < n_s else ids_b[b - n_s]
                    )
                    out_est.append(round(float(bestv[r]), 4))
            if n_admit:
                known_ids.extend(ids_b[:n_admit])
                known = np.vstack([known, batch[:n_admit]])
                if eviction == "recency" and len(known_ids) > max_bucket_state:
                    n_evicted += len(known_ids) - max_bucket_state
                    known_ids = known_ids[-max_bucket_state:]
                    known = known[-max_bucket_state:]
            n_seen += n_b
            n_rejected += n_b - n_admit
            n_hits += len(out_doc)
        state.update(
            (
                known_ids,
                [int(x) for x in known.ravel()],
                int(n_seen),
                int(n_evicted),
                int(n_rejected),
                int(n_hits),
            )
        )
        if output == "metrics":
            yield pd.DataFrame(
                {
                    "band": [int(key[0])],
                    "bucket": [key[1]],
                    "n_state": [len(known_ids)],
                    "n_seen": [int(n_seen)],
                    "n_evicted": [int(n_evicted)],
                    "n_rejected": [int(n_rejected)],
                    "n_hits": [int(n_hits)],
                }
            )
        elif out_doc:
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "dup_of": out_dup,
                    "est_jaccard": out_est,
                    "band": [key[0]] * len(out_doc),
                }
            )

    out_schema = (
        "band int, bucket string, n_state bigint, n_seen bigint, "
        "n_evicted bigint, n_rejected bigint, n_hits bigint"
        if output == "metrics"
        else "doc_id string, dup_of string, est_jaccard double, band int"
    )
    return buckets.groupBy("band", "bucket").applyInPandasWithState(
        proc,
        outputStructType=out_schema,
        stateStructType=(
            "ids array<string>, sigs array<bigint>, n_seen bigint, "
            "n_evicted bigint, n_rejected bigint, n_hits bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_catalog_maintenance(
    spark: SparkSession,
    input_dir: str,
    catalog_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    method: str = "exact",
    schema: str = "doc_id bigint, text string",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_docs: int | None = 1000,
) -> None:
    """Continuous dedup-catalog maintenance: the streaming twin of the
    incremental batch path (operators/incremental.py), one committed
    catalog snapshot per micro-batch.

    Per batch N (foreachBatch): read the catalog as of *before* slot
    N+1 (``latest_catalog_snapshot(max_snapshot=N)``), dedup the batch
    against it, write the batch's output to ``output_dir/batch=N``
    (mode=overwrite), and commit the union catalog to
    ``catalog_dir/snapshot=N+1``. Because the prior-catalog read is
    slot-bounded and both writes are deterministic overwrites of
    batch-addressed paths, a crash-replayed micro-batch re-derives
    byte-identical output even when its own catalog commit already
    landed — exactly-once semantics without a transactional sink.
    Micro-batch ids are monotone across restarts from one checkpoint,
    so snapshot ids never collide.

    ``method='exact'``: output = batch survivors ``(doc_id,
    fingerprint)``; catalog = fingerprints. ``method='minhash'``:
    output = cross-snapshot near-dup pairs ``(doc_old, doc_new,
    est_jaccard)``; catalog = signatures of EVERY ingested doc
    (NULL for shingle-less — the band join filters them, the pinned
    component-catalog rule). ``method='bloom'``: the approximate
    twin of 'exact' — output = batch survivors whose fingerprint is
    not Bloom-contained in the prior snapshots (sketch.bloom_dedup_new
    semantics: never keeps a seen duplicate, bounded novel-doc
    drops); catalog = the merged <= 2^16-row bit table instead of
    one fingerprint row per ingested doc, the O(bits)-state shape a
    10^12-doc stream needs. ``method='span'``: C4-style span dedup one
    level below 'exact' — output = the batch's docs REBUILT with every
    line of a previously-seen (or batch-duplicated non-first) ``k``-line
    span removed (``incremental_span_dedup``, span length = this
    function's ``k`` arg); catalog = the first-occurrence span-hash
    table ``(h, keep_id, keep_start)``, appended via anti-join so
    prior occurrences always stay first."""
    from textalyzer_spark.operators import incremental as inc

    if method not in ("exact", "minhash", "bloom", "span"):
        raise ValueError(f"unknown method {method!r}")
    stream = _stream(spark, input_dir, schema=schema)

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        slot = int(batch_id) + 1
        prev = inc.latest_catalog_snapshot(
            sp, catalog_dir, max_snapshot=slot - 1
        )
        if method == "exact":
            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame(
                    [], "fingerprint string, keep_id bigint"
                )
            )
            # output + catalog are two ACTIONS over the survivors —
            # the derived-corpus barrier rule (BENCH.md A/B)
            out = inc.incremental_exact_dedup(batch_df, cat).localCheckpoint()
            new_cat = inc.updated_exact_catalog(cat, out)
        elif method == "span":
            from textalyzer_spark.operators import span_dedup as sd

            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame(
                    [], "h string, keep_id bigint, keep_start int"
                )
            )
            # rebuilt docs + catalog are two ACTIONS over the batch's
            # spans — derive the span table ONCE and materialize it so
            # both consumers share the line-explode + lead window +
            # md5 pass (ADVICE r7: the previous shape re-derived the
            # batch's spans inside updated_span_catalog)
            spans = sd._lines_and_spans(batch_df, k, "doc_id", "text")[
                1
            ].localCheckpoint()
            out = sd.incremental_span_dedup(
                batch_df, cat, n=k, spans=spans
            ).localCheckpoint()
            new_cat = sd.updated_span_catalog(cat, batch_df, n=k, spans=spans)
        elif method == "bloom":
            from textalyzer_spark.operators import sketch as sk

            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame([], "bit int")
            )
            # survivors vs the PRIOR bits, then fold the batch's own
            # fingerprints in — two actions over the batch bits
            out = sk.bloom_dedup_new(batch_df, cat).localCheckpoint()
            new_cat = sk.bloom_merge(
                cat,
                sk.bloom_bits(
                    batch_df.select(F.md5("text").alias("fingerprint")),
                    "fingerprint",
                ),
            )
        else:
            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame(
                    [], "doc_id bigint, signature array<bigint>"
                )
            )
            # every ingested doc gets a catalog row — shingle-less docs
            # carry NULL signatures (the pinned component-catalog rule;
            # minhash_catalog itself has no row for them), which the
            # band join filters out
            sigs = (
                batch_df.select("doc_id")
                .join(inc.minhash_catalog(batch_df, k, num_hashes, seed),
                      "doc_id", "left")
                .localCheckpoint()  # one signature build feeds pairs AND catalog
            )
            out = inc._cross_pairs_from_sigs(
                sigs.filter(F.col("signature").isNotNull()),
                cat, num_hashes, bands, threshold, max_bucket_docs,
            )
            new_cat = cat.unionByName(sigs)
        out.write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")
        new_cat.write.mode("overwrite").parquet(
            f"{catalog_dir}/snapshot={slot}"
        )

    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_sketch_maintenance(
    spark: SparkSession,
    input_dir: str,
    catalog_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    kind: str = "hll",
    p: int = 12,
    depth: int = 4,
    width_p: int = 12,
    hist_width: int = 64,
    salt: str = "",
    schema: str = "doc_id bigint, text string",
) -> None:
    """Continuous sketch-catalog maintenance: the streaming twin of
    the mergeable HLL / count-min catalogs (operators/sketch.py), one
    committed register snapshot per micro-batch.

    Per batch N (foreachBatch, the ``streaming_catalog_maintenance``
    slot protocol): read the sketch as of *before* slot N+1, sketch
    the batch's whitespace tokens, MERGE (register-wise MAX for HLL,
    element-wise SUM for count-min), write the batch's summary to
    ``output_dir/batch=N`` and commit the merged registers to
    ``catalog_dir/snapshot=N+1``. Both writes are deterministic
    overwrites of slot-addressed paths, so a crash-replayed
    micro-batch re-derives byte-identical output — exactly-once
    without a transactional sink.

    This is THE streaming shape for corpus-wide statistics at 10^12
    docs: per-batch state is O(sketch size) (4096 registers / 16384
    counters / range-over-width histogram rows), never a token
    dictionary — a running ``count(distinct)`` or full word-frequency
    in complete mode would hold the unbounded vocabulary in the state
    store. Output per batch: HLL -> the running distinct estimate
    row; CMS -> the running ``(n_counters, total_cnt)`` mass row
    (point lookups read the committed snapshot via
    ``sketch.cms_lookup``); ``kind='hist'`` -> the running
    length-quantile report (``sketch.histogram_quantiles`` over the
    merged width-``hist_width`` histogram of ``length(text)``);
    ``kind='drift'`` -> the per-batch DRIFT ALARM: the
    total-variation distance (``sketch.histogram_drift``) between the
    catalog-so-far's length distribution and THIS batch's — the row a
    pipeline pages on when a crawl's content shifts (first batch has
    no prior: NULL tv_distance), with the merged histogram committed
    as the next snapshot exactly like 'hist'."""
    from textalyzer_spark.functions.alphabet import WS_SPLIT
    from textalyzer_spark.operators import incremental as inc
    from textalyzer_spark.operators import sketch as sk

    if kind not in ("hll", "cms", "hist", "drift"):
        raise ValueError(f"unknown sketch kind {kind!r}")
    stream = _stream(spark, input_dir, schema=schema)

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        slot = int(batch_id) + 1
        prev = inc.latest_catalog_snapshot(
            sp, catalog_dir, max_snapshot=slot - 1
        )
        toks = batch_df.select(
            F.explode(
                F.filter(F.split(F.col("text"), WS_SPLIT), lambda t: t != "")
            ).alias("tok")
        )
        if kind == "hll":
            batch_sk = sk.hll_registers(toks, "tok", p=p, salt=salt)
            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame([], "bucket int, rho int")
            )
            # estimate + snapshot are two ACTIONS over the merged
            # registers — the derived-corpus barrier rule (BENCH.md)
            merged = sk.hll_merge(cat, batch_sk).localCheckpoint()
            out = sk.hll_estimate(merged, p=p)
        elif kind == "hist":
            batch_sk = sk.value_histogram(
                batch_df.select(F.length("text").alias("_len")),
                "_len",
                bucket_width=hist_width,
            )
            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame([], "bucket bigint, cnt bigint")
            )
            merged = sk.histogram_merge(cat, batch_sk).localCheckpoint()
            out = sk.histogram_quantiles(merged, bucket_width=hist_width)
        elif kind == "drift":
            # drift report + snapshot merge are two ACTIONS over the
            # batch histogram — the derived-corpus barrier rule
            batch_sk = sk.value_histogram(
                batch_df.select(F.length("text").alias("_len")),
                "_len",
                bucket_width=hist_width,
            ).localCheckpoint()
            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame([], "bucket bigint, cnt bigint")
            )
            out = sk.histogram_drift(cat, batch_sk)
            merged = sk.histogram_merge(cat, batch_sk)
        else:
            batch_sk = sk.cms_table(
                toks, "tok", depth=depth, width_p=width_p, salt=salt
            )
            cat = (
                sp.read.parquet(f"{catalog_dir}/snapshot={prev}")
                if prev
                else sp.createDataFrame([], "r int, bucket int, cnt bigint")
            )
            merged = sk.cms_merge(cat, batch_sk).localCheckpoint()
            out = merged.agg(
                F.count(F.lit(1)).alias("n_counters"),
                F.coalesce(
                    F.sum("cnt"), F.lit(0).cast("bigint")
                ).alias("total_cnt"),
            )
        out.write.mode("overwrite").parquet(f"{output_dir}/batch={batch_id}")
        merged.write.mode("overwrite").parquet(
            f"{catalog_dir}/snapshot={slot}"
        )

    q = (
        stream.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_completion_foreach(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "update",
) -> list:
    """Drain all currently-available input via foreachBatch (unlike
    the memory sink, foreachBatch supports restarting from an existing
    checkpoint — required for stateful operators across runs)."""
    collected: list = []

    def fb(batch_df, _batch_id):
        collected.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(fb)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


_SINK_SEQ = [0]


def run_to_completion(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> list:
    """Drain all currently-available input (Trigger.AvailableNow) into
    an in-memory sink and return the rows emitted by THIS run (the
    sink name is unique per call so successive runs don't mix)."""
    _SINK_SEQ[0] += 1
    name = f"snk_{abs(hash(checkpoint_dir)) % 10**8}_{_SINK_SEQ[0]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()


def streaming_lm_score(
    spark: SparkSession,
    input_dir: str,
    model_map: dict[str, int],
    oov_ll_micro: int,
    max_avg_nll: float = 5.0,
) -> DataFrame:
    """LM perplexity scoring of a document stream against a FROZEN
    model (trained in batch with ``lm.train_unigram_lm``, collected
    via ``lm.model_as_map`` — the persist-then-apply split of the BPE
    merge table). Scoring is a pure per-row projection
    (``score_perplexity_stateless``), so the stream runs append-mode
    with no state store; output matches the batch scorer bit-for-bit
    on the same files."""
    from textalyzer_spark.operators.lm import score_perplexity_stateless

    return score_perplexity_stateless(
        _stream(spark, input_dir), model_map, oov_ll_micro, max_avg_nll=max_avg_nll
    )


def streaming_dsir_score(
    spark: SparkSession,
    input_dir: str,
    lam_map: dict[int, int],
    lam_unseen_micro: int,
    n_buckets: int = 4096,
    min_weight_micro: int = 0,
) -> DataFrame:
    """DSIR importance scoring of a document stream against a FROZEN
    bucket model (fit in batch with ``selection.dsir_model``,
    collected via ``selection.lam_as_map`` — the persist-then-apply
    split of the LM/BPE twins). Pure per-row projection
    (``dsir_score_stateless``): append-mode, no state store; matches
    the batch scorer bit-for-bit on the training corpus, and buckets
    the training corpus never produced score the model's
    ``lam_unseen_micro``."""
    from textalyzer_spark.operators.selection import dsir_score_stateless

    return dsir_score_stateless(
        _stream(spark, input_dir),
        lam_map,
        lam_unseen_micro,
        n_buckets=n_buckets,
        min_weight_micro=min_weight_micro,
    )
