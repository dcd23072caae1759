"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The authoritative target metric (BASELINE.json) is documents/sec for
tokenize+metrics over the interleaved nested corpus; the JSON also
reports it as ``docs_per_sec_tokenize_metrics``. Scaling-efficiency
evidence (same job at local[8] vs local[32]) is produced by
``tools/scaling_bench.py`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single-measurement wall times on this host swing +-30% (BENCH.md
# host-control study); the recorded number is the median of N_REPS
# fresh executions so per-round BENCH artifacts are comparable
N_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _materialize(df) -> int:
    """Fully execute a plan without driver-side result transfer."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _timed(make_df) -> float:
    """Median wall time of N_REPS full executions of the plan built
    by ``make_df`` (rebuilt per rep — plan construction and driver
    prep are part of the cost a user pays)."""
    reps = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        _materialize(make_df())
        reps.append(time.perf_counter() - t0)
    return round(statistics.median(reps), 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from textalyzer_spark.session import get_spark

    spark = get_spark("textalyzer-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # every registered gate is benched — the list is ENUMERATED from
    # queries() so a new gate can never silently drop out of BENCH
    qs = entrymod.queries()
    bench_queries = list(qs)
    timings: dict[str, float] = {}

    # warm the JVM, parquet footer caches, AND one python worker per
    # core (pandas-UDF stages otherwise pay interpreter spin-up inside
    # the first timed query) — excluded from timings
    from pyspark.sql import functions as FN

    from textalyzer_spark.functions.tokenize import tokens_udf

    qs["word_frequency"](spark, sf_dir).limit(1).collect()
    spark.range(cpus * 4).repartition(cpus).withColumn(
        "t", tokens_udf(FN.lit("warm up text"))
    ).write.format("noop").mode("overwrite").save()

    for name in bench_queries:
        timings[name] = _timed(lambda: qs[name](spark, sf_dir))

    # north metric: tokenize+metrics docs/sec over the nested corpus
    # (mapInArrow single-pass pipeline — see tools/scaling_bench.py
    # and the BENCH.md variant study)
    from pyspark.sql import functions as SF

    from textalyzer_spark.corpus import nested_from_flat
    from textalyzer_spark.operators.spans import process_spans_arrow

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus)
    # replicate x40 so the throughput number measures the pipeline,
    # not fixed job overhead (5k docs finish in ~1s of scheduling)
    mult = 40
    docs = docs.withColumn(
        "rep", SF.explode(SF.sequence(SF.lit(1), SF.lit(mult)))
    ).select(
        SF.concat_ws("_", SF.col("doc_id").cast("string"), SF.col("rep")).alias(
            "doc_id"
        ),
        "text",
    )
    n_docs = docs.count()
    nested = nested_from_flat(docs)
    span_elapsed = _timed(lambda: process_spans_arrow(nested))
    timings["span_tokenize_metrics"] = span_elapsed

    # flagship operator: multi-line duplication over a line-structured
    # corpus synthesized from the flat one (newline every 8 tokens) —
    # exercises the full seed-join/islands/dedent/resolve pipeline
    from textalyzer_spark.operators.duplication import duplicate_blocks

    line_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        FN.regexp_replace(
            FN.col("text"), r"((\S+\s+){7}\S+)\s+", "$1\n"
        ).alias("text"),
    )
    timings["duplicate_blocks"] = _timed(
        lambda: duplicate_blocks(line_docs, min_lines=3)
    )

    # comparable to the reference's headline number (BASELINE.md:
    # `histogram examples/1984.txt`, 40.4 ms single-process Rust):
    # same text, same histogram, measured as a warm Spark job
    corpus_1984 = "/root/reference/examples/1984.txt"
    if os.path.exists(corpus_1984):
        from textalyzer_spark.operators.frequency import word_frequency

        with open(corpus_1984, encoding="utf-8") as f:
            text_1984 = f.read()
        df_1984 = spark.createDataFrame([("1984", text_1984)], "doc_id string, text string")
        word_frequency(df_1984).limit(1).collect()  # warm
        timings["histogram_1984_single_doc"] = _timed(
            lambda: word_frequency(df_1984)
        )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec_tokenize_metrics": round(n_docs / span_elapsed, 1),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
