"""Scaling-efficiency evidence (BASELINE.json north_rule): the same
tokenize+metrics job at two parallelism levels — local[8] standing in
for N executors, local[32] for 4N — on identical input.

    efficiency = (docs_per_sec@32 / docs_per_sec@8) / 4

Usage: python tools/scaling_bench.py [sf_dir] [multiplier]

The multiplier replicates each document (with distinct doc_ids) so the
job is long enough to amortize fixed scheduling overhead — replication
changes scale, not per-doc work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def prepare_corpus(sf_dir: str, multiplier: int) -> str:
    """Synthesize the nested corpus ONCE to parquet (not timed): the
    metric is the engine's tokenize+metrics throughput over a real
    nested table, not the test-harness corpus synthesis."""
    import tempfile

    from textalyzer_spark.corpus import nested_from_flat
    from textalyzer_spark.session import get_spark

    out = os.path.join(
        tempfile.gettempdir(),
        f"nested_{os.path.basename(sf_dir.rstrip('/'))}_{multiplier}",
    )
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    spark = get_spark("scaling-prep", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # repartition BEFORE the multiplier explode: the source is one
    # small parquet file (one scan partition), so exploding first
    # would fan out millions of rows inside a single task
    docs = docs.repartition(128)
    if multiplier > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(multiplier)))
        ).select(
            F.concat_ws("_", F.col("doc_id").cast("string"), F.col("rep")).alias(
                "doc_id"
            ),
            "text",
        )
    nested_from_flat(docs).write.mode("overwrite").parquet(out)
    spark.stop()
    return out


def run_once(cores: int, nested_path: str) -> dict:
    from textalyzer_spark.operators.spans import process_spans_fused
    from textalyzer_spark.session import get_spark

    os.environ.setdefault("SPARK_ARROW_BATCH", "65536")
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(nested_path)
    n_docs = docs.count()

    # the fused single-pass mapInPandas pipeline: measured as both the
    # fastest stable variant and the one that scales (the pandas-UDF
    # variant's ArrowEvalPython row queue flatlines with extra cores)
    job = process_spans_fused(docs)

    # warmup: run the FULL job once so every python worker (one per
    # core) pays its interpreter+import spin-up outside the timing —
    # a limit(1) warmup warms a single worker and the timed run then
    # measures worker cold-start instead of throughput
    job.write.format("noop").mode("overwrite").save()

    # median of 3: single-run wall times vary several-fold in this
    # sandbox (shared virtualized host + JVM GC phase alignment)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        job.write.format("noop").mode("overwrite").save()
        reps.append(time.perf_counter() - t0)
    elapsed = sorted(reps)[1]
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "seconds": round(elapsed, 2),
        "reps": [round(r, 2) for r in reps],
        "docs_per_sec": round(n_docs / elapsed, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiplier = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    nested_path = prepare_corpus(sf_dir, multiplier)
    r8 = run_once(8, nested_path)
    r32 = run_once(32, nested_path)
    efficiency = round((r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0, 3)
    print(
        json.dumps(
            {
                "job": "tokenize+metrics (process_spans over nested corpus)",
                "sf_dir": sf_dir,
                "multiplier": multiplier,
                "local8": r8,
                "local32": r32,
                "scaling_efficiency_n_to_4n": efficiency,
                "target": 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
