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


def run_once(cores: int, sf_dir: str, multiplier: int) -> dict:
    from textalyzer_spark.corpus import nested_from_flat
    from textalyzer_spark.operators.spans import process_spans
    from textalyzer_spark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # repartition BEFORE the multiplier explode: the source is one
    # small parquet file (one scan partition), so exploding first
    # would fan out 5M rows inside a single task — a serial stage that
    # dominates and fakes bad scaling
    docs = docs.repartition(cores * 4)
    if multiplier > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(1), F.lit(multiplier)))
        ).select(
            F.concat_ws("_", F.col("doc_id").cast("string"), F.col("rep")).alias(
                "doc_id"
            ),
            "text",
        )
    n_docs = docs.count()

    # warmup: run the FULL job once so every python worker (one per
    # core) pays its interpreter+import spin-up outside the timing —
    # a limit(1) warmup warms a single worker and the timed run then
    # measures worker cold-start instead of throughput
    job = process_spans(nested_from_flat(docs))
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
    r8 = run_once(8, sf_dir, multiplier)
    r32 = run_once(32, sf_dir, multiplier)
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
