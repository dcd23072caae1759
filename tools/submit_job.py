"""spark-submit entry point (BASELINE.json north_star launch mode:
``spark-submit --py-files textalyzer_spark.zip tools/submit_job.py``).

Runs the tokenize+metrics pipeline over a nested documents table with
per-partition lineage checkpointing, so a killed submission resumes
where it left off.

    spark-submit --py-files <zip> tools/submit_job.py \
        --input  /path/to/nested_documents_parquet \
        --output /path/to/output_dir \
        [--flat]            # input is flat (doc_id, text): synthesize spans
        [--n-buckets 32] [--batches 4]

Build the zip: ``python -c "from textalyzer_spark.shipping import \
ship_package"`` writes one under /tmp on first session use, or just
``cd /root/repo && zip -r textalyzer_spark.zip textalyzer_spark``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--flat", action="store_true")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--batches", type=int, default=4)
    p.add_argument(
        "--analysis",
        default="tokenize_metrics",
        choices=["tokenize_metrics", "near_dedup", "pii_redact",
                 "exact_dedup", "repetition_stats"],
        help="tokenize_metrics runs the lineage-checkpointed span "
        "pipeline; the others are flat-table batch analyses whose "
        "output lands as parquet under --output",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    # spark-submit owns master/memory/executors; only app-level confs here
    spark = (
        SparkSession.builder.appName(f"textalyzer-{args.analysis}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    from textalyzer_spark.lineage import read_lineage, run_with_lineage
    from textalyzer_spark.operators.spans import process_spans_arrow

    docs = spark.read.parquet(args.input)

    if args.analysis != "tokenize_metrics":
        # flat-table batch analyses (input must be (doc_id, text))
        if args.analysis == "near_dedup":
            from textalyzer_spark.operators.near_dedup import near_dedup

            out = near_dedup(docs, method="minhash")
        elif args.analysis == "pii_redact":
            from textalyzer_spark.operators.pii import redact_pii

            out = redact_pii(docs)
        elif args.analysis == "exact_dedup":
            from textalyzer_spark.operators.dedup import exact_dedup

            out = exact_dedup(docs)
        else:
            from textalyzer_spark.operators.quality import repetition_stats

            out = repetition_stats(docs)
        t0 = time.time()
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(
            json.dumps(
                {
                    "analysis": args.analysis,
                    "rows_written": n,
                    "wall_seconds": round(time.time() - t0, 1),
                }
            )
        )
        spark.stop()
        return
    if args.flat:
        from textalyzer_spark.corpus import nested_from_flat

        docs = nested_from_flat(docs)

    from pyspark.sql import functions as F

    def transform(part):
        # re-derive the bucket on the output (the Arrow stage replaces
        # the input columns, so the lineage bucket must be recomputed
        # from doc_id — same hash, same assignment). mapInArrow variant:
        # spans stay a pyarrow ListArray end to end (BENCH.md — the
        # fused mapInPandas variant materializes every span struct as a
        # python dict in both directions and measured ~2.5x slower)
        processed = process_spans_arrow(part.drop("bucket"))
        return processed.withColumn(
            "bucket",
            F.pmod(
                F.xxhash64(F.col("doc_id").cast("string")), F.lit(args.n_buckets)
            ).cast("int"),
        )

    t0 = time.time()
    result = run_with_lineage(
        docs,
        transform,
        args.output,
        n_buckets=args.n_buckets,
        batches=args.batches,
    )
    n = result.count()
    lineage = read_lineage(spark, args.output)
    print(
        json.dumps(
            {
                "docs_processed": n,
                "buckets": lineage.count(),
                "wall_seconds": round(time.time() - t0, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
