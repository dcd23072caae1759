"""Decade scale-up study: wall-clock growth of selected gate queries
for 10x documents (sf0.01 -> sf0.1), warm session, median of N reps.

Usage: python tools/decade_bench.py [query ...]   (default: ROUND6)

Discipline (BENCH.md host-control notes): run in a calm window with
NOTHING else on the host; one warm-up rep per (query, sf) before the
timed reps so python workers are hot; medians over 3 reps. Prints a
markdown table ready for BENCH.md plus one JSON line.
"""

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

ROUND6 = [
    "pipeline_clean_sample",
    "pipeline_decontaminated",
    "incremental_near_dup_groups",
    "incremental_simhash_groups",
    "incremental_embedding_groups",
    "incremental_keep_quality",
    "near_dup_groups_simhash",
    "contamination_by_benchmark",
    "span_dedup",
    "mixture_planned_sample",
    "lm_perplexity",
    "lm_perplexity_bigram",
    "pack_sequences",
    "pack_chunks",
    "bm25_topk",
    "dsir_weights",
    "tfidf_topk_terms",
    "collocations_pmi",
    "shard_plan",
    "length_quantiles",
    "semdedup_groups",
]

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
REPS = 3


def main() -> None:
    names = sys.argv[1:] or ROUND6
    import __spark_entry__ as em
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    result: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        result[name] = {}
        for sf in SFS:
            fn(spark, sf).count()  # warm (workers + code paths)
            times = []
            for _ in range(REPS):
                t0 = time.monotonic()
                fn(spark, sf).count()
                times.append(time.monotonic() - t0)
            result[name][sf] = round(statistics.median(times), 3)
            print(f"# {name} {sf}: {result[name][sf]}", file=sys.stderr)

    print("| query | sf0.01 | sf0.1 | wall growth for 10x docs |")
    print("|---|---|---|---|")
    for name in names:
        a, b = result[name][SFS[0]], result[name][SFS[1]]
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.2f}x |")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
