"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point (see SURVEY.md §4):
AQE on (runtime coalescing + skew-join splitting), Arrow enabled for
pandas UDF stages, shuffle partitions sized to the local core count
(on a real cluster: 2-3x total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "textalyzer-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``. On a real cluster these builder
    calls are inert (spark-submit --conf wins); they matter only for
    local runs and tests.
    """
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or (os.cpu_count() or 8)
    # numpy's AVX512 SIMD float64 log diverges from glibc on ~20% of
    # inputs; with AVX512F disabled np.log falls back to a C loop over
    # glibc log — bit-exact AND vectorized (measured 6x the fastest
    # interpreter-side scalar loop). Workers inherit this env (local
    # mode: via the JVM we launch; cluster: spark.executorEnv).
    # operators/sampling.py still PROBES per worker, so a deployment
    # without this env stays correct on a slower exact path.
    os.environ.setdefault("NPY_DISABLE_CPU_FEATURES", "AVX512F")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing: 8192 balances python round-trip overhead
        # against (a) worst-case batch memory on skewed pathologically
        # long documents and (b) JVM<->python PIPELINING — several
        # batches per task let the JVM decode batch n+1 while python
        # processes batch n; a one-batch-per-task setting serializes
        # the two sides and cost ~25% wall at 32 cores (BENCH.md)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_ARROW_BATCH", "8192"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config(
            "spark.executorEnv.NPY_DISABLE_CPU_FEATURES",
            os.environ["NPY_DISABLE_CPU_FEATURES"],
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    from textalyzer_spark.shipping import ship_package

    ship_package(spark)
    return spark
