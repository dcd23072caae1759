"""Scaling-efficiency evidence (BASELINE.json north_rule): the same
tokenize+metrics job at two parallelism-level PAIRS on identical
input — local[2]→local[8] and local[8]→local[32], each a N→4N step:

    efficiency = (docs_per_sec@4N / docs_per_sec@N) / 4

Two pairs because this sandbox's virtualized host does not deliver
linear CPU past ~8-16 processes: a pure-python multiprocessing
control (no Spark, no IPC — just regex tokenization) is measured
alongside and scales ~3.9x from 2→8 procs but only ~2.7x from 8→32.
The engine's efficiency should be judged against that host ceiling;
`relative_efficiency` = engine speedup / control speedup.

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
    from textalyzer_spark.operators.spans import process_spans_arrow
    from textalyzer_spark.session import get_spark

    os.environ.setdefault("SPARK_ARROW_BATCH", "65536")
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(nested_path)
    n_docs = docs.count()

    # the mapInArrow single-pass pipeline: spans stay a pyarrow
    # ListArray end to end (no python dict materialization) — fastest
    # and most stable variant measured (BENCH.md variant study)
    job = process_spans_arrow(docs)

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


def _py_control(procs: int) -> float:
    """Pure-python multiprocessing throughput (units/s): what the host
    physically delivers at this process count, no Spark involved."""
    import multiprocessing as mp

    per = 12000
    reps = []
    with mp.Pool(procs) as p:
        for _ in range(3):
            t0 = time.perf_counter()
            p.map(_CONTROL_WORK, [per] * procs * 4)
            reps.append(time.perf_counter() - t0)
    return procs * 4 * per / sorted(reps)[1]


_CONTROL_RX = None


def _CONTROL_WORK(n: int) -> int:
    import re

    global _CONTROL_RX
    if _CONTROL_RX is None:
        _CONTROL_RX = re.compile(r"[^\W\d_]+")
    s = "the quick brown fox jumps over the lazy dog " * 8
    t = 0
    for _ in range(n):
        t += len([x.lower() for x in _CONTROL_RX.findall(s)])
    return t


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiplier = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    nested_path = prepare_corpus(sf_dir, multiplier)
    engine = {c: run_once(c, nested_path) for c in (2, 8, 32)}
    control = {c: _py_control(c) for c in (2, 8, 32)}
    pairs = {}
    for lo, hi in ((2, 8), (8, 32)):
        eng_ratio = engine[hi]["docs_per_sec"] / engine[lo]["docs_per_sec"]
        ctl_ratio = control[hi] / control[lo]
        pairs[f"{lo}to{hi}"] = {
            "engine_speedup": round(eng_ratio, 2),
            "efficiency": round(eng_ratio / 4.0, 3),
            "host_control_speedup": round(ctl_ratio, 2),
            "relative_efficiency": round(eng_ratio / ctl_ratio, 3),
        }
    print(
        json.dumps(
            {
                "job": "tokenize+metrics (process_spans_arrow over nested corpus)",
                "sf_dir": sf_dir,
                "multiplier": multiplier,
                "engine": engine,
                "host_control_units_per_sec": {
                    str(c): round(v) for c, v in control.items()
                },
                "n_to_4n": pairs,
                "target": 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
