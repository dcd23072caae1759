"""Scaling-efficiency evidence (BASELINE.json north_rule): the same
tokenize+metrics job at two parallelism-level PAIRS on identical
input — local[2]→local[8] and local[8]→local[32], each a N→4N step:

    efficiency = (docs_per_sec@4N / docs_per_sec@N) / 4

Every run (engine AND control) is PINNED to its core count via
sched_setaffinity before the JVM/pool spawns — a faithful N-core
executor-node simulation where JVM and python share the node's CPUs
(unpinned local[8] borrows the host's other 24 CPUs for JVM work and
overstates the N baseline).

Two pairs because this sandbox's virtualized host does not deliver
linear CPU past ~8-16 processes: a pure-python multiprocessing
control (no Spark, no IPC — just regex tokenization) is measured
alongside and scales ~3.9x from 2→8 procs but only ~2.9x from 8→32.
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


def _pin(n_cpus: int):
    """Pin this process (and every child it spawns: the JVM, python
    workers, pool procs) to CPUs 0..n_cpus-1 — a faithful N-core
    executor-node simulation. Without pinning, a local[8] run lets 8
    JVM threads + 8 python workers spread over all 32 host CPUs,
    overstating the N baseline (BENCH.md pinning note). Returns the
    previous affinity for restore."""
    prev = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(n_cpus)))
    return prev


def run_in_subprocess(
    cores: int, nested_path: str, reps_n: int = 3, variant: str = "arrow"
) -> dict:
    """Each engine measurement runs in a FRESH python process: py4j
    launches one JVM per process and REUSES it across SparkSessions,
    so an in-process sequence of run_once(2), run_once(8), ... would
    pin the shared JVM to the first run's 2 CPUs forever (measured:
    the 32-core 'run' was slower than the 2-core one)."""
    import subprocess

    out = subprocess.run(
        [
            sys.executable,
            os.path.abspath(__file__),
            "_single",
            str(cores),
            nested_path,
            str(reps_n),
            variant,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_once(
    cores: int, nested_path: str, reps_n: int = 7, variant: str = "arrow"
) -> dict:
    from textalyzer_spark.operators.spans import process_spans, process_spans_arrow
    from textalyzer_spark.session import get_spark

    # Arrow batch 8192 (the session default): small enough that the
    # JVM parquet-decode side and the python tokenizer PIPELINE within
    # each task. The round-1 65536 override serialized them (one batch
    # per task: python idle while the JVM decodes, JVM idle while
    # python tokenizes) and cost ~25% wall at 32 cores.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    prev = _pin(cores)
    try:
        spark = get_spark(
            f"scaling-{cores}", cores=cores, shuffle_partitions=cores
        )
        spark.sparkContext.setLogLevel("ERROR")
        docs = spark.read.parquet(nested_path)
        n_docs = docs.count()

        # 'arrow': the mapInArrow single-pass pipeline — spans stay a
        # pyarrow ListArray end to end (no python dict
        # materialization); fastest python-tokenizer variant (BENCH.md)
        # 'jvm': the all-codegen variant (no python workers at all) —
        # measured as a SECOND control: the scaling ceiling of Spark's
        # own JVM execution on this host
        job = (
            process_spans_arrow(docs)
            if variant == "arrow"
            else process_spans(docs, use_pandas_udf=False)
        )

        # warmup: run the FULL job once so every python worker (one
        # per core) pays its interpreter+import spin-up outside the
        # timing — a limit(1) warmup warms a single worker and the
        # timed run then measures worker cold-start, not throughput
        job.write.format("noop").mode("overwrite").save()

        # median of reps_n: single-run wall times vary several-fold in
        # this sandbox (shared virtualized host + GC phase alignment)
        reps = []
        for _ in range(reps_n):
            t0 = time.perf_counter()
            job.write.format("noop").mode("overwrite").save()
            reps.append(time.perf_counter() - t0)
        elapsed = sorted(reps)[len(reps) // 2]
        spark.stop()
    finally:
        os.sched_setaffinity(0, prev)
    return {
        "cores": cores,
        "n_docs": n_docs,
        "seconds": round(elapsed, 2),
        "reps": [round(r, 2) for r in reps],
        "docs_per_sec": round(n_docs / elapsed, 1),
    }


def _py_control(procs: int) -> float:
    """Pure-python multiprocessing throughput (units/s): what the host
    physically delivers at this process count, no Spark involved.
    Pinned to ``procs`` CPUs like the engine runs (node simulation)."""
    import multiprocessing as mp

    per = 12000
    reps = []
    prev = _pin(procs)
    try:
        with mp.Pool(procs) as p:
            for _ in range(5):
                t0 = time.perf_counter()
                p.map(_CONTROL_WORK, [per] * procs * 4)
                reps.append(time.perf_counter() - t0)
    finally:
        os.sched_setaffinity(0, prev)
    return procs * 4 * per / sorted(reps)[len(reps) // 2]


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
    if len(sys.argv) > 1 and sys.argv[1] == "_single":
        reps_n = int(sys.argv[4]) if len(sys.argv) > 4 else 7
        variant = sys.argv[5] if len(sys.argv) > 5 else "arrow"
        print(json.dumps(run_once(int(sys.argv[2]), sys.argv[3], reps_n, variant)))
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiplier = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    nested_path = prepare_corpus(sf_dir, multiplier)

    # INTERLEAVED rounds: host throughput drifts over minutes on this
    # shared virtualized box, so measuring all of local[8] then all of
    # local[32] confounds the pair with drift. Each round measures
    # every parallelism level back-to-back, and WITHIN a level the
    # engine and the all-JVM codegen control run adjacently (round-5
    # VERDICT: a throttle window must hit both distributions, not just
    # one — round 4 measured a control block that drifted 5s -> 140s
    # while the engine block, minutes earlier, stayed clean). Reps
    # pool across rounds; per-round ratios are reported so a poisoned
    # round is visible instead of silently averaged in.
    levels = (2, 8, 32)
    reps: dict[int, list[float]] = {c: [] for c in levels}
    jvm_reps: dict[int, list[float]] = {c: [] for c in (8, 32)}
    round_reps: list[dict] = []
    n_docs = 0
    for rnd in range(rounds):
        rr: dict = {}
        for c in levels:
            if c == 2:
                if rnd > 0:
                    continue  # ~4 min each and stable ±3%
                r = run_in_subprocess(c, nested_path, reps_n=3)
                reps[c].extend(r["reps"])
                n_docs = r["n_docs"]
                continue
            # engine and control adjacent in the same host window
            r = run_in_subprocess(c, nested_path, reps_n=2)
            reps[c].extend(r["reps"])
            rr[f"eng{c}"] = r["reps"]
            n_docs = r["n_docs"]
            j = run_in_subprocess(c, nested_path, reps_n=2, variant="jvm")
            jvm_reps[c].extend(j["reps"])
            rr[f"jvm{c}"] = j["reps"]
        round_reps.append(rr)

    def stats(rs: list[float]) -> dict:
        rs = sorted(rs)
        med = rs[len(rs) // 2]
        return {
            "median_seconds": round(med, 2),
            "min_seconds": round(rs[0], 2),
            "reps": [round(x, 2) for x in rs],
            "docs_per_sec": round(n_docs / med, 1),
            "docs_per_sec_min": round(n_docs / rs[0], 1),
        }

    engine = {c: {"cores": c, "n_docs": n_docs, **stats(reps[c])} for c in levels}
    jvm = {c: stats(jvm_reps[c]) for c in (8, 32)}
    control = {c: _py_control(c) for c in levels}
    pairs = {}
    for lo, hi in ((2, 8), (8, 32)):
        eng_ratio = engine[hi]["docs_per_sec"] / engine[lo]["docs_per_sec"]
        eng_ratio_min = (
            engine[hi]["docs_per_sec_min"] / engine[lo]["docs_per_sec_min"]
        )
        ctl_ratio = control[hi] / control[lo]
        entry = {
            "engine_speedup": round(eng_ratio, 2),
            "engine_speedup_min_based": round(eng_ratio_min, 2),
            "efficiency": round(eng_ratio / 4.0, 3),
            "host_control_speedup": round(ctl_ratio, 2),
            "relative_efficiency": round(eng_ratio / ctl_ratio, 3),
        }
        if lo in jvm and hi in jvm:
            jvm_ratio = (
                jvm[lo]["median_seconds"] / jvm[hi]["median_seconds"]
            )
            entry["jvm_codegen_speedup"] = round(jvm_ratio, 2)
            # the engine's python/Arrow stage judged against Spark's
            # own all-JVM scaling ceiling on this host
            entry["relative_to_jvm_ceiling"] = round(eng_ratio / jvm_ratio, 3)
            # per-round ceiling ratios from the INTERLEAVED windows:
            # each round's engine and control reps share a host window,
            # so a throttle spike shows up as one outlier round rather
            # than biasing the pooled median invisibly
            per_round = []
            for rr in round_reps:
                need = (f"eng{lo}", f"jvm{lo}", f"eng{hi}", f"jvm{hi}")
                if not all(k in rr for k in need):
                    continue
                med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
                er = med(rr[f"eng{lo}"]) / med(rr[f"eng{hi}"])
                jr = med(rr[f"jvm{lo}"]) / med(rr[f"jvm{hi}"])
                per_round.append(round(er / jr, 3))
            if per_round:
                entry["relative_to_jvm_ceiling_per_round"] = per_round
        pairs[f"{lo}to{hi}"] = entry
    print(
        json.dumps(
            {
                "job": "tokenize+metrics (process_spans_arrow over nested corpus)",
                "sf_dir": sf_dir,
                "multiplier": multiplier,
                "rounds": rounds,
                "engine": engine,
                "jvm_codegen_control": jvm,
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
