"""Watch-item study (VERDICT r5 task 4): attribute the r4->r5 drift
of ``winnow_pairs`` (2.8 -> 3.6 s) and ``embedding_near_dup_lsh``
(2.6 -> 3.4 s) to host or code, with the scaling-harness discipline
applied to single queries:

* ONE FRESH SUBPROCESS per measurement (py4j pins an in-process sweep
  to the first JVM's cores);
* rounds INTERLEAVE the watched queries with a pure-JVM control
  (``histogram_1984_single_doc`` — unchanged code since r3), so a
  throttled host window shows up as a per-round outlier in the
  control instead of biasing the engine medians;
* per-query warmup inside each subprocess (first rep of a heavy
  python stage is 2-4x on worker cold start), timing the 2nd/3rd rep.

Verdict rule printed at the end: control-normalized medians
(query_median / control_median) compared against the r4 artifact's
ratios — if the normalized ratio matches r4, the drift was host; if
it tracks the raw r5 numbers, it's code.

Usage: python tools/watch_bench.py [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["histogram_1984_single_doc", "winnow_pairs", "embedding_near_dup_lsh"]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.sched_setaffinity(0, set(range(32)))
from textalyzer_spark.session import get_spark
spark = get_spark("watch-bench", cores=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
import bench as benchmod
import __spark_entry__ as m
name, sf_dir = {name!r}, {sf_dir!r}
if name == "histogram_1984_single_doc":
    # the bench's pure-JVM control (unchanged code since r3)
    from textalyzer_spark.operators.frequency import word_frequency
    with open("/root/reference/examples/1984.txt", encoding="utf-8") as f:
        text_1984 = f.read()
    df_1984 = spark.createDataFrame(
        [("1984", text_1984)], "doc_id string, text string"
    )
    def run_once():
        t0 = time.time(); word_frequency(df_1984).collect()
        return time.time() - t0
else:
    q = m.queries()[name]
    def run_once():
        t0 = time.time(); q(spark, sf_dir).count()
        return time.time() - t0
run_once()            # warmup rep (python worker cold start)
reps = [run_once(), run_once()]
print(json.dumps({{"name": name, "reps": reps}}))
"""


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # resolve the control's real entry: bench.py times analyze via its
    # own helper; probe what exists
    results: dict[str, list[float]] = {q: [] for q in QUERIES}
    per_round = []
    for r in range(rounds):
        row = {}
        for name in QUERIES:
            code = _CHILD.format(repo=repo, name=name, sf_dir=sf_dir)
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=600,
            )
            line = out.stdout.strip().splitlines()[-1]
            reps = json.loads(line)["reps"]
            best = min(reps)
            results[name].append(best)
            row[name] = round(best, 3)
        per_round.append(row)
        print(json.dumps({"round": r, **row}), flush=True)
    med = {q: statistics.median(v) for q, v in results.items()}
    ctrl = med["histogram_1984_single_doc"]
    print(json.dumps({
        "medians": {q: round(v, 3) for q, v in med.items()},
        "control_normalized": {
            q: round(med[q] / ctrl, 2) for q in QUERIES[1:]
        },
        "rounds": per_round,
    }, indent=2))


if __name__ == "__main__":
    main()
