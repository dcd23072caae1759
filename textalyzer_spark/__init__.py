"""textalyzer_spark — a PySpark-native text-metrics extraction engine.

A from-scratch reimplementation of the query / data-processing
capabilities of ad-si/Textalyzer (reference at /root/reference,
Rust, v0.5.0) as a declarative Spark DataFrame pipeline:

* word-frequency histogram        (reference: textalyzer/src/frequency.rs)
* line-length histogram           (reference: textalyzer/src/line_length.rs)
* single/multi-line duplication   (reference: textalyzer/src/duplication.rs)
* Flesch readability + lexical complexity (north_star extension)
* training-data pipeline ops: dedup (exact/minhash/simhash/jaccard),
  embedding similarity search, language id, quality scoring,
  fingerprinting, multimodal plumbing.

Architecture: everything is expressed against the DataFrame API so
Catalyst handles pushdown / pruning / partial aggregation; Python only
runs inside Arrow-batched pandas UDFs (never per-row) and only where
JVM built-ins cannot express the semantics (Unicode display width,
Rust-parity tokenization).
"""

__version__ = "0.1.0"

from textalyzer_spark.session import get_spark  # noqa: F401
