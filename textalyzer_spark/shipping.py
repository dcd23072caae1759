"""Ship this package to Spark python workers.

Functions referenced by pandas UDFs / applyInPandas are cloudpickled
*by reference* to their defining module, so every python worker must
be able to ``import textalyzer_spark``. On a real cluster that is
``spark-submit --py-files textalyzer_spark.zip`` (BASELINE.json
north_star launch mode); for sessions we don't control (the driver
harness creates its own), we lazily addPyFile a zip of ourselves.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Idempotently make ``textalyzer_spark`` importable on workers."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"textalyzer_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_dir):
                for fn in filenames:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
