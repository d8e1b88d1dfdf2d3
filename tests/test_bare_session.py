"""The driver contract must work under a session built WITHOUT the
engine's confs (the correctness driver constructs its own SparkSession).
A second session in this process would getOrCreate the configured one, so
the bare-session scenario runs in a subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

from .conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[4]')
  .config('spark.ui.enabled', 'false').getOrCreate())  # NO engine confs
import __spark_entry__ as E
assert E.entry(spark).count() > 0
qs = E.queries()
# the three conf-sensitive paths: nanos timestamps, non-ANSI casts, tz
for name in ['f_filter_suite', 'p_scalar_suite', 'fx_asof_rate_fill']:
    n = qs[name](spark, {sf!r})
    assert n.count() >= 0 and n.columns
print('BARE_SESSION_OK')
"""


def test_driver_contract_under_bare_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, sf=SF_SMALL)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "BARE_SESSION_OK" in proc.stdout, proc.stderr[-2000:]
