"""Driver-session compatibility: every queries() entry must run under a
VANILLA SparkSession (no engine confs) and yield a result the driver's
pandas canonicalizer can sort + hash (scalar-typed columns only).

Round-1 postmortem: 18/40 CORRECTNESS rows crashed because the nanos
parquet conf lived only in session.get_spark, and one more because a
query returned an array<long> column. This test replicates the driver's
harness — fresh JVM, plain builder.getOrCreate(), toPandas → sort →
hash — so that failure mode can never ship silently again.

Runs in a subprocess because the pytest session's JVM already has the
engine confs applied; an in-process "vanilla" session would lie.
"""

import json
import os
import subprocess
import sys

SF_DIR = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, sys
sys.path.insert(0, %(repo)r)
import pandas as pd
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-compat")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as entrymod

failures = []

def canon_check(name, df):
    # replica of the driver's canonicalizer: sort cols by name, sort
    # rows by every column, hash the values
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    for col in pdf.columns:
        pd.util.hash_pandas_object(pdf[col], index=False)

for name, fn in sorted(entrymod.queries().items()):
    try:
        canon_check(name, fn(spark, %(sf_dir)r))
    except Exception as e:  # noqa: BLE001 — collect everything
        failures.append("%%s: %%s: %%s" %% (name, type(e).__name__, e))

try:
    edf = entrymod.entry(spark)
    assert edf.count() >= 0 and edf.columns
except Exception as e:  # noqa: BLE001
    failures.append("entry: %%s: %%s" %% (type(e).__name__, e))

print("DRIVER_COMPAT_RESULT=" + json.dumps(failures))
"""


def test_all_queries_run_under_vanilla_session():
    script = _SCRIPT % {"repo": REPO, "sf_dir": SF_DIR}
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=REPO,
    )
    marker = "DRIVER_COMPAT_RESULT="
    lines = [l for l in proc.stdout.splitlines() if l.startswith(marker)]
    assert lines, (
        f"subprocess died before reporting (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )
    failures = json.loads(lines[-1][len(marker):])
    assert not failures, "vanilla-session failures:\n" + "\n".join(failures)
