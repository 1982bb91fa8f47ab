"""The verification driver owns its SparkSession and may run from ANY
cwd, finding this package only through a driver-side ``sys.path``
insert. Executor Python workers inherit neither the cwd nor that
insert, so any stage whose function cloudpickle serializes BY
REFERENCE (module-level FSMs/UDFs) dies with ModuleNotFoundError
unless ``session.ship_package`` has shipped the package zip via
``addPyFile``. This test reproduces that harness shape in a
subprocess: cwd=/tmp, no PYTHONPATH, sys.path insert only.
"""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import REPO_ROOT

_DRIVER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
qs = e.queries()
# module-level pandas-UDF path (operators/multimodal.py)
n1 = qs["multimodal_features"](spark, "/root/testdata/sf0.001").count()
# module-level applyInPandasWithState FSM (streaming/sessions.py)
n2 = qs["stream_error_runs"](spark, "/root/testdata/sf0.001").count()
print("HOSTILE_OK", n1, n2)
"""


def test_worker_imports_under_foreign_cwd_session():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT.format(repo=REPO_ROOT)],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ok_line = [l for l in proc.stdout.splitlines() if l.startswith("HOSTILE_OK")]
    assert ok_line, proc.stdout[-2000:]
    _, n1, n2 = ok_line[0].split()
    assert int(n1) > 0 and int(n2) > 0
