"""Bench teardown protocol: stopping the SparkContext must never race
the long-lived streaming queries.

Round-9 postmortem (VERDICT r9 item 1): bench.py called
``spark.stop()`` while live TWS queries (streaming/live.py) were still
active; their stream-execution threads died dumping
``RpcEnvStoppedException`` stack traces to stderr AFTER the bench
summary line, pushing it out of the driver's bounded tail capture —
the official BENCH_r09 record came back ``parsed: null``. The fix is
``live.quiesce()`` (joins every stream-execution thread) called before
``spark.stop()`` and before the summary write.

This test replays the failure scenario end-to-end in a FRESH process
(the crash signature is JVM-thread stderr noise at context teardown,
which only a subprocess can observe cleanly): start a session, push a
run through a live TWS shape, quiesce, stop the context, print a
sentinel — then assert the sentinel is the LAST stdout line and no
``Exception in thread`` / ``RpcEnvStoppedException`` text appears
anywhere in the combined output.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from gizmosql_spark.streaming import windows

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys

sys.path.insert(0, {repo!r})
from gizmosql_spark.session import get_spark
from gizmosql_spark.streaming import live

spark = get_spark("quiesce-shutdown-test")
out = live.run_live(spark, "user_stats", {sf_dir!r})
assert out is not None and out.count() > 0, "live path did not engage"
# replay bench.py's teardown: quiesce THEN stop, summary write last
import bench

bench._quiesce(spark)
assert not spark.streams.active, spark.streams.active
spark.stop()
print("QUIESCE_OK")
"""


@pytest.mark.skipif(
    not windows.tws_available(), reason="TWS protobuf runtime missing")
def test_context_stop_after_quiesce_is_silent(sf_smoke):
    script = _SCRIPT.format(repo=REPO, sf_dir=sf_smoke)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    combined = proc.stdout + proc.stderr
    assert proc.returncode == 0, combined[-4000:]
    stdout_lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    # the sentinel (standing in for the bench summary line) must be the
    # final stdout line — nothing may land after it
    assert stdout_lines and stdout_lines[-1] == "QUIESCE_OK", stdout_lines
    # and no streaming thread may die noisily anywhere in the run
    assert "Exception in thread" not in combined, combined[-4000:]
    assert "RpcEnvStoppedException" not in combined, combined[-4000:]
