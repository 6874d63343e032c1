"""Cross-process safety of the derived fixture layouts (scale.py).

Round-7 judging demonstrated the race this pins: two engine processes
on one warehouse both deciding to (re)build `events_bydate`, one
overwriting the parquet files mid-scan of the other. The fix is a
build-once protocol — readers trust only a _SUCCESS marker (or their
own catalog registration), builders serialize on an flock'd sidecar
and re-check after acquiring (operators/scale.py::_build_lock).

Two tiers of pinning:
- a pure-Python mutual-exclusion proof of _build_lock across real
  processes (fast);
- an end-to-end test launching TWO Spark processes against one shared
  warehouse, both driving every derived-layout builder concurrently
  (dpp_join + partition_pruned_agg + manyfile_scan_agg +
  bucketed_join) — both must come back green with correct row counts.
"""

from __future__ import annotations

import multiprocessing
import os
import subprocess
import sys
import textwrap
import time

SF = "/root/testdata/sf0.001"


def _lock_worker(path: str, log: str, idx: int) -> None:
    from gizmosql_spark.operators.scale import _build_lock

    with _build_lock(path):
        # append two lines non-atomically: interleaving would appear
        # if the lock failed to exclude
        with open(log, "a") as f:
            f.write(f"enter {idx}\n")
            f.flush()
            time.sleep(0.2)
            f.write(f"exit {idx}\n")


def test_build_lock_mutual_exclusion(tmp_path):
    path = str(tmp_path / "layout")
    log = str(tmp_path / "log.txt")
    ctx = multiprocessing.get_context("spawn")
    procs = [
        ctx.Process(target=_lock_worker, args=(path, log, i))
        for i in range(3)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    lines = open(log).read().splitlines()
    assert len(lines) == 6
    # critical sections never interleave: every enter is immediately
    # followed by its own exit
    for i in range(0, 6, 2):
        who = lines[i].split()[1]
        assert lines[i] == f"enter {who}"
        assert lines[i + 1] == f"exit {who}"


_CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["SPARK_GRAFT_CPUS"] = "4"
    os.environ["SPARK_GRAFT_PREWARM"] = "0"
    from gizmosql_spark.session import get_spark
    from gizmosql_spark.operators import scale

    sf = {sf!r}
    spark = get_spark("conc-fixture-child")
    # every derived-layout builder, concurrently with the sibling
    # process: date-partitioned events (DPP + pruned agg), the
    # many-file split, and the bucketed orders/customer pair
    n_dpp = scale.dpp_join(spark, sf).count()
    n_pruned = scale.partition_pruned_agg(spark, sf).count()
    n_many = scale.manyfile_scan_agg(spark, sf).count()
    n_bkt = scale.bucketed_join(spark, sf).count()
    assert n_dpp > 0 and n_many > 0 and n_bkt > 0, (
        n_dpp, n_pruned, n_many, n_bkt)
    print("CHILD-OK", n_dpp, n_pruned, n_many, n_bkt)
    """
)


def test_two_processes_shared_warehouse(tmp_path):
    """Two full Spark processes race every derived-layout builder on
    ONE warehouse: with the _SUCCESS-trust + flock protocol both must
    succeed and agree on results (one builds, the other waits and
    re-attaches — never overwriting files a peer may be scanning)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_WAREHOUSE"] = str(tmp_path / "shared-warehouse")
    script = _CHILD.format(sf=SF)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for _ in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout={out}\nstderr={err[-3000:]}"
        assert "CHILD-OK" in out
    # both children computed over the same layouts: row counts agree
    lines = [o.split("CHILD-OK")[1].split() for _, o, _ in outs]
    assert lines[0] == lines[1]
