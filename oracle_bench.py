"""DuckDB-oracle benchmark: times every ``oracle_sql()`` query on the
same parquet fixtures bench.py runs the Spark side against.

This produces the same-scale single-node baseline the 2x perf gate in
BASELINE.md compares bench.py's corpus total to (the reference engine
is embedded DuckDB, so DuckDB executing the identical semantics on
identical data IS the reference-at-this-SF stand-in). Writes
``ORACLE_BASELINE_LOCAL.json`` beside this file and prints the JSON
line to stdout.

Usage: ``python oracle_bench.py`` ($SPARK_GRAFT_SF_DIR, default sf0.1).
Each query runs on a fresh in-memory connection (the harness's own
per-query protocol), single-threaded by DuckDB default parallelism on
this machine — i.e. DuckDB gets the full 32 cores, same as Spark.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

#: per-query wall cap + resource fences: a single runaway oracle
#: (quadratic self-join, recursive CTE blowup) must fail its own row,
#: not fill the disk with spill files and stall the whole record
QUERY_TIMEOUT_S = float(os.environ.get("ORACLE_BENCH_TIMEOUT_S", "180"))
MEMORY_LIMIT = os.environ.get("ORACLE_BENCH_MEMORY", "24GB")
TEMP_CAP = os.environ.get("ORACLE_BENCH_TEMP_CAP", "20GiB")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    from gizmosql_spark.testing import duckdb_conn

    oracles = entrymod.oracle_sql()
    timings: dict[str, float | None] = {}
    failed: list[str] = []
    for name in sorted(oracles):
        t0 = time.perf_counter()
        timer = None
        try:
            con = duckdb_conn(sf_dir)
            con.execute(f"SET memory_limit='{MEMORY_LIMIT}'")
            con.execute("SET temp_directory='.tmp'")
            con.execute(f"SET max_temp_directory_size='{TEMP_CAP}'")
            timer = threading.Timer(QUERY_TIMEOUT_S, con.interrupt)
            timer.start()
            con.execute(oracles[name]).fetchall()
            timings[name] = round(time.perf_counter() - t0, 4)
            timer.cancel()
            con.close()
        except Exception as e:
            if timer is not None:
                timer.cancel()
            timings[name] = None
            failed.append(name)
            print(f"# oracle error {name}: {e}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v is not None), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "oracle_query_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if failed:
        payload["failed"] = failed
    line = json.dumps(payload)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ORACLE_BASELINE_LOCAL.json"), "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
