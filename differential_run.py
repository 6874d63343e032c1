"""Full-corpus differential gate: every ``queries()`` entry vs its
DuckDB oracle at $SPARK_GRAFT_SF_DIR (default sf0.01 — the driver's
correctness tier).

The driver's official record covers the first 50 queries; this runner
is the repo's own gate over the WHOLE corpus. Writes
``CORRECTNESS_LOCAL.json`` beside this file ({name: "ok" | "FAIL: …"})
and prints a one-line summary last.

Usage: ``python differential_run.py [--strict] [--ordered]``

``--strict`` (or SPARK_GRAFT_DIFF_STRICT=1) mirrors the DRIVER's hash
gate: floats compare as exact repr strings, no tolerance. The r9
official record proved the tolerance gate is blind to hash-grade
divergences (stats_agg passed the 250-query tolerance differential
while failing the driver hash on a -0.0 vs 0.0 cell) — run the full
corpus under --strict before every official round.

``--ordered`` (or SPARK_GRAFT_DIFF_ORDERED=1) additionally compares
rows IN RESULT ORDER for every query whose oracle declares a
top-level ORDER BY — the one divergence class the sorted comparator
is structurally blind to (a wrong ORDER BY that permutes rows).
Queries without a declared result order keep the sorted compare.

``--only a,b,c`` restricts the run to the named queries (targeted
re-verification after touching an operator; CORRECTNESS_LOCAL.json is
NOT written in that mode so the committed full-corpus record is never
clobbered by a partial run).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    strict = ("--strict" in sys.argv[1:]
              or os.environ.get("SPARK_GRAFT_DIFF_STRICT", "0") == "1")
    ordered = ("--ordered" in sys.argv[1:]
               or os.environ.get("SPARK_GRAFT_DIFF_ORDERED", "0") == "1")

    only: set[str] | None = None
    argv = sys.argv[1:]
    if "--only" in argv:
        only = {n for n in argv[argv.index("--only") + 1].split(",") if n}

    import __spark_entry__ as entrymod

    from gizmosql_spark import testing
    from gizmosql_spark.session import get_spark

    spark = get_spark("gizmosql-spark-diff")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        qs = {n: f for n, f in qs.items() if n in only}
    results: dict[str, str] = {}
    n_ordered = 0
    for name, fn in qs.items():
        t0 = time.time()
        q_ordered = (ordered and name in oracles
                     and testing.has_top_level_order_by(oracles[name]))
        n_ordered += q_ordered
        try:
            testing.compare_to_oracle(
                fn(spark, sf_dir), oracles[name], sf_dir, strict=strict,
                ordered=q_ordered)
            results[name] = "ok"
        except Exception as ex:
            results[name] = f"FAIL: {str(ex)[:300]}"
        print(name, results[name], round(time.time() - t0, 1),
              "ordered" if q_ordered else "", flush=True)

    bad = {k: v for k, v in results.items() if v != "ok"}
    if only is None:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "CORRECTNESS_LOCAL.json"), "w") as f:
            json.dump({"sf_dir": sf_dir, "total": len(results),
                       "failed": len(bad), "strict": strict,
                       "ordered": ordered, "n_ordered": n_ordered,
                       "results": results}, f, indent=1)
    # the 13 streaming entries route through live.run_live — stop (and
    # join) their long-lived queries BEFORE the summary print and
    # process exit, so no stream-thread exception can land after the
    # "one-line summary last" this file promises (same protocol as
    # bench.py; the r9 record-destroyer — atexit is too late)
    try:
        from gizmosql_spark.streaming import live

        live.quiesce(spark)
    except Exception as ex:
        print(f"# quiesce error: {ex}", file=sys.stderr)
    print(f"TOTAL {len(results)} FAILED {len(bad)} "
          f"strict={strict} ordered={ordered}/{n_ordered} "
          f"{json.dumps(bad)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
