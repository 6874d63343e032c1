"""TPC-H 22-query power run at a scaled fixture dir, Spark vs DuckDB.

Writes BENCH_LOCAL_SF1.json: per-query wall-clock for the Spark engine
AND for DuckDB executing the equivalent oracle SQL on the SAME parquet
files (warm single connection — the stricter protocol VERDICT r3 used),
plus the totals and the ratio. The point (VERDICT r3 "Next round" #5):
at sf0.1 the 22-query workload is fixed-overhead-bound (~0.2-0.4 s/query
scheduling floor vs 10-70 ms DuckDB queries); this records how the
ratio closes when per-query work grows 10x. Build the fixture first:

    python tools/make_scale_data.py            # -> .scaledata/sf1
    python tools/bench_tpch_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.path.join(repo, ".scaledata", "sf1"))
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"{sf_dir} missing - run tools/make_scale_data.py")

    import duckdb

    from gizmosql_spark.operators import tpch
    from gizmosql_spark.session import get_spark

    names = sorted(k for k in tpch.QUERIES if k in tpch.ORACLE)

    spark = get_spark("gizmosql-spark-bench-sf1")
    tpch.QUERIES["q06"](spark, sf_dir).count()  # JVM/footer warmup

    spark_t: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        tpch.QUERIES[name](spark, sf_dir).count()
        spark_t[name] = round(time.perf_counter() - t0, 4)
        print(f"spark {name} {spark_t[name]}", file=sys.stderr)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')")
    con.execute("SELECT count(*) FROM lineitem").fetchall()  # warm
    duck_t: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        con.execute(tpch.ORACLE[name]).fetchall()
        duck_t[name] = round(time.perf_counter() - t0, 4)
        print(f"duckdb {name} {duck_t[name]}", file=sys.stderr)

    s_total = round(sum(spark_t.values()), 4)
    d_total = round(sum(duck_t.values()), 4)
    out = {
        "metric": "tpch22_power_run",
        "sf_dir": sf_dir,
        "spark_total_sec": s_total,
        "duckdb_total_sec": d_total,
        "ratio": round(s_total / d_total, 3),
        "spark": spark_t,
        "duckdb": duck_t,
    }
    tag = os.path.basename(sf_dir.rstrip("/")).upper().replace(".", "")
    with open(os.path.join(repo, f"BENCH_LOCAL_{tag}.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("spark", "duckdb")}))


if __name__ == "__main__":
    main()
