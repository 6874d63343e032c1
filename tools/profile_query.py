"""Per-query profiler for the optimization rounds (guide §1).

For each named query: build + count() three times under a dedicated
job group, record wall seconds, Spark job count and stage count per
iteration (statusTracker), and optionally dump `.explain("formatted")`
to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/profile_query.py q18 events_rfm ...
    python tools/profile_query.py --plans r11:before events_rfm
    python tools/profile_query.py --all-top 25        # from BENCH_LOCAL_PAIR_B

Prints one JSON line per query to stdout:
    {"name": ..., "runs": [s,s,s], "median": s, "jobs": n, "stages": n}

The job/stage counts are for the LAST iteration (warm plan), which is
what the bench's median measures.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _capture_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        args = args[:i] + args[i + 2:]
    iters = 3
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    names = args
    if names and names[0] == "--all-top":
        n = int(names[1])
        rec = json.load(open(os.path.join(
            os.path.dirname(__file__), "..", "BENCH_LOCAL_PAIR_B.json")))
        names = [k for k, _ in sorted(
            rec["queries"].items(), key=lambda x: -x[1])[:n]]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from gizmosql_spark.session import get_spark

    import __spark_entry__ as entrymod
    import bench

    # UI on: the REST API's per-stage executorCpuTime is the
    # noise-resistant metric this sandbox needs (wall-clock swings
    # ±70% minute-to-minute under noisy neighbors)
    spark = get_spark("gizmosql-profile",
                      extra_confs={"spark.ui.enabled": "true"})
    qs = entrymod.queries()
    try:
        bench._warmup(spark, qs, sf_dir)
    except Exception as e:
        print(f"# warmup error: {e}", file=sys.stderr)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    import urllib.request

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def _stage_cpu_ms(stage_ids) -> tuple[float, float]:
        """(executorCpuTime ms, executorRunTime ms) summed over the
        given stage ids via the UI REST API; (0, 0) on any failure."""
        cpu = run = 0.0
        for sid in stage_ids:
            try:
                with urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app_id}/stages/{sid}",
                        timeout=5) as r:
                    for att in json.load(r):
                        cpu += att.get("executorCpuTime", 0) / 1e6
                        run += att.get("executorRunTime", 0)
            except Exception:
                pass
        return cpu, run

    out_rows = []
    for name in names:
        if name not in qs:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        runs, cpu_runs, jobs, stages, tasks = [], [], 0, 0, 0
        try:
            fn(spark, sf_dir).count()  # untimed warm pass
            for it in range(iters):
                group = f"profile:{name}:{it}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
                sc.setJobGroup(None, None)
                ids = tracker.getJobIdsForGroup(group)
                jobs = len(ids)
                stages = 0
                tasks = 0
                sids = []
                for jid in ids:
                    ji = tracker.getJobInfo(jid)
                    if ji is not None:
                        stages += len(ji.stageIds)
                        sids.extend(ji.stageIds)
                        for sid in ji.stageIds:
                            si = tracker.getStageInfo(sid)
                            if si is not None:
                                tasks += si.numTasks
                cpu, _ = _stage_cpu_ms(sids)
                cpu_runs.append(cpu / 1000.0)
        except Exception as e:
            print(f"# error {name}: {e}", file=sys.stderr)
            continue
        row = {
            "name": name,
            "runs": [round(r, 3) for r in runs],
            "median": round(statistics.median(runs), 3),
            "cpu_median": round(statistics.median(cpu_runs), 3)
            if cpu_runs else None,
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        out_rows.append(row)
        print(json.dumps(row), flush=True)
        if plans_tag:
            tag, suffix = plans_tag.split(":")
            d = os.path.join(os.path.dirname(__file__), "..", "plans", tag)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as f:
                f.write(_capture_plan(fn(spark, sf_dir)))

    from gizmosql_spark.streaming import live

    live.quiesce(spark)
    print(json.dumps({"total_median": round(
        sum(r["median"] for r in out_rows), 3)}), flush=True)


if __name__ == "__main__":
    main()
