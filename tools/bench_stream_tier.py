"""Cold-per-run A/B harness for the live streaming tier's pollingDelay
knob (VERDICT r11 item 3).

Replicates the bench protocol for the 15 stream_* queries only: fresh
process, full warmup (so the live registry holds every stream query
RUNNING, exactly like the bench's warmup pass), then N timed
interleaved passes. Per-query medians + tier total printed as one JSON
line. The pollingDelay under test comes from
SPARK_GRAFT_STREAM_POLLING_DELAY (read by windows.py at clone build).

Usage:
    SPARK_GRAFT_STREAM_POLLING_DELAY=50ms python tools/bench_stream_tier.py
    python tools/bench_stream_tier.py --sweep 10ms,50ms,100ms,250ms
With --sweep, each value runs in a FRESH subprocess (cold JVM per
knob value — the r11 A/B measured warm in-corpus medians; VERDICT r11
asked for cold-per-run evidence) and the results print as a table.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def run_once() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gizmosql_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("stream-tier-ab")
    qs = {n: f for n, f in entrymod.queries().items()
          if n.startswith("stream")}
    names = sorted(qs)
    # warmup pass = live-tier instantiation (same as bench warmup)
    w0 = time.perf_counter()
    for n in names:
        qs[n](spark, sf_dir).count()
    warm = time.perf_counter() - w0
    samples: dict[str, list[float]] = {n: [] for n in names}
    pass_totals = []
    for _ in range(iters):
        p0 = time.perf_counter()
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            samples[n].append(time.perf_counter() - t0)
        pass_totals.append(round(time.perf_counter() - p0, 3))
    med = {n: round(statistics.median(v), 4) for n, v in samples.items()}
    out = {
        "polling_delay": os.environ.get(
            "SPARK_GRAFT_STREAM_POLLING_DELAY", "250ms(default)"),
        "tier_total": round(sum(med.values()), 3),
        "warmup": round(warm, 3),
        "pass_totals": pass_totals,
        "queries": med,
    }
    from gizmosql_spark.streaming import live

    live.quiesce(spark)
    print("STREAM_TIER_RESULT " + json.dumps(out))


def sweep(values: list[str]) -> None:
    for v in values:
        env = dict(os.environ)
        env["SPARK_GRAFT_STREAM_POLLING_DELAY"] = v
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800)
        with open(f"/tmp/stream_ab_{v}.err", "w") as f:
            f.write(proc.stderr)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("STREAM_TIER_RESULT ")]
        if line:
            rec = json.loads(line[-1].split(" ", 1)[1])
            print(f"{v:>8}: tier_total={rec['tier_total']:8.3f}  "
                  f"passes={rec['pass_totals']}  warmup={rec['warmup']}")
            print("         " + json.dumps(rec["queries"]))
        else:
            print(f"{v:>8}: FAILED rc={proc.returncode} "
                  f"{proc.stderr[-500:]}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sweep":
        sweep([v for v in sys.argv[2].split(",") if v])
    else:
        run_once()
