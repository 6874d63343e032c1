"""Corpus-wide single-task-sort audit: explain every batch query and
flag UNPARTITIONED window specs — the one plan shape that cannot
survive a corpus-sized frame at 100 TB (Spark executes it as
``Exchange SinglePartition`` + a one-task sort of the whole frame;
VERDICT r10 "What's wrong" #1).

tests/test_plans.py::test_no_corpus_global_rank_window pins the four
operators rewritten in round 11 (quantile_normalize, events_rfm,
skyline_parts, events_error_burst); this tool sweeps the WHOLE corpus
so no fifth instance hides elsewhere. A hit is only a scale defect
when the window's frame grows with the corpus — global windows over
already-aggregated small frames (a rank over 25 group rows, a cumsum
over 31 days) are bounded by construction and are allowlisted HERE,
each with the reason the frame stays small, so the residual list is
reviewable instead of rediscovered every round.

Usage: ``python tools/audit_global_windows.py`` (SPARK_GRAFT_SF_DIR,
default sf0.001 — the audit reads PLANS, not results, so the smallest
fixture is enough). Prints one line per flagged query, a JSON summary
line last, and exits 1 if any UNALLOWLISTED unpartitioned window
survives.
"""

from __future__ import annotations

import json
import os
import re
import sys

#: queries whose unpartitioned window runs over a frame that is small
#: BY CONSTRUCTION (post-aggregation group counts, fixed calendars,
#: k-sized tops) — name → why the frame cannot grow with the corpus.
#: Triaged r11 (each reason names the frame the window rides and why
#: its size is corpus-invariant; the operator docstrings carry the
#: same argument under "Scale shape").
ALLOWED: dict[str, str] = {
    # k-row frames AFTER orderBy().limit(k) → TakeOrderedAndProject
    # feeds the window; the sort itself is parallel per-partition
    # top-k. NOTE: the rank-FILTER form (row_number then rk<=k) is
    # NOT equivalent — InferWindowGroupLimit skips unpartitioned
    # windows on this Spark, so that form single-task-sorts the full
    # frame (ranking_agreement was rewritten off it in r11).
    "bpe_first_merges": "top-_BPE_TOP frame after limit()",
    "events_top_paths": "top-_PATH_TOP frame after limit()",
    "oov_curve": "kmax-row vocabulary head after limit()",
    "weighted_sample": "_WS_K-row race winners after limit()",
    "ranking_agreement": "two k=20-row top frames after limit()",
    # post-aggregation frames bounded by a fixed domain
    "benford_prices": "9-row leading-digit frame",
    "calibration_bins": "10-row decile-bin frame",
    "auc_roc": "score grid (round(value,4) cells), corpus-invariant",
    "chi_square_independence": "langs x sources contingency cells",
    "mutual_information": "langs x sources contingency cells",
    "temperature_resample": "per-source rate frame (#sources rows)",
    "mixture_plan": "per-source budget frame (#sources rows)",
    "shard_shuffle_plan": "_N_SHARDS-row shard stats frame",
    "degree_distribution": "degree histogram (<= max-degree rows)",
    "ks_test_sources": "distinct-length ECDF grid (length domain)",
    "bootstrap_ci_mean": "_BOOT_B replicate means (fixed B)",
    # calendar- / age-bounded series
    "events_wow_growth": "weekly aggregate series (calendar weeks)",
    "churn_hazard": "age-week hazard frame (calendar span)",
    # centroid-sized probe ranking
    "ann_ivf": "probe rank over N_CENTROIDS centroid rows",
    "ann_recall": "same probe rank via ann_ivf",
}

_UNPARTITIONED = re.compile(
    # windowspecdefinition whose first argument is already a sort order
    # (no partition columns) or whose only argument is the frame itself
    r"windowspecdefinition\([^,)]* (?:ASC|DESC)"
    r"|windowspecdefinition\(\s*specifiedwindowframe"
)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    import __spark_entry__ as entrymod
    from gizmosql_spark.session import get_spark

    spark = get_spark("gizmosql-spark-plan-audit")
    qs = entrymod.queries()
    flagged: dict[str, str] = {}
    skipped: list[str] = []
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if name.startswith("stream_"):
            # streaming entries materialize sinks; the returned frame's
            # plan is the sink read, not the stateful query (whose
            # windows are keyed by construction — state ops require it)
            skipped.append(name)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as ex:  # noqa: BLE001 — audit must not abort
            errors[name] = str(ex)[:160]
            continue
        m = _UNPARTITIONED.search(plan)
        if m:
            flagged[name] = m.group(0)[:120]
            status = "ALLOWED: " + ALLOWED[name] if name in ALLOWED \
                else "UNPARTITIONED-WINDOW"
            print(f"{name}: {status} [{m.group(0)[:90]}]", flush=True)
    bad = sorted(set(flagged) - set(ALLOWED))
    stale = sorted(set(ALLOWED) - set(flagged))
    if stale:
        print(f"stale allowlist entries (no longer flagged): {stale}")
    print(json.dumps({
        "sf_dir": sf_dir, "audited": len(qs) - len(skipped),
        "skipped_streaming": len(skipped), "errors": errors,
        "flagged": len(flagged), "allowed": len(set(flagged) & set(ALLOWED)),
        "unallowlisted": bad,
    }))
    sys.exit(1 if bad or errors else 0)


if __name__ == "__main__":
    main()
