"""Model-evaluation & data-monitoring walkthrough.

Chains the engine's statistics/eval tier the way an ML-ops team would
run a nightly report: ranking quality (does the cheap ranker agree
with BM25?), score quality (AUC + calibration), input drift (per-shard
KS screen, CUSUM changepoint), and sequence health (Markov transition
entropy) — each step one operator, callable from SQL through the
engine or directly from the Python registry.

Usage: ``python examples/eval_monitoring_report.py [sf_dir]``
(default /root/testdata/sf0.001; prints one JSON report line).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from gizmosql_spark.engine import Engine
    from gizmosql_spark.operators.registry import resolve
    from gizmosql_spark.session import get_spark

    spark = get_spark("eval-monitoring-example")
    report: dict[str, object] = {"sf_dir": sf_dir}

    # --- 1. retrieval quality: cheap ranker vs BM25 (via SQL) ---------
    eng = Engine(spark)
    sid = eng.create_session(role="admin")
    rows = eng.collect(sid, eng.execute_sql(
        sid,
        f"SELECT * FROM pipeline_op('ranking_agreement', '{sf_dir}')",
    ))
    report["ranking_agreement"] = rows[0].asDict() if rows else None

    # --- 2. score quality: rank-identity AUC + calibration bins -------
    auc = resolve("auc_roc")(spark, sf_dir).collect()
    report["auc"] = auc[0].asDict() if auc else None
    bins = resolve("classifier_calibration_bins")(spark, sf_dir)
    report["classifier_calibration_bins"] = bins.count()

    # --- 3. input drift: per-shard KS screen + CUSUM changepoint ------
    ks = resolve("ks_test_sources")(spark, sf_dir)
    worst = ks.limit(3).collect()
    report["ks_worst_shards"] = [r.asDict() for r in worst]
    cusum = resolve("cusum_changepoint")(spark, sf_dir)
    report["changepoints"] = [r.asDict() for r in cusum.collect()]

    # --- 4. sequence health: transition entropy per state -------------
    ent = resolve("markov_transition_entropy")(spark, sf_dir)
    report["transition_entropy"] = {
        r["prev_type"]: r["entropy_bits"] for r in ent.collect()}

    eng.close_session(sid)
    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
