"""End-to-end training-corpus preparation pipeline.

Chains the engine's operator tier the way a data team would: quality
gate → exact + near dedup → decontamination → deterministic split →
sequence packing, with a sketch-based profile at each stage — all
through the same two surfaces a reference user has (SQL over the
engine, or the Python operator registry).

Usage: ``python examples/corpus_prep_pipeline.py [sf_dir]``
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

    spark = get_spark("corpus-prep-example")
    report: dict[str, object] = {"sf_dir": sf_dir}

    # --- 1. profile the raw corpus (sketch tier, via SQL) -------------
    eng = Engine(spark)
    sid = eng.create_session(role="admin")
    res = eng.execute_sql(
        sid,
        f"SELECT * FROM pipeline_op('approx_distinct_hll', '{sf_dir}')",
    )
    hll = eng.collect(sid, res)
    report["approx_distinct_tokens"] = hll[0].asDict() if hll else None

    # --- 2. quality gate (Gopher rules) -------------------------------
    gate = resolve("gopher_quality")(spark, sf_dir)
    report["quality_gate"] = [r.asDict() for r in gate.limit(3).collect()]

    # --- 3. dedup: exact tier, then LSH near-dup clusters -------------
    exact = resolve("dedup_exact")(spark, sf_dir)
    report["exact_dup_groups"] = exact.count()
    clusters = resolve("dedup_clusters")(spark, sf_dir)
    n_docs = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    report["near_dup"] = {
        "docs": n_docs,
        "clusters": n_clusters,
        "removable": n_docs - n_clusters,
    }

    # --- 4. decontaminate against the eval split ----------------------
    decon = resolve("decontaminate_ngram")(spark, sf_dir)
    report["decontamination"] = [
        r.asDict() for r in decon.limit(3).collect()]

    # --- 5. deterministic split + packing plan ------------------------
    split = resolve("dataset_split")(spark, sf_dir)
    report["split"] = {
        r["split"]: r["n_docs"] for r in split.collect()}
    plan = resolve("length_batch_plan")(spark, sf_dir)
    report["batch_plan_bins"] = plan.count()

    eng.close_session(sid)
    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
