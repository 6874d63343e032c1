"""Embedding-store service walkthrough.

What a retrieval team runs against the engine's similarity tier:
bucket the store (LSH), serve a query batch (exact top-k), check the
index quality (IVF recall + k-NN label eval), then compress for
serving (int8 quantization) — each step one operator, callable from
SQL through the engine or directly from Python.

Usage: ``python examples/vector_store_service.py [sf_dir]``
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

    spark = get_spark("vector-store-example")
    report: dict[str, object] = {"sf_dir": sf_dir}

    # --- 1. bucket the store (the scale path's blocking key) ----------
    buckets = resolve("ann_lsh_buckets")(spark, sf_dir)
    report["n_buckets"] = buckets.select("bucket").distinct().count()

    # --- 2. serve a query batch over SQL ------------------------------
    eng = Engine(spark)
    sid = eng.create_session(role="admin")
    eng.execute_sql(
        sid, f"SET engine.pipeline_data_dir = '{sf_dir}'")
    res = eng.execute_sql(
        sid,
        "SELECT q_id, vec_id, cos_sim FROM pipeline_op('ann_topk_batch')"
        " WHERE rank = 1 ORDER BY q_id",
    )
    top1 = eng.collect(sid, res)
    report["top1_sample"] = [r.asDict() for r in top1[:3]]

    # --- 3. index quality: recall + label agreement -------------------
    recall = resolve("ann_recall")(spark, sf_dir)
    report["ivf_recall"] = [r.asDict() for r in recall.limit(1).collect()]
    eval_rows = resolve("knn_label_eval")(spark, sf_dir).collect()
    report["knn_accuracy"] = {
        r["true_label"]: r["accuracy"] for r in eval_rows}

    # --- 4. compress for serving --------------------------------------
    quant = resolve("embedding_quantize")(spark, sf_dir)
    report["quantization"] = [r.asDict() for r in quant.limit(1).collect()]

    eng.close_session(sid)
    print(json.dumps(report, default=str))


if __name__ == "__main__":
    main()
