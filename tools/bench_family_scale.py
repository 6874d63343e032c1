"""Extension-family scaling sweep: one representative query per
operator family, timed at a scaled fixture dir — the growth-curve
companion to bench_tpch_scale.py for the LLM-pipeline tiers.

SCALING.md §7's full-corpus record stops at sf1 because two tiers are
deliberately super-linear or Python-state-bound: the labeled exact
ground-truth tier (embedding_neardup's all-pairs blocked GEMM is
O(n²/B²) BY DESIGN — its scale path is embedding_neardup_lsh, which IS
in this sweep) and the transformWithState tier (a per-key Python state
loop over 10x keys; its growth is pinned to sf1 in
BENCH_LOCAL_SF1_FULL.json). This tool measures everything else a 100 TB
deployment would lean on — dedup, LSH, sketches, text quality, IR,
graph, sampling, events, scale patterns, JVM streaming — at sf10 and
beyond, and records the exclusions EXPLICITLY so no silent cap can
read as coverage.

Usage:
    python tools/make_scale_data.py --factor 10  --dst .scaledata/sf1
    python tools/make_scale_data.py --factor 100 --dst .scaledata/sf10
    python tools/bench_family_scale.py .scaledata/sf1
    python tools/bench_family_scale.py .scaledata/sf10

Writes BENCH_LOCAL_<TAG>_FAMILIES.json (per-query medians over
$SPARK_GRAFT_FAMILY_ITERS passes, default 2) and prints a one-line
summary. Compare two outputs for per-family growth ratios.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

#: family -> representative queries()/oracle key. One per family, the
#: member whose plan shape carries the family's scale claim.
FAMILY_REPS: dict[str, str] = {
    "dedup_exact": "dedup_exact",
    "dedup_minhash_lsh": "dedup_minhash_lsh",
    "dedup_ngram_jaccard": "dedup_ngram_jaccard",
    "dedup_simhash": "dedup_simhash",
    "winnowing": "winnowing_fingerprint",
    "dup_clustering": "dedup_clusters",
    "ann_ivf": "ann_ivf",
    "embedding_neardup_lsh": "embedding_neardup_lsh",
    "semdedup": "semdedup_prune",
    "sketch_hll": "approx_distinct_hll",
    "sketch_cms": "cms_heavy_hitters",
    "sketch_hll_merge": "hll_rolling_merge",
    "text_quality": "gopher_quality",
    "text_lm": "unigram_logprob",
    "ir_bm25": "bm25_topk",
    "ir_tfidf": "tfidf_top_terms",
    "decontaminate": "decontaminate_ngram",
    "packing": "sequence_pack",
    "graph_pagerank": "pagerank_suppliers",
    "graph_triangles": "triangle_count",
    "sampling": "dataset_split",
    "events_sessionize": "events_sessionize",
    "events_asof": "events_asof_join",
    "scale_salted_join": "salted_join",
    "scale_manyfile": "manyfile_scan_agg",
    "scale_dpp": "dpp_join",
    "stream_jvm_window": "stream_tumbling",
    "stream_jvm_join": "stream_stream_join",
}

#: tiers NOT in this sweep, and why — recorded in the output so the
#: omission is a documented design statement, not a silent cap.
EXCLUDED: dict[str, str] = {
    "embedding_neardup": (
        "labeled exact ground-truth tier: all-pairs blocked GEMM is "
        "O(n²/B²) by design; its scale path embedding_neardup_lsh is "
        "measured here. Growth to sf1 pinned in BENCH_LOCAL_SF1_FULL"),
    "stream_user_stats / transformWithState tier": (
        "per-key Python state-server loop grows linearly in keys x "
        "events and dominates wall-clock at sf10 without adding "
        "information beyond the sf1 point (BENCH_LOCAL_SF1_FULL); "
        "the JVM streaming tier (tumbling window, stream-stream "
        "join) IS measured here"),
    "knn_label_eval": (
        "probe-capped linear scan — its growth curve is pinned at "
        "sf1 (7.5x, test_scale.py); the capped probe set makes "
        "further points measure the cap, not the operator"),
}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.path.join(repo, ".scaledata", "sf1"))
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"{sf_dir} missing - run tools/make_scale_data.py")
    iters = max(1, int(os.environ.get("SPARK_GRAFT_FAMILY_ITERS", "2")))

    import __spark_entry__ as entrymod

    from gizmosql_spark.session import get_spark

    spark = get_spark("gizmosql-spark-bench-families")
    qs = entrymod.queries()
    names = [q for q in FAMILY_REPS.values() if q in qs]

    # warmup: one full untimed execution per rep (codegen/JIT + the
    # shared persisted indexes, same rationale as bench.py)
    for name in names:
        try:
            qs[name](spark, sf_dir).count()
        except Exception as e:
            print(f"# warmup error {name}: {e}", file=sys.stderr)

    per: dict[str, float] = {}
    for name in names:
        runs = []
        try:
            for _ in range(iters):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                runs.append(time.perf_counter() - t0)
            per[name] = round(statistics.median(runs), 4)
        except Exception as e:
            print(f"# bench error {name}: {e}", file=sys.stderr)
        print(f"family {name} {per.get(name)}", file=sys.stderr)

    out = {
        "metric": "family_scale_sweep",
        "sf_dir": sf_dir,
        "iters": iters,
        "total_sec": round(sum(per.values()), 4),
        "queries": per,
        "families": {f: per.get(q) for f, q in FAMILY_REPS.items()},
        "excluded": EXCLUDED,
    }
    tag = os.path.basename(sf_dir.rstrip("/")).upper().replace(".", "")
    with open(os.path.join(
            repo, f"BENCH_LOCAL_{tag}_FAMILIES.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("queries", "families", "excluded")}))


if __name__ == "__main__":
    main()
