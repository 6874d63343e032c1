"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H h01) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent SQL for the differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H h01) on /root/testdata/sf0.001."""
    from gizmosql_spark.operators import tpch
    from gizmosql_spark.vendor import export_to_spark_workers

    export_to_spark_workers(spark)
    return tpch.q01(spark, "/root/testdata/sf0.001")


# The driver's correctness harness records the FIRST 50 entries in
# iteration order (dicts preserve insertion order).  Front-load one
# representative per operator family so the official record spans every
# family; everything else follows and is still verified by the repo's
# own differential harness (gizmosql_spark/testing.py).
_PRIORITY = [
    # Round-11 rotation (VERDICT r10 item 2): 116 of 250 corpus
    # queries had never appeared in any official CORRECTNESS_r*
    # record after ten rounds — this round front-loads 36 of them
    # (every family with only strict-local evidence: the spatial tier,
    # multimodal audio/frames/phash, the evalops tier, UDTF/UDAF,
    # plus the r11-touched operators). The official 50 =
    # 13 streaming (HELD until two consecutive parseable driver bench
    # records sit inside the 2x gate — BENCH_r10 at 1.60x is the
    # first; on the second, r12 reclaims these slots too)
    # + 1 canary (q01) + 36 never-recorded rows (ledger in
    # COVERAGE.md). Everything else remains verified by the repo's
    # own 250-query STRICT differential at sf0.01 AND sf0.1
    # (differential_run.py --strict [--ordered], hash-grade).
    #
    # r12 rotation (VERDICT r11 item 7): the 13 streaming slots are
    # RELEASED — the hold criterion ("two consecutive parseable driver
    # bench records inside the 2x gate") is met by BENCH_r10 (1.60x)
    # and BENCH_r11 (1.91x). All 13 stream_* rows have official green
    # records (r10 AND r11) and stay fully verified by pytest + the
    # 250-query strict differential every round. Their slots go to 13
    # never-recorded rows (80 remained after r11 — ledger in
    # COVERAGE.md), weighted toward the r11/r12-rewritten operators so
    # the official record carries the rewrites, plus one row per
    # still-uncovered family. All 13 are comparator-safe (scalar
    # output columns only — FIXTURES.md rule 6, audited by
    # tools/audit_output_shapes.py).
    "ngram_novelty",          # r12 de-skew rewrite (min_by rollups)
    "dedup_span_report",      # r12 de-skew rewrite (count windows)
    "dedup_window_hash",      # r11 single-pass window-hash rewrite
    "knn_label_eval",         # r11 Arrow GEMM + r12 per-partition topk
    "word_cooccurrence",      # r11 shared term-frame rewrite
    "dedup_pair_classify",    # r11 keyed-persist band frame
    "hll_rolling_merge",      # r11 BNLJ->bounded-grid join fix
    "bfs_suppliers",          # r11 long-node-id rewrite; graph family
    "runtime_bloom_join",     # scale-pattern family, never recorded
    "histogram_quantiles",    # stats family spread
    "pipeline_clean_corpus",  # composed-pipeline family
    "gopher_quality",         # text-quality family
    "holt_forecast",          # time-series family
    # canary: the flagship staple, green in every official record
    "q01",
    # r11-touched, never-recorded: the two global-rank rewrites
    # (two-pass range-bucket row_number replacing unpartitioned
    # corpus windows) and the four log-shape signed-zero normalizers
    "quantile_normalize",     # pooled rank -> scale.global_row_number
    "events_rfm",             # ntile(4) x3 -> closed-form rank ntile
    "char_entropy",           # + 0.0 normalizer (single-char -0.0)
    "markov_transition_entropy",  # + 0.0 normalizer (p=1 -0.0 term)
    "ndcg_mrr_eval",          # + 0.0 normalizer (lint symmetry)
    "benford_prices",         # + 0.0 normalizer (lint symmetry)
    # never-recorded: spatial tier (strict-local-only since r6)
    "spatial_funcs2",
    "spatial_funcs3",
    "spatial_funcs4",
    "spatial_funcs6",
    "spatial_funcs7",
    "spatial_extent_agg",
    "spatial_wkb2",
    "spatial_join",           # grid-bucketed equi-join (plan-pinned)
    "spatial_knn_join",
    # never-recorded: multimodal siblings of the r10-official
    # multimodal_features row
    "multimodal_audio",
    "multimodal_frames",
    "multimodal_phash_dedup",
    # never-recorded: evalops tier
    "kappa_agreement",
    "class_prf_report",
    "classifier_calibration_bins",
    "calibration_bins",
    "scd2_status_dim",        # gaps-and-islands SCD-2 build
    # never-recorded: extension seams (UDTF / UDAF survey rows)
    "udtf_chunks",
    "udaf_geomean",
    # never-recorded: relational / text / retrieval spread
    "window_time_range",      # time-RANGE window frames
    "unnest_embeddings",
    "values_join",
    "fuzzy_join",
    "columns_expansion",
    "string_funcs2",
    "phrase_search",
    "trimmed_stats",
    "inverted_index",
    "bpe_first_merges",
    "zipf_vocab_stats",
]


def _with_worker_env(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Export the vendored-protobuf worker PYTHONPATH before the first
    operator runs.  The official driver builds its SparkSession before
    importing this package, so ``session.get_spark()`` never runs there;
    wrapping every query callable makes the ``sc.environment`` mutation
    happen at the earliest point we control — before any Python worker
    daemon spawns — so the daemon env key never splits mid-session
    (Spark keys worker daemons by (pythonExec, envVars); a later
    mutation orphans every warmed worker).  Idempotent and O(1) after
    the first call."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from gizmosql_spark.vendor import export_to_spark_workers

        export_to_spark_workers(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gizmosql_spark.operators.registry import pipeline_queries

    merged = pipeline_queries()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PRIORITY:
        if name in merged:
            out[name] = _with_worker_env(merged[name])
    for name, fn in merged.items():
        if name not in out:
            out[name] = _with_worker_env(fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL, keyed identically to ``queries()``."""
    from gizmosql_spark.operators.registry import pipeline_oracles

    return dict(pipeline_oracles())
