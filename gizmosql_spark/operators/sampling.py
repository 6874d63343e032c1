"""Deterministic sampling / splitting for training-data pipelines.

Extension tier (SURVEY §7 Phase 5 family). A curation pipeline needs
reproducible row selection — the same corpus must split the same way
on every run, on any engine, at any parallelism:

- **dataset_split**: hash-based train/val/test assignment. The split
  key is ``md5(doc_id)``; buckets are LEXICOGRAPHIC ranges of the hex
  string (hex is uniform, so prefix thresholds are proportions:
  ``< 'cd'`` ≈ 205/256 ≈ 80%). No RNG, no seed state, no engine hash
  — bit-identical across Spark and the DuckDB oracle.
- **stratified_sample**: per-stratum deterministic rates (downsample
  the dominant language, keep the tail) with the same md5-threshold
  trick; emits the kept rows, so the differential check verifies the
  exact membership, not just counts.
- **reservoir-style per-group top-k** (``grouped_head``): the
  deterministic analog of per-group reservoir sampling — rank by
  md5(key) inside each group, keep k. One window, one shuffle.

100 TB path: all three are scan + hash + (at most) one window
shuffle; selection is a pure function of the row key, so re-runs and
backfills select identical rows regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


#: hex-prefix thresholds: md5 < 'cd' → train (~80.1%), < 'e6' → val
#: (~89.8%), rest test. Two-hex-char granularity = 1/256 steps.
_TRAIN_MAX = "cd"
_VAL_MAX = "e6"


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split summary over documents."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    split = (
        F.when(h < _TRAIN_MAX, F.lit("train"))
        .when(h < _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .orderBy("split")
    )


#: per-language keep thresholds: downsample English hard, keep the
#: rest at higher rates (the classic rebalancing move)
_LANG_RATES = {"en": "20", "de": "cd", "fr": "cd"}
_DEFAULT_RATE = "e6"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sample: exact kept-row membership
    (doc_id order) so the oracle verifies selection, not counts."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    thr = F.lit(_DEFAULT_RATE)
    for lang, rate in sorted(_LANG_RATES.items()):
        thr = F.when(F.col("lang") == lang, F.lit(rate)).otherwise(thr)
    return (
        d.select("doc_id", "lang", "source", h.alias("h"), thr.alias("thr"))
        .filter(F.col("h") < F.col("thr"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


GROUP_K = 5


def grouped_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group k rows (reservoir-sampling analog):
    rank by md5(doc_id) within (lang, source), keep GROUP_K. The hash
    ordering is the uniform-random draw, made reproducible."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_K)
        .select("lang", "source", "doc_id", "rk")
        .orderBy("lang", "source", "rk")
    )


def temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture resampling (T=2): the standard
    multi-domain balancing pass — upweight tail sources, downsample
    dominant ones. Per-source token share w_i becomes target share
    sqrt(w_i)/sum_j sqrt(w_j); each source keeps rows at rate
    min(1, base * target/original share), selected DETERMINISTICALLY
    by an integer md5 threshold on a 4096-grid (first 3 hex chars),
    so membership is a pure row-key function on any engine.

    Scale shape: one scan aggregates per-source token counts (a
    handful of rows), rates compute on that tiny frame and broadcast
    back; the keep-pass is scan + hash compare. sqrt (IEEE correctly
    rounded) not pow — identical doubles everywhere."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    per_src = toks.groupBy("source").agg(
        F.sum("n_tok").alias("tok"), F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    rates = (
        per_src
        .withColumn("share", F.col("tok") / F.sum("tok").over(w))
        .withColumn("adj", F.sqrt("share") / F.sum(F.sqrt("share")).over(w))
        .withColumn(
            "thr",
            F.floor(F.least(
                F.lit(1.0),
                F.lit(0.5) * F.col("adj") / F.col("share")) * 4096
            ).cast("int"),
        )
    )
    kept = (
        toks.join(F.broadcast(rates.select("source", "thr")), "source")
        .where(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3),
                   16, 10).cast("int") < F.col("thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("kept_docs"),
             F.sum("n_tok").alias("kept_tokens"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source", "n_docs",
            F.round("share", 6).alias("orig_share"),
            F.round("adj", 6).alias("target_share"),
            "thr",
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
        .orderBy("source")
    )


_MIX_BUDGET = 1_000_000  # token budget to allocate


def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted mixture planning: allocate a token budget
    across sources with weight proportional to (summed per-doc
    quality)^2 — the curation step that turns quality scores into
    sampling rates for the next training mix.

    Per-doc quality is the text_quality formula rounded IN the engine
    before the per-source sum (so float association order cannot
    drift the plan across engines). One corpus scan for the scores,
    then all planning arithmetic happens on the #sources-sized
    frame."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    n_tokens = F.size(F.split(norm, " ")).cast("double")
    stop_hits = F.size(F.regexp_extract_all(
        norm, F.lit(r"\b(the|a|of|and|to|in|is)\b"), 0)).cast("double")
    punct = F.length(F.regexp_replace(norm, r"[a-z0-9 ]", "")).cast("double")
    n_chars = F.length(norm).cast("double")
    score = F.greatest(F.lit(0.0), F.least(F.lit(1.0),
        F.lit(0.4) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.4) * (F.lit(1.0) - punct / F.greatest(n_chars, F.lit(1.0)))
        + F.lit(0.2) * stop_hits / n_tokens))
    per_src = (
        d.select("source", F.round(score, 6).alias("q"),
                 n_tokens.cast("long").alias("n_tok"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"),
             F.round(F.sum("q"), 4).alias("q_sum"))
    )
    w = Window.partitionBy()
    # weight rounded to 6 BEFORE the budget multiply: the cross-source
    # sum of squares can differ by ~1 ulp between engines, and floor()
    # at an integer boundary would amplify that — rounding first makes
    # the planned allocation bit-identical
    weight6 = F.round(
        (F.col("q_sum") * F.col("q_sum"))
        / F.sum(F.col("q_sum") * F.col("q_sum")).over(w), 6)
    return (
        per_src
        .withColumn("weight", weight6)
        .select(
            "source", "n_docs", "n_tokens", "q_sum", "weight",
            F.floor(F.lit(float(_MIX_BUDGET)) * F.col("weight"))
            .cast("long").alias("alloc_tokens"),
            F.round(F.least(
                F.lit(1.0),
                F.floor(F.lit(float(_MIX_BUDGET)) * F.col("weight"))
                / F.col("n_tokens")), 6).alias("sampling_rate"),
        )
        .orderBy("source")
    )


def grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-leakage-proof train/val/test split: the split key is the
    GROUP (``source``), not the row, so every document of a source
    lands in the same split — the standard guard against
    train/test contamination when near-duplicate documents cluster
    within a source (same crawl domain, same book, same repo).

    Scale shape: the group key is already on the row, so membership
    is a pure hash compare in the scan — no join against a group
    table, no shuffle before the final partial agg. Leakage-freedom
    is by construction (a deterministic function of the key cannot
    assign one source to two splits)."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("source"))
    split = (
        F.when(h < _TRAIN_MAX, F.lit("train"))
        .when(h < _VAL_MAX, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.count_distinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


_SYS_STRIDE = 500  # tokens per systematic stratum


def systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional systematic sampling: walk the corpus in
    doc_id order accumulating token counts and keep the first document
    crossing each _SYS_STRIDE-token boundary — every kept doc
    represents one equal-weight stratum, so selection probability is
    proportional to document length with NO floating-point randomness
    (the deterministic analog of weighted reservoir sampling).

    Scale shape: one window cumsum partitioned by source (strata are
    per-stream, as in sequence packing — the global form is the same
    range-partition two-pass). Pure integer arithmetic end to end:
    bit-identical on any engine, any parallelism."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("n_tok").over(w)
    marked = (
        d.select("source", "doc_id", toks.alias("n_tok"))
        .select(
            "source", "doc_id", "n_tok",
            F.floor((cum - F.col("n_tok")) / _SYS_STRIDE)
            .alias("stratum_before"),
            F.floor(cum / _SYS_STRIDE).alias("stratum_after"),
        )
    )
    return (
        marked.filter(F.col("stratum_after") > F.col("stratum_before"))
        .select("source", "doc_id", "n_tok",
                F.col("stratum_after").cast("long").alias("stratum"))
        .orderBy("source", "doc_id")
    )


#: weighted-sample size and hash-uniform resolution (8 hex digits)
_WS_K = 100
_WS_RES = 16 ** 8


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    exponential-race form): each document draws a deterministic
    uniform u from md5(doc_id), races with key = -ln(u) / weight
    (weight = n_chars), and the k smallest keys win — selection
    probability proportional to length, exactly reproducible on any
    engine / any parallelism because the "randomness" is the hash.

    Scale shape: per-row hash + ln, then TakeOrderedAndProject top-k —
    one scan, no shuffle beyond the k-row final. Keys are rounded to
    12 decimals IN the engine before ranking so last-ulp ln()
    differences between runtimes cannot flip the order; remaining
    ties break on doc_id."""
    d = _t(spark, sf_dir, "documents")
    u_int = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (u_int + 0.5) / F.lit(float(_WS_RES))
    key = F.round(-F.log(u) / F.col("n_chars"), 12)
    ranked = d.select(
        "doc_id", "source", "n_chars", key.alias("race_key"))
    w = Window.orderBy("race_key", "doc_id")
    return (
        ranked.orderBy("race_key", "doc_id")
        .limit(_WS_K)
        .select(
            F.row_number().over(w).alias("rank"),
            "doc_id",
            "source",
            "n_chars",
        )
        .orderBy("rank")
    )


QUERIES = {
    "dataset_split": dataset_split,
    "weighted_sample": weighted_sample,
    "grouped_split": grouped_split,
    "systematic_sample": systematic_sample,
    "temperature_resample": temperature_resample,
    "mixture_plan": mixture_plan,
    "stratified_sample": stratified_sample,
    "grouped_head": grouped_head,
}

#: hex→uint32 expansion for the oracle (column ``h`` = md5 hex string)
_WS_HEX_U = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)

ORACLE: dict[str, str] = {
    "weighted_sample": f"""
        WITH hashed AS (
            SELECT doc_id, source, n_chars,
                   md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents
        ), keyed AS (
            SELECT doc_id, source, n_chars,
                   round(-ln((({_WS_HEX_U}) + 0.5) / {float(_WS_RES)})
                         / n_chars, 12) AS race_key
            FROM hashed
        ), topk AS (
            SELECT doc_id, source, n_chars, race_key
            FROM keyed ORDER BY race_key, doc_id LIMIT {_WS_K}
        )
        SELECT CAST(row_number() OVER (ORDER BY race_key, doc_id)
                    AS INTEGER) AS rank,
               doc_id, source, n_chars
        FROM topk
        ORDER BY rank
    """,
    "mixture_plan": f"""
        WITH t AS (
            SELECT source,
                   CAST(len(string_split(regexp_replace(trim(lower(text)),
                        '\\s+', ' ', 'g'), ' ')) AS DOUBLE) AS n_tokens,
                   CAST(len(regexp_extract_all(regexp_replace(trim(lower(text)),
                        '\\s+', ' ', 'g'),
                        '\\b(the|a|of|and|to|in|is)\\b')) AS DOUBLE) AS stop_hits,
                   CAST(length(regexp_replace(regexp_replace(trim(lower(text)),
                        '\\s+', ' ', 'g'), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                       AS punct_chars,
                   CAST(length(regexp_replace(trim(lower(text)),
                        '\\s+', ' ', 'g')) AS DOUBLE) AS n_chars
            FROM documents
        ),
        q AS (
            SELECT source,
                   round(greatest(0.0, least(1.0,
                       0.4 * least(n_tokens / 100.0, 1.0)
                       + 0.4 * (1.0 - punct_chars / greatest(n_chars, 1.0))
                       + 0.2 * (stop_hits / n_tokens))), 6) AS qd,
                   CAST(n_tokens AS BIGINT) AS n_tok
            FROM t
        ),
        per_src AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   round(sum(qd), 4) AS q_sum
            FROM q GROUP BY source
        ),
        tot AS (SELECT sum(q_sum * q_sum) AS sq FROM per_src)
        SELECT source, n_docs, n_tokens, q_sum,
               round(q_sum * q_sum / sq, 6) AS weight,
               CAST(floor({_MIX_BUDGET}.0 * round(q_sum * q_sum / sq, 6))
                    AS BIGINT) AS alloc_tokens,
               round(least(1.0,
                   floor({_MIX_BUDGET}.0 * round(q_sum * q_sum / sq, 6))
                   / n_tokens), 6) AS sampling_rate
        FROM per_src, tot
        ORDER BY source
    """,
    "temperature_resample": """
        WITH toks AS (
            SELECT source, doc_id,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        ), per_src AS (
            SELECT source, sum(n_tok) AS tok, count(*) AS n_docs
            FROM toks GROUP BY source
        ), shares AS (
            SELECT source, n_docs, tok / sum(tok) OVER () AS share
            FROM per_src
        ), adjusted AS (
            SELECT source, n_docs, share,
                   sqrt(share) / sum(sqrt(share)) OVER () AS adj
            FROM shares
        ), rates AS (
            SELECT source, n_docs, share, adj,
                   CAST(floor(least(1.0::DOUBLE,
                        0.5::DOUBLE * adj / share) * 4096) AS INT) AS thr
            FROM adjusted
        ), kept AS (
            SELECT t.source, count(*) AS kept_docs,
                   sum(t.n_tok) AS kept_tokens
            FROM toks t JOIN rates r USING (source)
            WHERE (strpos('0123456789abcdef',
                       substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 1)) - 1) * 256
                + (strpos('0123456789abcdef',
                       substr(md5(CAST(t.doc_id AS VARCHAR)), 2, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                       substr(md5(CAST(t.doc_id AS VARCHAR)), 3, 1)) - 1)
                  < r.thr
            GROUP BY t.source
        )
        SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
               round(r.share, 6) AS orig_share,
               round(r.adj, 6) AS target_share,
               r.thr,
               CAST(coalesce(k.kept_docs, 0) AS BIGINT) AS kept_docs,
               CAST(coalesce(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
        FROM rates r LEFT JOIN kept k USING (source)
        ORDER BY r.source
    """,
    "systematic_sample": f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        cums AS (
            SELECT source, doc_id, n_tok,
                   sum(n_tok) OVER (PARTITION BY source
                                    ORDER BY doc_id) AS cum
            FROM toks
        )
        SELECT source, doc_id, n_tok,
               CAST(floor(cum / {_SYS_STRIDE}) AS BIGINT) AS stratum
        FROM cums
        WHERE floor(cum / {_SYS_STRIDE})
              > floor((cum - n_tok) / {_SYS_STRIDE})
        ORDER BY source, doc_id
    """,
    "grouped_split": f"""
        SELECT CASE WHEN md5(source) < '{_TRAIN_MAX}' THEN 'train'
                    WHEN md5(source) < '{_VAL_MAX}' THEN 'val'
                    ELSE 'test' END AS split,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
    "dataset_split": f"""
        SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_TRAIN_MAX}'
                    THEN 'train'
                    WHEN md5(CAST(doc_id AS VARCHAR)) < '{_VAL_MAX}'
                    THEN 'val' ELSE 'test' END AS split,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(n_chars), 6) AS avg_chars
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) <
              CASE lang WHEN 'en' THEN '20' WHEN 'de' THEN 'cd'
                        WHEN 'fr' THEN 'cd' ELSE '{_DEFAULT_RATE}' END
        ORDER BY doc_id
    """,
    "grouped_head": f"""
        SELECT lang, source, doc_id, rk
        FROM (
            SELECT lang, source, doc_id,
                   CAST(row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS INTEGER) AS rk
            FROM documents
        )
        WHERE rk <= {GROUP_K}
        ORDER BY lang, source, rk
    """,
}


_N_SHARDS = 16


def shard_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-shuffle shard manifest: every document is assigned a
    shard by a deterministic hash permutation (first 8 hex chars of
    md5(doc_id) mod 16 — engine-independent, parallelism-invariant),
    and the plan reports per-shard size stats + the skew ratio vs the
    ideal uniform share. This is the write-side plan of the
    shuffle-into-shards stage every pretraining pipeline runs before
    sequence packing: shard = output file, skew ratio = the straggler
    predictor.

    100 TB shape: one scan + one 16-group partial agg; the assignment
    is a pure row function, so the real shuffle it plans (repartition
    by shard, write) stays hash-balanced and any re-run lands every
    doc in the same shard regardless of input partitioning.
    """
    d = _t(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long") % _N_SHARDS
    ).alias("shard")
    tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    per = (
        d.select(shard, tok.alias("n_tok"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    # ideal share via a window over the 16-row aggregate — a re-agg
    # frame would recompute the corpus scan (Catalyst does not reuse
    # the subplan), which is a second full pass at 100 TB
    ideal = F.avg("n_docs").over(Window.partitionBy())
    return (
        per.select(
            "shard", "n_docs", "n_tokens", "n_chars",
            F.round(F.col("n_docs") / ideal, 6).alias("skew_ratio"),
        )
        .orderBy("shard")
    )


QUERIES["shard_shuffle_plan"] = shard_shuffle_plan
ORACLE["shard_shuffle_plan"] = f"""
    WITH hashed AS (
        SELECT doc_id, text, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    assigned AS (
        SELECT CAST(({_WS_HEX_U}) AS BIGINT) % {_N_SHARDS} AS shard,
               len(string_split(regexp_replace(trim(lower(text)),
                   '\\s+', ' ', 'g'), ' ')) AS n_tok,
               n_chars
        FROM hashed
    ),
    per AS (
        SELECT shard, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM assigned GROUP BY shard
    ),
    tot AS (SELECT avg(n_docs) AS ideal FROM per)
    SELECT shard, n_docs, n_tokens, n_chars,
           round(n_docs / ideal, 6) AS skew_ratio
    FROM per, tot
    ORDER BY shard
"""
