"""Similarity search over embedding vectors.

Extension tier (SURVEY §7 Phase 5): approximate-nearest-neighbor and
embedding-cosine near-duplicate detection over the ``embeddings``
fixture (array<float> of dim 64).

- **brute-force cosine top-k**: exact baseline; the query vector joins
  as a broadcast 1-row frame (no collect) and the dot product runs in
  JVM higher-order functions (zip_with + aggregate) — whole-stage
  codegen, no Python.
- **random-hyperplane LSH buckets**: the scale path — 8 deterministic
  hyperplanes hash each vector to an 8-bit bucket; at 100 TB the
  bucket is the blocking key for candidate generation (expected
  ~n/256 per bucket), turning O(n²) scoring into a per-bucket join.
- **embedding near-dup pairs**: all-pairs cosine ≥ threshold (exact
  ground truth; the LSH-bucket variant bounds it at scale).

Hyperplane weights are a deterministic integer xorshift-multiply mix
over the flattened (plane, dim) index, computed identically in Spark
and DuckDB (exact BIGINT arithmetic both sides — no RNG, no engine
hash functions, no float divergence). A plain LCG over consecutive
indices is NOT usable here: its lattice structure makes consecutive
weight vectors nearly parallel (measured |cos| up to 0.996 between
"independent" planes), collapsing the signature space into a handful
of hot buckets — the round-3 perf finding. The mix's planes measure
|cos| ≤ ~0.4, giving near-ideal bucket balance on gaussian data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader

N_PLANES = 8
DIM = 64
NEARDUP_THRESHOLD = 0.4
TOP_K = 10

# cosine(a, b) over array<double> columns, computed with JVM
# higher-order functions; sequential left-to-right fold matches the
# DuckDB oracle's list_sum accumulation.
_COS_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate(transform({a}, x -> x * x), 0D, (acc, v) -> acc + v))"
    " * sqrt(aggregate(transform({b}, x -> x * x), 0D, (acc, v) -> acc + v)))"
)


def _mix_spark(k_expr: str) -> str:
    """Spark SQL expression for the xorshift-multiply weight of global
    index ``k_expr`` (a BIGINT expression): two 31-bit multiply/mask
    rounds with xorshift mixing between them — nonlinear, so weight
    vectors of consecutive planes are uncorrelated (unlike an LCG,
    whose lattice makes them near-parallel). Single-use lambda
    ``transform(array(x), h -> …)[0]`` serves as a let-binding so each
    intermediate is computed once. All values stay < 2^31 before each
    multiply, so products stay < 2^63 — exact in BIGINT."""
    return (
        f"transform(array((({k_expr} + 1L) * 2654435761L) % 2147483648L),"
        f" h1 -> transform(array(((h1 ^ shiftright(h1, 13))"
        f" * 2246822519L) % 2147483648L),"
        f" h3 -> (((h3 ^ shiftright(h3, 16)) % 1000000L) / 1000000.0)"
        f" - 0.5)[0])[0]"
    )


def _mix_duck(k_expr: str) -> str:
    """The identical mix in DuckDB SQL (xor()/>> instead of ^ /
    shiftright; 1-element list_transform as the let-binding). Integer
    ops are exact in both engines, so the weights are bit-identical."""
    return (
        f"list_transform([(({k_expr} + 1) * 2654435761) % 2147483648],"
        f" h1 -> list_transform([(xor(h1, h1 >> 13)"
        f" * 2246822519) % 2147483648],"
        f" h3 -> ((xor(h3, h3 >> 16) % 1000000) / 1000000.0)"
        f" - 0.5)[1])[1]"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with the vector cast to array<double> once, so all
    downstream arithmetic is double (portable vs the oracle)."""
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label"
    )


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a query vector (vec_id 0), broadcast as a
    1-row frame — the pattern scales to any query batch size."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    cos = F.expr(_COS_EXPR.format(a="emb", b="q_emb"))
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(TOP_K)
    )


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: sign pattern over 8 deterministic
    hyperplanes → 8-char bucket id per vector. Weights come from the
    xorshift-multiply mix (see module docstring) so the planes are
    actually independent."""
    e = _emb(spark, sf_dir)
    bits = []
    for j in range(N_PLANES):
        w = (
            f"transform(sequence(0, {DIM - 1}),"
            f" d -> {_mix_spark(f'({j}L * {DIM} + d)')})"
        )
        dot = f"aggregate(zip_with(emb, {w}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        bits.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
    bucket = F.expr("concat(" + ", ".join(bits) + ")")
    return e.select("vec_id", bucket.alias("bucket")).orderBy("vec_id")


# Block count trades fan-out volume against per-task GEMM footprint:
# each vector ships to (B+1) block pairs, so fewer blocks shrink the
# shuffle (A/B at sf0.1/2k vectors: B=4 ~1.4 s vs B=8 ~2.3 s), but a
# block pair materializes an (n/B)² float64 matrix per task — beyond
# ~2.5k rows/block the temporaries hit hundreds of MB and task times
# turn erratic (measured 17-62 s swings at sf1/20k vectors with B=4).
# _n_blocks sizes B from the corpus so both regimes get their best;
# at real scale the same rule bounds a block pair to executor memory
# (tasks = B(B+1)/2 grow quadratically, fan-out only linearly).
N_BLOCKS = 4          # floor (small fixtures)
_BLOCK_TARGET_ROWS = 2500


def _n_blocks(n_vectors: int) -> int:
    return max(N_BLOCKS, -(-n_vectors // _BLOCK_TARGET_ROWS))

_PAIR_SCHEMA = "a_id long, b_id long, cos_sim double"


def _block_neardup_fn(key, pdf):
    """One block-pair task: numpy GEMM over unit vectors → pairs ≥
    threshold. Runs fully executor-side; at 100 TB each block pair is
    one task and block size is chosen to fit executor memory."""
    import numpy as np
    import pandas as pd

    ba, bb = key
    left = pdf[pdf["side"] == 0]
    right = pdf[pdf["side"] == 1]
    if len(left) == 0 or len(right) == 0:
        return pd.DataFrame(columns=["a_id", "b_id", "cos_sim"])
    A = np.vstack(left["unit"].to_numpy())
    B = np.vstack(right["unit"].to_numpy())
    M = A @ B.T
    ai, bi = np.nonzero(np.round(M, 6) >= NEARDUP_THRESHOLD)
    a_ids = left["vec_id"].to_numpy()[ai]
    b_ids = right["vec_id"].to_numpy()[bi]
    cos = np.round(M[ai, bi], 6)
    if ba == bb:
        # same vectors on both sides: keep each unordered pair once
        mask = a_ids < b_ids
        a_ids, b_ids, cos = a_ids[mask], b_ids[mask], cos[mask]
    else:
        # distinct blocks: each unordered pair appears once; normalize
        # orientation (the lower vec_id may live in the higher block)
        lo = np.minimum(a_ids, b_ids)
        b_ids = np.maximum(a_ids, b_ids)
        a_ids = lo
    return pd.DataFrame({"a_id": a_ids, "b_id": b_ids, "cos_sim": cos})


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-dup via blocked GEMM.

    Vectors are unit-normalized once (JVM expressions), then fanned out
    to block pairs and multiplied with numpy inside applyInPandas — the
    canonical distributed brute-force: O(n²/B²) tasks, BLAS inside each.
    Exact semantics (same result as the SQL oracle); use
    ann_lsh_buckets as the blocking key to go sub-quadratic at scale."""
    e = _emb(spark, sf_dir)
    n_blocks = _n_blocks(loader.row_count(sf_dir, "embeddings"))
    norm = F.expr("sqrt(aggregate(transform(emb, x -> x * x), 0D, (acc, v) -> acc + v))")
    unit = F.expr("transform(emb, x -> x / _norm)")
    ev = (
        e.withColumn("_norm", norm)
        .withColumn("unit", unit)
        .withColumn("blk", (F.col("vec_id") % n_blocks).cast("int"))
        .select("vec_id", "unit", "blk")
    )
    # fan each vector out to its block pairs with one explode (a vector
    # in block k is the left side of pairs (k, b>=k) and the right side
    # of pairs (a<=k, k)) — one pass over the data, no joins
    fan = F.expr(
        f"concat("
        f" transform(sequence(blk, {n_blocks - 1}),"
        f"  b -> struct(blk AS ba, b AS bb, 0 AS side)),"
        f" transform(sequence(0, blk),"
        f"  a -> struct(a AS ba, blk AS bb, 1 AS side)))"
    )
    both = ev.select(
        "vec_id", "unit", F.explode(fan).alias("p")
    ).select("vec_id", "unit", "p.ba", "p.bb", "p.side")
    return (
        both.groupBy("ba", "bb")
        .applyInPandas(_block_neardup_fn, _PAIR_SCHEMA)
        .orderBy("a_id", "b_id")
    )


N_CENTROIDS = 8
N_PROBE = 2


#: per-session cache of the bounded IVF model rows: the query vector
#: (vec_id 0) + the N_CENTROIDS centroid vectors, deterministic per
#: immutable fixture dir. Same in-process bounded-collect class as the
#: knn probe cache (r12 §9) — a cold JVM rebuilds it in warmup.
_IVF_MODEL_CACHE: dict[str, tuple[list, list, list]] = {}


def _lit_vec_sql(vals: list) -> str:
    """array<double> literal as ONE SQL fragment. repr() is the
    shortest round-trip decimal and CAST(string AS DOUBLE) parses
    correctly rounded (Double.parseDouble), so the literal array holds
    the exact IEEE doubles the collect returned — and one F.expr call
    replaces ~64 per-element F.lit Py4J round trips (measured 1.7 s of
    per-call plan-build time at 8 centroids x 64 dims)."""
    return ("array(" + ",".join(
        f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals) + ")")


def _ivf_model(spark: SparkSession, sf_dir: str) -> tuple[list, list, list]:
    """(q_emb, [(cent_id, cemb), ...], probe_ids) from ONE bounded
    9-row scan; probe selection runs the SAME Spark expressions as the
    old joined form over a local 8-row frame (engine rounding and tie
    rules — no Python float comparisons)."""
    got = _IVF_MODEL_CACHE.get(sf_dir)
    if got is None:
        from pyspark.sql import Window

        e = _emb(spark, sf_dir)
        rows = (
            e.filter((F.col("vec_id") >= 0)
                     & (F.col("vec_id") <= N_CENTROIDS))
            .select("vec_id", "emb").collect())
        q_emb = next(list(r["emb"]) for r in rows if r["vec_id"] == 0)
        cents = sorted((int(r["vec_id"]), list(r["emb"]))
                       for r in rows if r["vec_id"] >= 1)
        centdf = spark.createDataFrame(
            [(cid, vals) for cid, vals in cents],
            "cent_id bigint, cemb array<double>")
        qcos = F.round(F.expr(_COS_EXPR.format(a="q_emb", b="cemb")), 6)
        wq = Window.orderBy(F.desc("q_sim"), "cent_id")
        probe_ids = [
            r["cent_id"]
            for r in centdf.withColumn("q_emb", F.expr(_lit_vec_sql(q_emb)))
            .select("cent_id", qcos.alias("q_sim"))
            .withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= N_PROBE)
            .collect()
        ]
        got = (q_emb, cents, probe_ids)
        _IVF_MODEL_CACHE[sf_dir] = got
    return got


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: inverted-file search over centroid cells.

    Vectors are bucketed by nearest centroid (the inverted lists); the
    query probes its N_PROBE nearest cells and scores exactly only
    inside them. At 100 TB the lists are the partitioning key, so a
    probe touches ~n_probe/k of the data instead of all of it —
    ann_bruteforce_topk is the exact baseline this approximates.

    r12 shape (guide §2/§3): centroids are a BOUNDED 8-row model
    (exactly the tiny broadcast table a sampled k-means fit yields at
    scale), so the nearest-cell assignment is an inline argmax over
    literal-centroid cosines instead of an e×8 broadcast-join fanout +
    full-width row_number window + self-join back on vec_id. The old
    form shuffled |corpus|×8 rows of 64-dim arrays through the window
    exchange and re-joined the corpus to itself; now the corpus is
    scanned ONCE with zero exchanges below the final top-k. Arithmetic
    is unchanged: the same fold expression over the same doubles
    (collected literals round-trip exactly), same round(.,6), same
    (sim desc, cent_id asc) tie-break — strict-differential green.
    Probe selection runs the SAME Spark expressions over a local 8-row
    frame (engine rounding/tie rules, no Python float paths)."""
    q_emb, cents, probe_ids = _ivf_model(spark, sf_dir)
    e = _emb(spark, sf_dir)
    # inline nearest-centroid argmax: struct compare = (sim desc, then
    # max(-cent_id) = min cent_id) — the row_number tie-break verbatim.
    # One F.expr per call: the whole argmax is a single SQL fragment.
    sims_sql = ",".join(
        "named_struct('s', round("
        + _COS_EXPR.format(a="emb", b=_lit_vec_sql(vals))
        + f", 6), 'nc', {-cid}L)"
        for cid, vals in cents
    )
    best = F.expr(f"array_max(array({sims_sql}))")
    cos = F.round(F.expr(_COS_EXPR.format(a="emb", b="q_emb")), 6)
    return (
        e.filter(F.col("vec_id") != 0)
        .withColumn("cent_id", -best["nc"])
        .filter(F.col("cent_id").isin(probe_ids))
        .withColumn("q_emb", F.expr(_lit_vec_sql(q_emb)))
        .select("vec_id", "cent_id", cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(TOP_K)
    )


def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@k of the IVF search against the
    exact brute-force top-k — the metric every embedding pipeline
    tracks when trading probe count against accuracy. Both sides are
    the existing operators; the comparison is a top-k-sized left join
    (driver never sees the vectors)."""
    exact = ann_bruteforce_topk(spark, sf_dir).select("vec_id")
    approx = ann_ivf(spark, sf_dir).select("vec_id") \
        .withColumn("hit", F.lit(1))
    return (
        exact.join(approx, "vec_id", "left")
        .agg(
            F.lit(TOP_K).cast("int").alias("k"),
            F.count("hit").alias("n_hits"),
            F.round(F.count("hit") / F.lit(float(TOP_K)), 6)
            .alias("recall_at_k"),
        )
    )


N_QUERY_BATCH = 3
BATCH_TOP_K = 5


def ann_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN: top-k neighbors for a whole batch of query vectors
    in one plan — queries broadcast against the corpus, ranked with a
    per-query window. The per-query LIMIT generalizes to arbitrary
    batch sizes (this is how a retrieval pipeline scores a shard)."""
    from pyspark.sql import Window

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERY_BATCH).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    cos = F.round(F.expr(_COS_EXPR.format(a="emb", b="q_emb")), 6)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BATCH_TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rank")
        .orderBy("q_id", "rank")
    )


_KNN_K = 5
_KNN_PROBE_MOD = 20  # every 20th vector is a held-out probe...
#: ...capped at a fixed probe-set size: an eval sample is a CONSTANT,
#: not a corpus fraction — without the cap the probe count grows with
#: the corpus and the broadcast join does |probes|·n work, which the
#: r5 sf1 fixture measured as 68x wall for 10x data (100x work). With
#: it the scan side alone grows and the op scales linearly.
_KNN_PROBE_CAP = _KNN_PROBE_MOD * 100  # probe ids live in [0, cap)
#: (id(spark), sf_dir) -> collected probe rows (bounded: <= cap/mod).
_KNN_PROBES: dict[tuple, list] = {}


def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation: predict each held-out probe's label
    by majority vote of its 5 cosine nearest neighbors (ties break on
    the smaller label), report accuracy per true label — the
    embedding-quality eval every retrieval/classification pipeline
    runs before trusting a vector store.

    Scale shape: the probe matrix is a sample-sized driver constant
    (the cap above bounds it at any corpus size); scoring runs as
    mapInPandas over the corpus scan — whole Arrow batches against
    the probe matrix in vectorized numpy (guide §4.2: distribution by
    Spark, per-batch math in native code), with an exact-margin
    per-partition top-k so only ~|partitions|·|probes|·k candidate
    rows ever leave the scan (map-side top-k: the shuffle carries
    candidates, never the |probes|·n pair frame). Vote counting and
    the argmax ride per-probe windows on that candidate frame. At
    100 TB the corpus side swaps to the IVF tier — same tail.

    Float contract: the numpy accumulation walks dimensions in index
    order (one fused vector op per dimension), reproducing the JVM
    sequential fold BIT-EXACTLY (IEEE ops in identical order), and
    rounding stays in Spark — so the r11-vectorized scores are
    identical to the r10 expression-fold scores, not merely close.
    The 1e-6 pruning margin covers round(,6)'s maximum displacement,
    so no row that could enter the rounded top-k is ever dropped."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    e = _emb(spark, sf_dir)
    # sample-sized (≤ cap/mod rows) and deterministic per fixture dir:
    # the probe collect was a full corpus-scan job PER INVOCATION —
    # cache it per session (r12; the bounded-scalar class of the
    # boundaries cache, rebuilt by every cold run's warmup)
    probe_rows = _KNN_PROBES.get((id(spark), sf_dir))
    if probe_rows is None:
        probe_rows = e.filter(
            (F.col("vec_id") % _KNN_PROBE_MOD == 0)
            & (F.col("vec_id") < _KNN_PROBE_CAP)
        ).select("vec_id", "emb", "label").collect()
        _KNN_PROBES[(id(spark), sf_dir)] = probe_rows
    q_ids = np.array([r["vec_id"] for r in probe_rows], dtype=np.int64)
    q_mat = np.array([r["emb"] for r in probe_rows], dtype=np.float64)

    def _seq_norms(m: "np.ndarray") -> "np.ndarray":
        # sum of squares in dimension order — the JVM fold's order
        acc = np.zeros(m.shape[0])
        for j in range(m.shape[1]):
            acc = acc + m[:, j] * m[:, j]
        return np.sqrt(acc)

    q_unit = q_mat / _seq_norms(q_mat)[:, None]
    n_k = _KNN_K

    def _topk_frames(vec_ids, labels, vals_by_probe):
        # per-probe exact-margin top-k over whatever rows are passed
        # in; the margin keeps every row that could enter the ROUNDED
        # top-k (1e-6 = round(,6)'s max displacement) — over-keeping
        # only, never dropping a potential member
        frames = []
        for pi in range(q_unit.shape[0]):
            cand = np.flatnonzero(vec_ids != q_ids[pi])
            if cand.size == 0:
                continue
            vals = vals_by_probe[cand, pi]
            k = min(n_k, cand.size)
            kth = np.partition(vals, vals.size - k)[vals.size - k]
            keep = cand[vals >= kth - 1e-6]
            frames.append(pd.DataFrame({
                "q_id": np.full(keep.size, q_ids[pi]),
                "vec_id": vec_ids[keep].astype(np.int64),
                "label": labels[keep].astype(np.int32),
                "raw": vals_by_probe[keep, pi],
            }))
        return frames

    def _score(batches):
        # r12 (ADVICE r11): accumulate the per-BATCH top-k supersets
        # and emit ONE per-PARTITION top-k at generator end, so the
        # shuffle carries ~|partitions|·|probes|·k rows as the
        # docstring claims (the r11 form emitted per batch — larger by
        # the batches-per-partition factor). Exactness: a partition
        # top-k row beats all but k-1 rows of its own batch, so it
        # survives the batch filter (batch kth ≤ partition kth ⇒ the
        # batch margin keeps a superset); re-applying the same margin
        # logic on the merged superset yields the per-partition
        # margin-top-k. Memory: the accumulator holds ≤|batches|·
        # |probes|·(k+ties) pruned rows, not raw batches.
        acc = []
        for pdf in batches:
            if pdf.empty:
                continue
            emat = np.array(list(pdf["emb"]), dtype=np.float64)
            eunit = emat / _seq_norms(emat)[:, None]
            # dot in dimension order (bit-exact vs the zip_with fold)
            s = np.zeros((emat.shape[0], q_unit.shape[0]))
            for j in range(emat.shape[1]):
                s = s + eunit[:, j][:, None] * q_unit[:, j][None, :]
            frames = _topk_frames(
                pdf["vec_id"].to_numpy(), pdf["label"].to_numpy(), s)
            if frames:
                acc.append(pd.concat(frames))
        if not acc:
            return
        merged = pd.concat(acc, ignore_index=True)
        # rebuild a rows×probes value matrix view of the pruned rows:
        # group by probe and re-apply the same kth-margin filter
        out = []
        for pi in range(q_unit.shape[0]):
            sub = merged[merged["q_id"] == q_ids[pi]]
            if sub.empty:
                continue
            vals = sub["raw"].to_numpy()
            k = min(n_k, vals.size)
            kth = np.partition(vals, vals.size - k)[vals.size - k]
            out.append(sub[vals >= kth - 1e-6])
        if out:
            yield pd.concat(out, ignore_index=True)

    scored = e.select("vec_id", "label", "emb").mapInPandas(
        _score, schema="q_id long, vec_id long, label int, raw double")
    true_map = F.create_map(*[
        x for r in probe_rows
        for x in (F.lit(int(r["vec_id"])), F.lit(int(r["label"])))])
    w_rank = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), "vec_id")
    neighbors = (
        scored
        .withColumn("cos_sim", F.round("raw", 6))
        .withColumn("true_label", F.element_at(true_map, F.col("q_id")))
        .select("q_id", "true_label", "label", "cos_sim", "vec_id")
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _KNN_K)
    )
    votes = neighbors.groupBy("q_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes"))
    w_vote = Window.partitionBy("q_id").orderBy(
        F.desc("n_votes"), "label")
    preds = (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select("q_id", "true_label",
                F.col("label").alias("pred_label"))
    )
    return (
        preds.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1)
                .otherwise(0)
            ).alias("n_correct"),
            F.round(
                F.avg(
                    F.when(F.col("pred_label") == F.col("true_label"), 1.0)
                    .otherwise(0.0)
                ),
                4,
            ).alias("accuracy"),
        )
        .orderBy("true_label")
    )


#: Banded hyperplane-LSH structure (mirrors the MinHash tier's
#: band × row design, dedup.py): a pair is a candidate if it collides
#: in ANY band. Bands buy recall (P[candidate] = 1 − (1 − p^r)^B for
#: per-plane agreement p); per-band plane count r buys precision AND
#: the scale law — see _lsh_planes_per_band.
LSH_BANDS = 4

#: log2 of the expected per-band RANDOM-collision bucket size: with
#: r = ceil(log2 n) − c planes, a band has 2^r ≥ n/2^c buckets, so
#: expected random bucket size stays ≈ 2^c as the corpus grows —
#: candidate work is O(B · n · 2^c), linear in n, instead of the
#: n²/2^r quadratic a FIXED plane count degrades to. True near-dup
#: clusters still share buckets at any r (near-identical vectors
#: agree on almost every hyperplane) — that floor is the answer set
#: itself, not avoidable blocking cost.
LSH_BUCKET_LOG2 = 3


def _lsh_planes_per_band(n: int) -> int:
    """Per-band plane count for a corpus of ``n`` vectors: grows as
    ceil(log2 n) − c so the per-band bucket count tracks n/2^c. At
    100 TB (n ≈ 10^10) this is ~30 planes/band; recall for a target
    agreement p is then tuned with the band count
    (B ≈ ln(1/miss) / p^r), not by letting buckets go quadratic."""
    import math

    return max(4, math.ceil(math.log2(max(n, 2))) - LSH_BUCKET_LOG2)


def _mix_py(k: int) -> float:
    """The identical xorshift-multiply mix in exact Python integers —
    bit-for-bit the values _mix_spark/_mix_duck produce (all
    intermediates < 2^63, Python ints are exact)."""
    h1 = ((k + 1) * 2654435761) % 2147483648
    h3 = ((h1 ^ (h1 >> 13)) * 2246822519) % 2147483648
    return (((h3 ^ (h3 >> 16)) % 1000000) / 1000000.0) - 0.5


def _band_signatures(spark: SparkSession, sf_dir: str, r: int):
    """(vec_id, band, bucket) banded hyperplane signatures in ONE
    vectorized Arrow pass. The inlined-SQL form of this (B·r plane
    weights × 64 dims as nested transform lambdas) cost ~6 s of
    Catalyst analysis + codegen alone at B=4, r=8 — compile time, not
    data time. Here the plane matrix is built once in Python (exact
    integer mix, bit-identical weights) and the per-plane dot is a
    strict left fold over dims VECTORIZED over rows (acc += X[:,d]·w[d]
    for d = 0..63), so every float add happens in the same order as
    the Spark/DuckDB ``aggregate(zip_with(...))`` fold and the signs —
    hence the buckets — are bit-identical to the oracle's."""
    import numpy as np
    import pandas as pd

    planes = np.array([
        [_mix_py(p * DIM + d) for d in range(DIM)]
        for p in range(LSH_BANDS * r)
    ])

    def _sign_buckets(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf["emb"]])
            acc = np.zeros((len(X), LSH_BANDS * r))
            for d in range(DIM):
                acc += X[:, d:d + 1] * planes[:, d]
            bits = acc >= 0
            out = {"vec_id": np.repeat(pdf["vec_id"].to_numpy(),
                                       LSH_BANDS),
                   "band": np.tile(np.arange(LSH_BANDS), len(X)),
                   "bucket": [
                       "".join("1" if bits[i, b * r + j] else "0"
                               for j in range(r))
                       for i in range(len(X)) for b in range(LSH_BANDS)]}
            yield pd.DataFrame(out)

    return (
        _emb(spark, sf_dir).select("vec_id", "emb")
        .mapInPandas(_sign_buckets, "vec_id long, band int, bucket string")
    )


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic embedding near-dup: banded hyperplane-LSH as the
    blocking key, exact cosine verification on candidates — the
    100 TB path that embedding_neardup (exact blocked GEMM) bounds.

    Scale design (the round-3 review's fix): B = 4 independent bands,
    each an r-bit hyperplane signature with r = ceil(log2 n) − 3, so
    per-band bucket count grows with the corpus and expected
    random-collision bucket size stays ~8 — candidate pairs are
    O(B·n), not n²/2^r at fixed r. Candidates dedup across bands
    BEFORE scoring, so each unique pair is verified once. Vector
    norms are precomputed in the persisted frame, making per-pair
    verification a single zip_with dot product over the same float
    algebra as the oracle (dot / (norm_a · norm_b)).

    Recall law (honest numbers): P[candidate] = 1 − (1 − p^r)^B with
    p = 1 − θ/π per plane. The fixture's low threshold (cos ≥ 0.4,
    θ ≈ 66°, p ≈ 0.64) gives ~11% at r=8, B=4 — LSH is weak at weak
    similarity by construction; production near-dup thresholds
    (cos ≥ 0.9, p ≥ 0.86) give ~80% at the same cost, and recall at
    any fixed similarity is tuned by raising B (cost stays O(B·n)).
    Measured at sf0.1: candidates 491k → 37k after replacing the LCG
    weights (whose lattice correlation made planes near-parallel and
    buckets degenerate) with the xorshift mix and scoring ids-only
    candidates post-dedup; wall 6.2 s → ~1 s after moving the B·r
    signature projection from inlined SQL lambdas (≈6 s of Catalyst
    analysis/codegen at B=4, r=8) into one vectorized Arrow pass
    (_band_signatures — bit-identical buckets, see its docstring)."""
    n = loader.row_count(sf_dir, "embeddings")
    r = _lsh_planes_per_band(n)

    # persist the signature frame: both join branches read it, so the
    # B·r-plane projection runs once (at scale the signatures are
    # materialized as table-layout columns and reused across queries);
    # ids+buckets only — the 64-double vectors never ride the
    # blocking join
    e = loader.keyed_persist(
        spark, f"similarity.emb_sigs:{sf_dir}:{LSH_BANDS}x{r}",
        lambda: _band_signatures(spark, sf_dir, r))
    # candidate pairs dedup across bands BEFORE scoring — a true
    # near-dup collides in most bands, so scoring post-dedup does
    # ~B× less verification work (measured 3.2 s → ~1.4 s at sf0.1)
    a = e.select(F.col("vec_id").alias("a_id"), "band", "bucket")
    b = e.select(F.col("vec_id").alias("b_id"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    vecs = loader.keyed_persist(
        spark, f"similarity.emb_norms:{sf_dir}",
        lambda: _emb(spark, sf_dir).withColumn(
            "norm",
            F.expr("sqrt(aggregate(transform(emb, x -> x * x), 0D,"
                   " (acc, v) -> acc + v))")))
    va = vecs.select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"),
        F.col("norm").alias("a_norm"))
    vb = vecs.select(
        F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"),
        F.col("norm").alias("b_norm"))
    cos = F.round(
        F.expr("aggregate(zip_with(a_emb, b_emb, (x, y) -> x * y), 0D,"
               " (acc, v) -> acc + v)") / (F.col("a_norm") * F.col("b_norm")),
        6,
    )
    return (
        cand.join(va, "a_id").join(vb, "b_id")
        .select("a_id", "b_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= NEARDUP_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


_PAIR_LAGS = (1, 17, 101)


def cosine_pair_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space geometry diagnostic: the cosine-similarity
    distribution over a deterministic pair sample (lagged pairs
    vec_id ↔ vec_id+k for k ∈ {1, 17, 101}), reported as a 20-bin
    histogram over [-1, 1] — the hubness / anisotropy check run
    before trusting any ANN index on a new embedding model.

    Scale shape: the lag fan-out is a per-row explode (3 probes per
    vector), the pair join is an integer equi-join, and the histogram
    is one bounded partial agg. Cosines use the same sequential JVM
    fold as the oracle's list_sum, so bin assignment is bit-exact."""
    e = _emb(spark, sf_dir)
    probes = e.select(
        F.col("vec_id").alias("aid"),
        F.col("emb").alias("ea"),
        F.explode(
            F.array(*[F.lit(k) for k in _PAIR_LAGS])).alias("k"),
    ).withColumn("bid", F.col("aid") + F.col("k"))
    b = e.select(F.col("vec_id").alias("bid"), F.col("emb").alias("eb"))
    cos = F.expr(_COS_EXPR.format(a="ea", b="eb"))
    binned = (
        probes.join(b, "bid")
        .select(
            F.least(F.lit(19), F.floor((cos + 1) * 10)).alias("bin"),
            cos.alias("c"),
        )
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("c"), 6).alias("avg_cos"),
        )
        .select(
            "bin",
            (F.round(F.col("bin") / 10.0 - 1, 1)).alias("bin_lo"),
            "n_pairs",
            "avg_cos",
        )
        .orderBy("bin")
    )


QUERIES = {
    "cosine_pair_hist": cosine_pair_hist,
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "embedding_neardup_lsh": embedding_neardup_lsh,
    "ann_lsh_buckets": ann_lsh_buckets,
    "ann_ivf": ann_ivf,
    "ann_topk_batch": ann_topk_batch,
    "embedding_neardup": embedding_neardup,
    "ann_recall": ann_recall,
    "knn_label_eval": knn_label_eval,
}

_COS_SQL = (
    "list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, {dim} + 1),"
    " i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)

_LSH_BIT_SQL = " || ".join(
    f"CASE WHEN list_sum(list_transform(range(1, {DIM} + 1),"
    f" i -> CAST(embedding[i] AS DOUBLE) *"
    f" {_mix_duck(f'({j} * {DIM} + (i - 1))')}))"
    f" >= 0 THEN '1' ELSE '0' END"
    for j in range(N_PLANES)
)

ORACLE: dict[str, str] = {
    "cosine_pair_hist": f"""
        WITH pairs AS (
            SELECT a.vec_id AS aid, a.embedding AS ea, b.embedding AS eb
            FROM embeddings a
            CROSS JOIN (VALUES (1), (17), (101)) k(k)
            JOIN embeddings b ON b.vec_id = a.vec_id + k.k
        ), cosv AS (
            SELECT {_COS_SQL.format(a="ea", b="eb", dim=DIM)} AS c
            FROM pairs
        ), binned AS (
            SELECT CAST(least(19, floor((c + 1) * 10)) AS BIGINT) AS bin,
                   c
            FROM cosv
        )
        SELECT bin, round(bin / 10e0 - 1, 1) AS bin_lo,
               count(*) AS n_pairs,
               round(avg(c), 6) AS avg_cos
        FROM binned GROUP BY bin ORDER BY bin
    """,
    "ann_bruteforce_topk": f"""
        SELECT e.vec_id,
               round({_COS_SQL.format(a="e.embedding", b="q.embedding", dim=DIM)}, 6)
                   AS cos_sim
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "ann_lsh_buckets": f"""
        SELECT vec_id, {_LSH_BIT_SQL} AS bucket
        FROM embeddings
        ORDER BY vec_id
    """,
    "embedding_neardup_lsh": f"""
        WITH params AS (
            SELECT greatest(4, CAST(ceil(log2(count(*))) AS INT)
                               - {LSH_BUCKET_LOG2}) AS r
            FROM embeddings
        ), b AS (
            SELECT e.vec_id, e.embedding, t.band,
                   array_to_string(list_transform(range(0, p.r), j ->
                     CASE WHEN list_sum(list_transform(range(1, {DIM} + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE) *
                            {_mix_duck(f'((t.band * p.r + j) * {DIM} + (i - 1))')}
                     )) >= 0 THEN '1' ELSE '0' END), '') AS bucket
            FROM embeddings e
            CROSS JOIN params p
            CROSS JOIN (VALUES (0), (1), (2), (3)) t(band)
        ), cand AS (
            SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
            FROM b a JOIN b b2 ON a.band = b2.band
                 AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
        ), scored AS (
            SELECT c.a_id, c.b_id,
                   round({_COS_SQL.format(
                       a="ea.embedding", b="eb.embedding", dim=DIM)}, 6)
                       AS cos_sim
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.a_id
            JOIN embeddings eb ON eb.vec_id = c.b_id
        )
        SELECT a_id, b_id, cos_sim FROM scored
        WHERE cos_sim >= {NEARDUP_THRESHOLD}
        ORDER BY a_id, b_id
    """,
    "ann_topk_batch": f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb
            FROM embeddings WHERE vec_id < {N_QUERY_BATCH}),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   round({_COS_SQL.format(a="e.embedding", b="q.q_emb", dim=DIM)}, 6)
                       AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.q_id)
        SELECT q_id, vec_id, cos_sim,
               CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rank
        FROM scored
        QUALIFY rank <= {BATCH_TOP_K}
        ORDER BY q_id, rank
    """,
    "ann_ivf": f"""
        WITH cent AS (
            SELECT vec_id AS cent_id, embedding AS cemb
            FROM embeddings WHERE vec_id BETWEEN 1 AND {N_CENTROIDS}),
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id, c.cent_id,
                   round({_COS_SQL.format(a="e.embedding", b="c.cemb", dim=DIM)}, 6)
                       AS cent_sim
            FROM embeddings e CROSS JOIN cent c),
        assign AS (
            SELECT vec_id, cent_id FROM (
                SELECT vec_id, cent_id,
                       row_number() OVER (PARTITION BY vec_id
                           ORDER BY cent_sim DESC, cent_id) AS rn
                FROM scored) WHERE rn = 1),
        probes AS (
            SELECT cent_id FROM (
                SELECT c.cent_id,
                       row_number() OVER (ORDER BY
                           round({_COS_SQL.format(a="q.q_emb", b="c.cemb", dim=DIM)}, 6)
                               DESC, c.cent_id) AS rn
                FROM cent c CROSS JOIN q) WHERE rn <= {N_PROBE})
        SELECT e.vec_id, a.cent_id,
               round({_COS_SQL.format(a="e.embedding", b="q.q_emb", dim=DIM)}, 6)
                   AS cos_sim
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id
        JOIN probes p ON p.cent_id = a.cent_id
        CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "embedding_neardup": f"""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round({_COS_SQL.format(a="a.embedding", b="b.embedding", dim=DIM)}, 6)
                   AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND round({_COS_SQL.format(a="a.embedding", b="b.embedding", dim=DIM)}, 6)
              >= {NEARDUP_THRESHOLD}
        ORDER BY a_id, b_id
    """,
}

# recall@k composes the two searches above as CTEs (kept after the
# dict literal so it can reference the finished entries)
ORACLE["ann_recall"] = f"""
    WITH exact AS ({ORACLE["ann_bruteforce_topk"]}),
    approx AS ({ORACLE["ann_ivf"]})
    SELECT CAST({TOP_K} AS INT) AS k,
           CAST(count(a.vec_id) AS BIGINT) AS n_hits,
           round(count(a.vec_id) / {float(TOP_K)}, 6) AS recall_at_k
    FROM exact e LEFT JOIN approx a ON e.vec_id = a.vec_id
"""

ORACLE["knn_label_eval"] = f"""
    WITH probes AS (
        SELECT vec_id AS q_id, embedding AS q_emb, label AS true_label
        FROM embeddings
        WHERE vec_id % {_KNN_PROBE_MOD} = 0 AND vec_id < {_KNN_PROBE_CAP}
    ), neighbors AS (
        SELECT * FROM (
        SELECT q_id, true_label, label, cos_sim, vec_id,
               row_number() OVER (PARTITION BY q_id
                   ORDER BY cos_sim DESC, vec_id) AS rank
        FROM (
            SELECT p.q_id, p.true_label, e.label,
                   round({_COS_SQL.format(a="e.embedding", b="p.q_emb", dim=DIM)}, 6)
                       AS cos_sim,
                   e.vec_id
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.q_id))
        WHERE rank <= {_KNN_K}
    ), votes AS (
        SELECT q_id, true_label, label, count(*) AS n_votes
        FROM neighbors GROUP BY 1, 2, 3
    ), preds AS (
        SELECT q_id, true_label, label AS pred_label
        FROM (
            SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY n_votes DESC, label) AS vr
            FROM votes)
        WHERE vr = 1
    )
    SELECT true_label,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(avg(CASE WHEN pred_label = true_label
                     THEN 1.0 ELSE 0.0 END), 4) AS accuracy
    FROM preds GROUP BY true_label
    ORDER BY true_label
"""
