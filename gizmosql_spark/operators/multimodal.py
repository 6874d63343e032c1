"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension tier (SURVEY §7 Phase 5). Images/audio/video are carried as
``binary`` columns with typed metadata; decode / feature-extraction run
as Arrow-batched Pandas functions via ``mapInPandas`` (the
vectorized-UDF slow path, used only where JVM expressions can't
express the semantics — per the UDF guidance in SURVEY §2C).

Image decode is REAL: pure-stdlib BMP + PNG codecs in
gizmosql_spark/imaging.py (all five PNG filters, zlib inflate). The
fixture has no true media blobs, so ``with_image_blob`` fabricates
deterministic per-document images whose pixel values are closed-form
functions of (doc_id, x, y) — which lets a plain-SQL DuckDB oracle
verify the decoded statistics exactly: the full encode→decode→
aggregate pipeline is differentially checked, not rows-only.
``with_blob`` (text bytes as payload) remains the generic
binary-column contract. PIL-style codecs (JPEG et al.) remain
env-gated in ``decode_image_external``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec libraries are absent in this container — decode is gated
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


def with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the payload as an opaque binary column + metadata
    (the BLOB ⇄ BinaryType contract, SURVEY §1.2)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain;charset=utf-8").alias("content_type"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: byte length + header bytes —
    pure JVM expressions, no Python."""
    b = with_blob(spark, sf_dir)
    return b.select(
        "doc_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.lower(F.substring(F.hex("payload"), 1, 8)).alias("header_hex"),
        "content_type",
    ).orderBy("doc_id")


def decode_image_external(payload: bytes):  # pragma: no cover - gated
    """Decode via an external codec library (JPEG/WebP/...). Gated:
    PIL is not installed in this container; PNG/BMP decode inline via
    gizmosql_spark.imaging instead."""
    if not _HAS_PIL:
        raise NotImplementedError("external image codecs unavailable")
    raise NotImplementedError("wire PIL decode here when codecs are available")


def with_image_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a fabricated image payload per row (PNG for even
    doc_id, BMP for odd; pixels are closed-form in (doc_id, x, y) —
    imaging.synth_image). Encoding runs partition-parallel in an
    Arrow-batched mapInPandas; at deployment this column is the real
    media blob read from storage."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("content_type", StringType()),
        ]
    )

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gizmosql_spark import imaging

        for pdf in it:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [imaging.synth_image(int(d)) for d in ids],
                    "content_type": [
                        "image/png" if d % 2 == 0 else "image/bmp"
                        for d in ids
                    ],
                }
            )

    # Fan the Python-boundary work out before the encode stage: the
    # documents scan is 2 tasks at bounded scale, so the pure-Python
    # PNG/BMP encode+decode chain above it ran 2-wide on a 32-core box
    # (profiled r12: features 1.04 s wall vs 0.05 s executor CPU — the
    # codec time lives in the Python workers, invisible to stage CPU).
    # The shuffled payload is doc_id alone (8 B/row); width rides the
    # session conf, which loader.table keys off input size (8 at
    # bounded dirs, launch width at scale) — same idiom as the r11
    # tokenize fanout (text._term_counts).
    d = _t(spark, sf_dir, "documents").select("doc_id")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return d.repartition(width, "doc_id").mapInPandas(_encode, schema)


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_px", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode + feature extraction: real PNG/BMP decode
    (imaging.decode_image) followed by per-channel statistics. Runs
    per partition; no driver-side data movement."""
    from gizmosql_spark import imaging

    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            px = imaging.decode_image(buf).astype("float64")
            h, w, _ = px.shape
            rows.append(
                {
                    "doc_id": doc_id,
                    "fmt": imaging.image_format(buf),
                    "width": w,
                    "height": h,
                    "n_px": h * w,
                    "mean_r": round(float(px[:, :, 0].mean()), 6),
                    "mean_g": round(float(px[:, :, 1].mean()), 6),
                    "mean_b": round(float(px[:, :, 2].mean()), 6),
                }
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "fmt", "width", "height", "n_px",
                     "mean_r", "mean_g", "mean_b"],
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-parallel image decode + feature extraction over binary
    payloads via mapInPandas (Arrow transfer, no per-row pickling).
    Differentially verified: the oracle reproduces every decoded
    statistic in closed form from (doc_id, x, y) arithmetic."""
    b = with_image_blob(spark, sf_dir)
    return b.mapInPandas(_feature_batches, FEATURE_SCHEMA).orderBy("doc_id")


PHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("phash", StringType()),
])


def _phash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched perceptual hash: REAL PNG/BMP decode, then the
    average-hash bit string — pixel luminance vs the image mean, in
    row-major order. All-integer compares (n*L > total), so the bits
    are exact on any engine."""
    import numpy as np

    from gizmosql_spark import imaging

    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            px = imaging.decode_image(bytes(payload)).astype("int64")
            h, w, _ = px.shape
            lum = px.sum(axis=2)
            total = int(lum.sum())
            n = h * w
            # vectorized per-pixel compare; ravel() is row-major, the
            # same (y, x) order as the nested loop it replaces. Exact:
            # lum entries are <= 765 (3 x 255), so lum * n stays inside
            # int64 for any image under ~1.2e16 pixels. The bit string
            # is built bytewise (0x30 | bit == ASCII '0'/'1'), not by
            # joining per-element strings.
            flat = lum.ravel() * np.int64(n) > total
            rows.append({
                "doc_id": int(doc_id),
                "phash": (flat.astype(np.uint8) + 48).tobytes().decode("ascii"),
            })
        yield pd.DataFrame(rows, columns=["doc_id", "phash"])


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup via perceptual hash (aHash): decode the real
    bytes, hash the luminance pattern, group identical hashes, keep
    the lowest doc_id — the image-pipeline analog of dedup_exact,
    with the decode stage differentially verified (the oracle derives
    every bit in closed form from the synth-pixel arithmetic).

    Scale shape: mapInPandas decode is partition-parallel over Arrow
    batches; the dedup is ONE hash shuffle on the 48-bit-max hash
    string. Hamming-near variants bucket on hash prefixes — the
    SimHash device, same code shape."""
    from pyspark.sql import Window

    b = with_image_blob(spark, sf_dir)
    ph = b.mapInPandas(_phash_batches, PHASH_SCHEMA)
    w = Window.partitionBy("phash")
    return (
        ph.withColumn("keeper", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper"))
        .select("doc_id", "phash", "keeper", "is_dup")
        .orderBy("doc_id")
    )


def doc_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: text rows (documents) against their vector
    rows (embeddings, vec_id = doc_id), aggregated per embedding label
    — the text×vector linkage a curation pipeline runs constantly.
    Equi-join on the id, per-label hash aggregate; the vector norm is a
    JVM higher-order fold."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>),"
            " x -> x * x), 0D, (acc, v) -> acc + v))"
        ).alias("norm"),
    )
    return (
        d.join(e, d["doc_id"] == e["vec_id"])
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg("norm"), 6).alias("avg_norm"),
        )
        .orderBy("label")
    )


_FRAME_BYTES = 16
_FRAME_STRIDE = 2

_FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("frame_sum", IntegerType()),
    StructField("first_byte", IntegerType()),
])


def _frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Build each doc's fake video container (header + fixed-size
    frames), then sample every _FRAME_STRIDE-th frame by slicing the
    REAL bytes — the frame-extraction plumbing a video pipeline runs
    (an actual codec slots in where the byte-slice arithmetic is)."""
    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n_frames = 4 + doc_id % 5
            payload = b"VID0" + bytes([n_frames])
            for f in range(n_frames):
                payload += bytes(
                    (doc_id * 31 + f * 17 + i * 7) % 256
                    for i in range(_FRAME_BYTES))
            # decode side: parse header, slice sampled frames
            assert payload[:4] == b"VID0"
            got_frames = payload[4]
            body = payload[5:]
            for f in range(0, got_frames, _FRAME_STRIDE):
                frame = body[f * _FRAME_BYTES:(f + 1) * _FRAME_BYTES]
                rows.append((doc_id, f, got_frames,
                             sum(frame), frame[0]))
        yield pd.DataFrame(
            rows, columns=[f.name for f in _FRAMES_SCHEMA.fields])


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: every
    _FRAME_STRIDE-th fixed-size frame is sliced out of the container
    bytes inside mapInPandas (Arrow batches, executor-side — the
    shape a real decoder plugs into). Frame bytes are closed-form in
    (doc_id, frame, offset), so the DuckDB oracle verifies the sliced
    bytes' statistics exactly."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200) \
        .select("doc_id")
    return (
        d.repartition(8, "doc_id")
        .mapInPandas(_frame_sample_batches, _FRAMES_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


_N_SAMPLES = 64

_AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", IntegerType()),
    StructField("rms", DoubleType()),
    StructField("n_zero_cross", IntegerType()),
    StructField("peak", IntegerType()),
])


def _audio_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Pack a deterministic 16-bit PCM buffer per doc, then decode the
    REAL bytes back (struct unpack) and extract the classic audio
    features — RMS energy, zero-crossing count, peak amplitude."""
    import math
    import struct as _struct

    for pdf in it:
        rows = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            samples = [((doc_id * 7 + i * 13) % 2048) - 1024
                       for i in range(_N_SAMPLES)]
            payload = b"PCM0" + _struct.pack(f"<{_N_SAMPLES}h", *samples)
            # decode side: header check + unpack
            assert payload[:4] == b"PCM0"
            got = _struct.unpack_from(f"<{_N_SAMPLES}h", payload, 4)
            rms = math.sqrt(sum(s * s for s in got) / _N_SAMPLES)
            zc = sum(1 for i in range(_N_SAMPLES - 1)
                     if got[i] * got[i + 1] < 0)
            rows.append((doc_id, _N_SAMPLES, round(rms, 6), zc,
                         max(abs(s) for s in got)))
        yield pd.DataFrame(
            rows, columns=[f.name for f in _AUDIO_SCHEMA.fields])


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style feature extraction over binary payloads: 16-bit PCM
    packed and unpacked inside mapInPandas; features (RMS,
    zero-crossings, peak) are closed-form in doc_id so the oracle
    verifies the byte round-trip exactly."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500) \
        .select("doc_id")
    return (
        d.repartition(8, "doc_id")
        .mapInPandas(_audio_feature_batches, _AUDIO_SCHEMA)
        .orderBy("doc_id")
    )


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "multimodal_frames": multimodal_frames,
    "multimodal_audio": multimodal_audio,
    "doc_embedding_stats": doc_embedding_stats,
}

ORACLE: dict[str, str] = {
    "multimodal_phash_dedup": """
        WITH dims AS (
            SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
            FROM documents
        ),
        px AS (
            SELECT d.doc_id, t.x, u.y,
                   ((7 * d.doc_id + 3 * t.x + 5 * u.y) % 256)
                   + ((11 * d.doc_id + t.x + 2 * u.y) % 256)
                   + ((13 * d.doc_id + 4 * t.x + u.y) % 256) AS L
            FROM dims d,
                 LATERAL (SELECT unnest(range(0, d.w))) t(x),
                 LATERAL (SELECT unnest(range(0, d.h))) u(y)
        ),
        tot AS (
            SELECT doc_id, sum(L) AS total, count(*) AS n
            FROM px GROUP BY doc_id
        ),
        bits AS (
            SELECT p.doc_id,
                   string_agg(CASE WHEN p.L * t.n > t.total
                                   THEN '1' ELSE '0' END, ''
                              ORDER BY p.y, p.x) AS phash
            FROM px p JOIN tot t USING (doc_id)
            GROUP BY p.doc_id
        )
        SELECT doc_id, phash,
               min(doc_id) OVER (PARTITION BY phash) AS keeper,
               doc_id <> min(doc_id) OVER (PARTITION BY phash) AS is_dup
        FROM bits
        ORDER BY doc_id
    """,
    "multimodal_frames": f"""
        WITH docs AS (
            SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS n_frames
            FROM documents WHERE doc_id < 200
        ),
        frames AS (
            SELECT doc_id, n_frames, CAST(f AS INT) AS frame_idx
            FROM docs, LATERAL (
                SELECT unnest(range(0, n_frames, {_FRAME_STRIDE}))) AS t(f)
        )
        SELECT doc_id, frame_idx, n_frames,
               CAST(list_sum(list_transform(range(0, {_FRAME_BYTES}),
                    i -> (doc_id * 31 + frame_idx * 17 + i * 7) % 256))
                    AS INT) AS frame_sum,
               CAST((doc_id * 31 + frame_idx * 17) % 256 AS INT)
                   AS first_byte
        FROM frames
        ORDER BY doc_id, frame_idx
    """,
    "multimodal_audio": f"""
        WITH s AS (
            SELECT doc_id,
                   list_transform(range(0, {_N_SAMPLES}),
                       i -> ((doc_id * 7 + i * 13) % 2048) - 1024) AS v
            FROM documents WHERE doc_id < 500
        )
        SELECT doc_id,
               CAST({_N_SAMPLES} AS INT) AS n_samples,
               round(sqrt(list_sum(list_transform(v, x -> CAST(x * x AS DOUBLE)))
                          / {_N_SAMPLES}), 6) AS rms,
               CAST(list_sum(list_transform(range(1, {_N_SAMPLES}),
                    i -> CASE WHEN v[i] * v[i + 1] < 0 THEN 1 ELSE 0 END))
                    AS INT) AS n_zero_cross,
               CAST(list_max(list_transform(v, x -> abs(x))) AS INT) AS peak
        FROM s
        ORDER BY doc_id
    """,
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               lower(substr(hex(encode(text)), 1, 8)) AS header_hex,
               'text/plain;charset=utf-8' AS content_type
        FROM documents
        ORDER BY doc_id
    """,
    # multimodal_features: the fabricated images' pixels are closed-form
    # in (doc_id, x, y), so the oracle reproduces every decoded statistic
    # without touching an image — a hash match proves the PNG/BMP
    # encode→decode→aggregate pipeline end to end.
    "multimodal_features": """
        WITH g AS (SELECT gx.x AS x, gy.y AS y
                   FROM generate_series(0, 7) gx(x),
                        generate_series(0, 5) gy(y))
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
               CAST(4 + d.doc_id % 5 AS INTEGER) AS width,
               CAST(3 + d.doc_id % 4 AS INTEGER) AS height,
               CAST(count(*) AS BIGINT) AS n_px,
               round(avg((7 * d.doc_id + 3 * g.x + 5 * g.y) % 256), 6) AS mean_r,
               round(avg((11 * d.doc_id + g.x + 2 * g.y) % 256), 6) AS mean_g,
               round(avg((13 * d.doc_id + 4 * g.x + g.y) % 256), 6) AS mean_b
        FROM documents d
        JOIN g ON g.x < 4 + d.doc_id % 5 AND g.y < 3 + d.doc_id % 4
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
    "doc_embedding_stats": """
        WITH e AS (
            SELECT vec_id, label,
                   sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x * x))) AS norm
            FROM embeddings
        )
        SELECT e.label,
               count(*) AS n,
               round(avg(d.n_chars), 6) AS avg_chars,
               round(avg(e.norm), 6) AS avg_norm
        FROM documents d JOIN e ON e.vec_id = d.doc_id
        GROUP BY e.label
        ORDER BY e.label
    """,
}
