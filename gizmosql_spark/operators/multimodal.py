"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension tier (SURVEY §7 Phase 5). Images/audio/video are carried as
``binary`` columns with typed metadata; decode / feature-extraction run
as Arrow-batched Pandas functions via ``mapInPandas`` (the
vectorized-UDF slow path, used only where JVM expressions can't
express the semantics — per the UDF guidance in SURVEY §2C).

The container has no image/audio codecs, so actual decode is STUBBED:
``decode_image``/``decode_audio`` raise ``NotImplementedError`` behind
an import-try, and ``extract_features`` computes a deterministic
byte-histogram "embedding" so the Spark-side plumbing — schema,
partition-parallel mapInPandas, Arrow batch shape — is real and tested.

The fixture has no true media blobs; ``with_blob`` materializes the
documents' UTF-8 bytes as the stand-in payload column.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

N_FEATURES = 8

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


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload. STUB: codec libs are not installed in
    this environment; the real implementation would decode via PIL
    inside the mapInPandas batches below."""
    if not _HAS_PIL:
        raise NotImplementedError("image codecs unavailable in this container")
    raise NotImplementedError("wire PIL decode here when codecs are available")


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extractor: deterministic 8-bin byte
    histogram, L1-normalized — the stand-in for a real decoder+encoder.
    Runs per partition; no driver-side data movement."""
    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            hist = [0] * N_FEATURES
            for byte in buf:
                hist[byte % N_FEATURES] += 1
            total = float(sum(hist)) or 1.0
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(buf),
                    "features": [h / total for h in hist],
                }
            )
        yield pd.DataFrame(rows, columns=["doc_id", "n_bytes", "features"])


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-parallel feature extraction over binary payloads via
    mapInPandas (Arrow transfer, no per-row pickling). Non-SQL
    expressible → rows-only correctness check (no oracle entry)."""
    b = with_blob(spark, sf_dir)
    return b.mapInPandas(_feature_batches, FEATURE_SCHEMA).orderBy("doc_id")


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


QUERIES = {
    "multimodal_meta": multimodal_meta,
    "multimodal_features": multimodal_features,
    "doc_embedding_stats": doc_embedding_stats,
}

ORACLE: dict[str, str] = {
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               lower(substr(hex(encode(text)), 1, 8)) AS header_hex,
               'text/plain;charset=utf-8' AS content_type
        FROM documents
        ORDER BY doc_id
    """,
    # multimodal_features: intentionally no oracle (mapInPandas feature
    # extraction is not SQL-expressible) → driver rows-only check.
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
