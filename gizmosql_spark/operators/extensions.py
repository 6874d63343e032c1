"""User-defined extension mechanisms: UDTF + grouped-agg UDAF.

The reference's extensibility story is DuckDB extensions
(INSTALL/LOAD, admin-gated —
/root/reference/src/duckdb/admin_command_guard.cpp:315-319); SURVEY
§2C maps our engine's equivalent to Spark's user-defined function
tiers. The scalar-Pandas-UDF and mapInPandas tiers are exercised all
over this repo (geo codec, imaging, multimodal); this module
demonstrates the remaining two tiers as oracle-verified operators:

- **UDTF** (table function, Spark 4 ``@udtf``): one input row → many
  output rows, the lateral-join extension point.
- **grouped-aggregate Pandas UDF** (UDAF): an Arrow-vectorized custom
  aggregate inside a plain ``groupBy``.

Both are Python — the slow path by design (that is what the
extension seam is for); the demos bound their input and the oracles
reproduce the math in closed form.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gizmosql_spark.operators import loader
from gizmosql_spark.operators.text import _NORM_SQL, _norm

_CHUNK = 16  # tokens per chunk


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return loader.table(spark, sf_dir, name)


def udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking as a UDTF: each document row expands
    to ceil(n_tokens/16) chunk rows (idx, token count, md5 of the
    chunk text) — the row-expanding extension point a lateral join
    consumes. Bounded to 100 docs: UDTFs are row-at-a-time Python,
    the demo is the API seam, not a hot path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_md5 string")
    class ChunkDoc:
        def eval(self, norm_text: str):
            import hashlib

            words = norm_text.split(" ")
            for i in range(0, len(words), _CHUNK):
                chunk = " ".join(words[i:i + _CHUNK])
                yield (
                    i // _CHUNK,
                    len(words[i:i + _CHUNK]),
                    hashlib.md5(chunk.encode()).hexdigest(),
                )

    spark.udtf.register("chunk_doc", ChunkDoc)
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", _norm(F.col("text")).alias("norm_text"))
    )
    d.createOrReplaceTempView("docs_udtf")
    return spark.sql("""
        SELECT doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5
        FROM docs_udtf, LATERAL chunk_doc(norm_text) AS c
        ORDER BY doc_id, chunk_idx
    """)


def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-mean document length per source via a grouped-agg
    Pandas UDF — the custom-aggregate extension point, Arrow-
    vectorized (one numpy reduction per group, not per-row Python)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(_norm(F.col("text")), " ")).cast("double")
    lens = d.select("source", n_tokens.alias("n"))
    # Spark disallows mixing a group-agg Pandas UDF with built-in
    # aggregates in one agg() — two source-keyed aggs, joined (both
    # frames are #sources-sized)
    gm = lens.groupBy("source").agg(
        F.round(geomean(F.col("n")), 6).alias("geomean_tokens"))
    counts = lens.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return gm.join(counts, "source").orderBy("source")


QUERIES = {
    "udtf_chunks": udtf_chunks,
    "udaf_geomean": udaf_geomean,
}

ORACLE = {
    # closed-form chunk reconstruction: list_slice over the word list
    "udtf_chunks": f"""
        WITH words AS (
            SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
            FROM documents WHERE doc_id < 100
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(least((i + 1) * {_CHUNK}, len(w)) - i * {_CHUNK} AS INT)
                   AS n_tokens,
               md5(array_to_string(
                   w[i * {_CHUNK} + 1 : (i + 1) * {_CHUNK}], ' '))
                   AS chunk_md5
        FROM words,
             LATERAL (SELECT unnest(range(0,
                 CAST(ceil(len(w) / {_CHUNK}.0) AS INT)))) AS t(i)
        ORDER BY doc_id, chunk_idx
    """,
    # geometric mean = exp(avg(ln)) in closed form
    "udaf_geomean": """
        SELECT source,
               round(exp(avg(ln(len(string_split(
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                   ' '))))), 6) AS geomean_tokens,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
}


def information_schema_tables(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog metadata exercised as a *query*: the fixture tables
    listed through the engine's DoGetTables path (catalog.get_tables,
    the analog of the reference's information_schema.tables query —
    /root/reference/src/duckdb/duckdb_server.cpp:692-745).

    Vocabulary normalization for the differential gate: the fixtures
    are TEMP VIEWS in the Spark session and plain VIEWS in the DuckDB
    oracle session, so Spark's 'LOCAL TEMPORARY' maps to 'VIEW' —
    the same normalization the Flight SQL table-type filter applies
    (catalog.get_table_types exposes both vocabularies). Non-fixture
    names (memory-sink views, sink tables from streaming queries) are
    filtered out on both sides so the result is session-independent.
    """
    import os

    from gizmosql_spark import catalog as cat

    # register through the loader's cached frames (a fresh
    # spark.read.parquet per table re-lists files + re-reads footers:
    # ~1.8 s for the 10 fixtures, vs ~0 warm through the cache)
    for name in cat.FIXTURE_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            loader.table(spark, sf_dir, name).createOrReplaceTempView(name)
    fixtures = [t for t in cat.FIXTURE_TABLES]
    return (
        cat.get_tables(spark)
        .filter(F.col("table_name").isin(fixtures))
        .select(
            "table_name",
            F.when(F.col("table_type") == "LOCAL TEMPORARY", "VIEW")
            .otherwise(F.col("table_type")).alias("table_type"),
        )
        .orderBy("table_name")
    )


QUERIES["information_schema_tables"] = information_schema_tables
ORACLE["information_schema_tables"] = """
    SELECT table_name, table_type
    FROM information_schema.tables
    WHERE table_name IN ('region', 'nation', 'customer', 'supplier',
                         'part', 'orders', 'lineitem', 'events',
                         'documents', 'embeddings')
    ORDER BY table_name
"""
