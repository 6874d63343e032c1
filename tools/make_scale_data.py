"""Scale the TPC-H fixture tables up by key-shifted replication.

The sandbox ships sf0.1 as its largest fixture, but the fixed-overhead
question (VERDICT r3 "Next round" #5) needs a data point where per-query
work dominates Spark's ~0.2-0.4 s scheduling floor. This tool builds an
sf-N-equivalent directory from sf0.1 by stacking F key-shifted copies:
every key column is offset by ``replica * (max_key + 1)`` CONSISTENTLY
across tables (l_orderkey with o_orderkey, o_custkey with c_custkey,
l_partkey with p_partkey, l_suppkey with s_suppkey), so referential
integrity, join fan-outs, and per-replica value distributions — hence
query selectivities — are preserved exactly. region/nation are shared
dimensions (every replica references the same 25 nations, as a real
multi-tenant warehouse would).

This is a PERFORMANCE fixture, not a correctness oracle input: the
driver's correctness tier stays on the untouched /root/testdata dirs.

Usage: python tools/make_scale_data.py [--factor 10] [--dst .scaledata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.1"

#: table -> {column: key-space} ; key-space names share one offset base
KEY_COLS: dict[str, dict[str, str]] = {
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
}

DIM_TABLES = ["region", "nation"]

_ALPHANUM = ("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")


def register_char_perms(con: duckdb.DuckDBPyConnection,
                        factor: int) -> None:
    """Register ``char_perms(i, tgt)``: one seeded character
    PERMUTATION per replica (identity for replica 0), used as the
    translate() target for the documents text.

    A Caesar rotation (the r7 fixture) is injective per replica but the
    family repeats: replica i with i % 26 == 0 maps letters identically
    to replica 0, so any factor > 26 silently reintroduces exact
    cross-replica duplicates — the factor² blowup the map exists to
    remove. Seeded Fisher-Yates permutations are the same idea with a
    practically unbounded family (26! letter maps): every permutation
    is injective (within-replica equality structure exact), the lower-
    and upper-case maps mirror each other (case-folding fingerprints
    behave as under rotation), and a uniqueness check rejects the
    astronomically unlikely seed collision outright."""
    import random

    lower = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    rows: list[tuple[int, str]] = []
    seen: set[str] = set()
    for i in range(factor):
        if i == 0:
            tgt = _ALPHANUM
        else:
            rng = random.Random(0xC0FFEE ^ (i * 0x9E3779B1))
            lo = list(lower)
            rng.shuffle(lo)
            dg = list(digits)
            rng.shuffle(dg)
            tgt = "".join(lo) + "".join(lo).upper() + "".join(dg)
        if tgt in seen:
            raise SystemExit(
                f"seeded permutation collision at replica {i}")
        seen.add(tgt)
        rows.append((i, tgt))
    con.execute(
        "CREATE OR REPLACE TEMP TABLE char_perms (i BIGINT, tgt VARCHAR)")
    con.executemany("INSERT INTO char_perms VALUES (?, ?)", rows)


def key_bases(con: duckdb.DuckDBPyConnection, src: str) -> dict[str, int]:
    """One offset base per key space = max over every column that
    draws from it (order keys appear in both orders and lineitem)."""
    bases: dict[str, int] = {}
    for table, cols in KEY_COLS.items():
        for col, space in cols.items():
            (mx,) = con.execute(
                f"SELECT max({col}) FROM "
                f"read_parquet('{src}/{table}.parquet')").fetchone()
            bases[space] = max(bases.get(space, 0), int(mx) + 1)
    return bases


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--dst",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scaledata", "sf1"))
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    bases = key_bases(con, args.src)
    print("key offset bases:", bases)
    register_char_perms(con, args.factor)

    for table in DIM_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{table}.parquet'))"
            f" TO '{args.dst}/{table}.parquet' (FORMAT PARQUET)")
        print(table, "copied")

    for table, cols in KEY_COLS.items():
        repl = ", ".join(
            f"{col} + i * {bases[space]} AS {col}"
            for col, space in cols.items())
        con.execute(
            f"COPY (SELECT * REPLACE ({repl})"
            f" FROM read_parquet('{args.src}/{table}.parquet')"
            f" CROSS JOIN range({args.factor}) t(i))"
            f" TO '{args.dst}/{table}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(
            f"SELECT count(*) FROM"
            f" read_parquet('{args.dst}/{table}.parquet')").fetchone()
        print(table, "x", args.factor, "->", n, "rows")

    # --- extension tables (r5): scaled so each tier's WORK scales the
    # way a real 10x corpus would, not the way naive copies would —
    # exact replicas of documents would square the dup-pair counts
    # inside each duplicate group, and exact embedding copies would
    # square LSH bucket candidate joins. Salting/jitter keeps the
    # per-replica structure identical (linear scaling), which is the
    # honest perf fixture.
    ext_sql = {
        # per-replica CHARACTER PERMUTATION (the text analog of the
        # embedding rotation below): replica i maps letters/digits
        # through a seeded permutation (see register_char_perms — the
        # r7 Caesar rotation generalized past factor 26). An injective
        # character map preserves every within-replica equality —
        # duplicate groups, shingle sets, n-gram Jaccard similarities
        # are EXACTLY the original corpus's — while cross-replica
        # n-grams share no alphanumeric token. The r5 fixture only
        # PREPENDED a salt token, so all interior n-grams still
        # matched across replicas and the n-gram/shingle dedup tiers
        # did factor² of the original work (dedup_ngram_jaccard
        # measured 91x for 10x data; honest replica blocking is ~10x).
        # Lengths are preserved, so n_chars carries over unchanged.
        "documents": f"""
            SELECT doc_id + i * {{base}} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE translate(text, '{_ALPHANUM}', p.tgt)
                   END AS text,
                   lang, source, n_chars
            FROM read_parquet('{{src}}/documents.parquet')
            CROSS JOIN range({{factor}}) t(i)
            JOIN char_perms p USING (i)
        """,
        # per-replica dimension ROTATION: an isometry, so every
        # replica's internal cosine structure equals the original's
        # exactly, while cross-replica cosines are uncorrelated. (An
        # additive jitter small enough to preserve structure makes the
        # replicas genuine near-duplicates of the originals — the
        # first sf1 cut measured the near-dup tier at 21x for 10x
        # data because each vector honestly had 9 new near-dups.)
        # shift clamped into [1, dim-1] (dim read from the vector, not
        # assumed): a plain `i % dim` shift is 0 for every dim-th
        # replica — an exact copy, reintroducing the quadratic
        # near-dup blowup the rotation exists to avoid. Composed with
        # a per-replica single-coordinate sign flip (a reflection —
        # also an isometry, so internal cosine structure is still
        # exact) the replica family stays collision-free up to
        # factor = dim*(dim-1) instead of dim-1
        "embeddings": """
            SELECT vec_id + i * {base} AS vec_id,
                   list_transform(
                     CASE WHEN i = 0 THEN embedding
                          ELSE embedding[((i - 1) % greatest(len(embedding) - 1, 1))
                                         + 2:]
                               || embedding[1:((i - 1)
                                               % greatest(len(embedding) - 1, 1)) + 1]
                     END,
                     (x, j) -> CASE
                         WHEN i > 0 AND j = (((i - 1)
                                              // greatest(len(embedding) - 1, 1))
                                             % len(embedding)) + 1
                         THEN -x ELSE x END) AS embedding,
                   label
            FROM read_parquet('{src}/embeddings.parquet')
            CROSS JOIN range({factor}) t(i)
        """,
        # time-shifted replicas: windows/sessions/watermark structure
        # repeats per replica instead of 10x-ing per-key state
        "events": """
            SELECT event_id + i * {base} AS event_id,
                   ts + INTERVAL (i * 40) DAY AS ts,
                   user_id + i * {ubase} AS user_id,
                   event_type, value, props
            FROM read_parquet('{src}/events.parquet')
            CROSS JOIN range({factor}) t(i)
        """,
    }
    ext_bases = {}
    for t, col in (("documents", "doc_id"), ("embeddings", "vec_id"),
                   ("events", "event_id")):
        (mx,) = con.execute(
            f"SELECT max({col}) FROM"
            f" read_parquet('{args.src}/{t}.parquet')").fetchone()
        ext_bases[t] = int(mx) + 1
    (umx,) = con.execute(
        "SELECT max(user_id) FROM"
        f" read_parquet('{args.src}/events.parquet')").fetchone()
    for t, sql in ext_sql.items():
        q = sql.format(src=args.src, factor=args.factor,
                       base=ext_bases[t], ubase=int(umx) + 1)
        con.execute(
            f"COPY ({q}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)")
        (n,) = con.execute(
            f"SELECT count(*) FROM"
            f" read_parquet('{args.dst}/{t}.parquet')").fetchone()
        print(t, "x", args.factor, "->", n, "rows")


if __name__ == "__main__":
    main()
