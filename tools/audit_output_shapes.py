"""Audit every batch query's OUTPUT SCHEMA for driver-comparator
safety (VERDICT r11 item 1): the official driver's canonicalizer
(pandas ``sort_values`` over the result frame) raises ``TypeError:
unhashable type: 'list'`` on any column whose values are Python lists
— i.e. any Spark ``array<...>`` column (and, by the same mechanism,
``map``/``struct`` columns, which arrive as dicts/Rows).  That is how
`inverted_index` became r11's one red row.

Usage:  python tools/audit_output_shapes.py [sf_dir]
Prints one line per query with a non-scalar output column, then a
summary. Streaming queries are skipped (their outputs are flat
scalar frames by construction and instantiating the live tier is
expensive); their schemas are pinned in windows.py.
"""

from __future__ import annotations

import sys

from pyspark.sql import types as T


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from gizmosql_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("audit-output-shapes")
    qs = entrymod.queries()
    bad: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        if name.startswith("stream"):
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # build error — report, don't die
            errs[name] = repr(e)[:120]
            continue
        cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType,
                          (T.ArrayType, T.MapType, T.StructType))
        ]
        if cols:
            bad[name] = cols
    for name, cols in sorted(bad.items()):
        print(f"NONSCALAR {name}: {', '.join(cols)}")
    for name, err in sorted(errs.items()):
        print(f"BUILD_ERROR {name}: {err}")
    print(f"# audited={sum(1 for n in qs if not n.startswith('stream'))} "
          f"nonscalar={len(bad)} errors={len(errs)}")


if __name__ == "__main__":
    main()
