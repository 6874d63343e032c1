"""Interactive SQL shell over the Engine.

The reference ships a CLI client (/root/reference/src/client/, ~4.5k
LoC over Flight SQL). This is the Spark-native equivalent: a thin REPL
speaking to the in-process Engine — same statement surface (SET
engine.*, ENGINE_* pseudo-functions, engine_settings(), read_parquet()
table functions, KILL SESSION), plus psql-style meta commands.

Usage:
    python -m gizmosql_spark.cli                 # interactive
    python -m gizmosql_spark.cli -c "SELECT 1"   # one-shot
    python -m gizmosql_spark.cli -f script.sql   # script (';'-split)
"""

from __future__ import annotations

import argparse
import sys
import time

from gizmosql_spark.dialect import split_statements

_MAX_CELL = 60
_MAX_ROWS = 200


def format_rows(columns: list[str], rows: list) -> str:
    """Aligned text table (no external deps)."""
    if not rows:
        return "(0 rows)"

    def cell(v) -> str:
        s = "NULL" if v is None else str(v)
        return s if len(s) <= _MAX_CELL else s[: _MAX_CELL - 1] + "…"

    shown = rows[:_MAX_ROWS]
    grid = [[cell(v) for v in row] for row in shown]
    widths = [
        max(len(columns[i]), *(len(r[i]) for r in grid)) if grid else len(columns[i])
        for i in range(len(columns))
    ]
    sep = "-+-".join("-" * w for w in widths)
    out = [
        " | ".join(c.ljust(w) for c, w in zip(columns, widths)),
        sep,
    ]
    out += [" | ".join(c.ljust(w) for c, w in zip(r, widths)) for r in grid]
    note = f"({len(rows)} rows" + (f", {_MAX_ROWS} shown" if len(rows) > _MAX_ROWS else "")
    return "\n".join(out) + f"\n{note})"


def run_statement(engine, session_id: str, sql: str) -> str:
    """Execute one statement and render its result."""
    res = engine.execute_sql(session_id, sql)
    if res.kind == "query" and res.df is not None:
        rows = engine.collect(session_id, res)
        return format_rows(res.df.columns, [tuple(r) for r in rows])
    if res.kind == "update":
        n = res.affected_rows
        return f"OK ({n} rows affected)" if n is not None else "OK"
    return "OK " + ", ".join(f"{k}={v}" for k, v in res.info.items())


def _meta(engine, session_id: str, line: str) -> str | None:
    cmd = line.strip()
    if cmd in (r"\q", "exit", "quit"):
        return None
    if cmd == r"\d":
        st = engine.sessions[session_id]
        names = [t.name for t in st.spark.catalog.listTables()]
        return "\n".join(sorted(names)) or "(no tables)"
    if cmd == r"\settings":
        return run_statement(engine, session_id, "SELECT * FROM engine_settings()")
    return f"unknown meta command: {cmd} (try \\d, \\settings, \\q)"


def repl(engine, session_id: str, stdin=None, stdout=None) -> None:
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    buf = ""
    prompt = "sql> "
    stdout.write("gizmosql-spark shell — \\q to quit\n")
    while True:
        stdout.write(prompt if not buf else "...> ")
        stdout.flush()
        line = stdin.readline()
        if not line:
            break
        if not buf and line.strip().startswith(("\\", "exit", "quit")):
            out = _meta(engine, session_id, line)
            if out is None:
                break
            stdout.write(out + "\n")
            continue
        buf += line
        if ";" not in line:
            continue
        for stmt in split_statements(buf):
            t0 = time.perf_counter()
            try:
                out = run_statement(engine, session_id, stmt)
                out += f"  [{time.perf_counter() - t0:.3f}s]"
            except Exception as exc:
                out = f"ERROR: {exc}"
            stdout.write(out + "\n")
        buf = ""


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gizmosql-spark-cli")
    p.add_argument("-c", "--command", help="run one statement and exit")
    p.add_argument("-f", "--file", help="run a ';'-separated SQL script and exit")
    p.add_argument("--role", default="admin", help="session role (default admin)")
    args = p.parse_args(argv)

    from gizmosql_spark.engine import Engine

    engine = Engine()
    sid = engine.create_session(role=args.role)
    try:
        if args.command:
            print(run_statement(engine, sid, args.command))
            return 0
        if args.file:
            with open(args.file) as fh:
                for stmt in split_statements(fh.read()):
                    print(run_statement(engine, sid, stmt))
            return 0
        repl(engine, sid)
        return 0
    finally:
        engine.close_session(sid)


if __name__ == "__main__":
    sys.exit(main())
