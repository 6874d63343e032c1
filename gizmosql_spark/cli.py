"""Interactive SQL shell over the Engine or a Flight server.

The reference ships a full CLI client (/root/reference/src/client/:
shell_loop.cpp, command_processor.cpp — dot-commands;
output_renderer.cpp — BOX/TABLE/CSV/TABS/JSON/JSONLINES/MARKDOWN/LINE
modes :1067-1090; flight_connection.cpp — the wire path). This is the
Spark-native equivalent, stdlib-only:

- same statement surface (SET engine.*, ENGINE_* pseudo-functions,
  engine_settings()/engine_query_log()/engine_access_log(), KILL
  SESSION, read_parquet() table functions);
- dot-commands mirroring the reference's set: .mode .headers .maxrows
  .maxwidth .nullvalue .separator .timer .echo .bail .output .once
  .read .tables .schema .describe .catalogs .show .last .export_last
  .prompt .help .quit (plus the legacy ``\\d``-style aliases);
- output modes: table, csv, tabs, json, jsonlines, markdown, line;
- line-edit history via readline when the terminal has it;
- ``--uri grpc://host:port`` connects over Arrow Flight instead of
  spinning an in-process engine — the same client/server split as the
  reference.

Usage:
    python -m gizmosql_spark.cli                 # interactive, in-process
    python -m gizmosql_spark.cli -c "SELECT 1"   # one-shot
    python -m gizmosql_spark.cli -f script.sql   # script (';'-split)
    python -m gizmosql_spark.cli --uri grpc://127.0.0.1:8815 \
        --user u --password p                    # over Flight
"""

from __future__ import annotations

import argparse
import csv as _csv
import io
import json
import sys
import time
from dataclasses import dataclass, field

from gizmosql_spark.dialect import split_statements

_MAX_CELL = 60
_MAX_ROWS = 200


@dataclass
class ShellConfig:
    mode: str = "table"
    headers: bool = True
    maxrows: int = _MAX_ROWS
    maxwidth: int = _MAX_CELL
    nullvalue: str = "NULL"
    separator: str = ","
    timer: bool = False
    echo: bool = False
    bail: bool = False
    prompt: str = "sql> "
    outfile: str | None = None  # .output (sticky)
    once_file: str | None = None  # .once (next result only)
    last: tuple[list[str], list] | None = field(default=None, repr=False)


MODES = ("table", "csv", "tabs", "json", "jsonlines", "markdown", "line")


def _cell(v, cfg: ShellConfig) -> str:
    s = cfg.nullvalue if v is None else str(v)
    if cfg.maxwidth and len(s) > cfg.maxwidth:
        s = s[: cfg.maxwidth - 1] + "…"
    return s


def render(columns: list[str], rows: list, cfg: ShellConfig | None = None) -> str:
    """Render a result set in the configured output mode."""
    cfg = cfg or ShellConfig()
    shown = rows[: cfg.maxrows] if cfg.maxrows else rows
    if cfg.mode in ("csv", "tabs"):
        buf = io.StringIO()
        w = _csv.writer(
            buf, delimiter="\t" if cfg.mode == "tabs" else cfg.separator,
            lineterminator="\n")
        if cfg.headers:
            w.writerow(columns)
        for r in shown:
            w.writerow(["" if v is None else v for v in r])
        return buf.getvalue().rstrip("\n")
    if cfg.mode == "json":
        return json.dumps(
            [dict(zip(columns, r)) for r in shown], default=str, indent=1)
    if cfg.mode == "jsonlines":
        return "\n".join(
            json.dumps(dict(zip(columns, r)), default=str) for r in shown)
    if cfg.mode == "line":
        out = []
        for i, r in enumerate(shown):
            if i:
                out.append("")
            width = max((len(c) for c in columns), default=0)
            out += [f"{c.rjust(width)} = {_cell(v, cfg)}"
                    for c, v in zip(columns, r)]
        return "\n".join(out) or "(0 rows)"
    # table / markdown
    if not rows:
        return "(0 rows)"
    grid = [[_cell(v, cfg) for v in r] for r in shown]
    widths = [
        max(len(columns[i]), *(len(r[i]) for r in grid)) if grid
        else len(columns[i])
        for i in range(len(columns))
    ]
    if cfg.mode == "markdown":
        out = []
        if cfg.headers:
            out.append("| " + " | ".join(
                c.ljust(w) for c, w in zip(columns, widths)) + " |")
            out.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
        out += ["| " + " | ".join(
            c.ljust(w) for c, w in zip(r, widths)) + " |" for r in grid]
        return "\n".join(out)
    sep = "-+-".join("-" * w for w in widths)
    out = []
    if cfg.headers:
        out += [" | ".join(c.ljust(w) for c, w in zip(columns, widths)), sep]
    out += [" | ".join(c.ljust(w) for c, w in zip(r, widths)) for r in grid]
    note = f"({len(rows)} rows" + (
        f", {len(shown)} shown" if len(rows) > len(shown) else "")
    return "\n".join(out) + f"\n{note})"


def format_rows(columns: list[str], rows: list) -> str:
    """Aligned text table (compat shim over render())."""
    return render(columns, rows, ShellConfig())


# --- connections ------------------------------------------------------


class EngineConnection:
    """In-process execution against an Engine session."""

    def __init__(self, engine, session_id: str):
        self.engine = engine
        self.session_id = session_id

    def run(self, sql: str) -> tuple[list[str], list, str | None]:
        res = self.engine.execute_sql(self.session_id, sql)
        if res.kind == "query" and res.df is not None:
            rows = self.engine.collect(self.session_id, res)
            return res.df.columns, [tuple(r) for r in rows], None
        if res.kind == "update":
            n = res.affected_rows
            return [], [], (f"OK ({n} rows affected)" if n is not None else "OK")
        return [], [], "OK " + ", ".join(
            f"{k}={v}" for k, v in res.info.items())

    def tables(self) -> list[str]:
        st = self.engine.sessions[self.session_id]
        return sorted(t.name for t in st.spark.catalog.listTables())

    def catalogs(self) -> list[str]:
        st = self.engine.sessions[self.session_id]
        return sorted(c.name for c in st.spark.catalog.listCatalogs())

    def close(self) -> None:
        self.engine.close_session(self.session_id)


class FlightConnection:
    """Client-side execution over a gizmosql-spark Flight server (the
    reference's flight_connection.cpp role)."""

    def __init__(self, uri: str, username: str = "", password: str = ""):
        import base64

        import pyarrow.flight as flight

        self._flight = flight
        self.client = flight.FlightClient(uri)
        headers = []
        if username:
            cred = base64.b64encode(
                f"{username}:{password}".encode()).decode()
            headers.append((b"authorization", f"Basic {cred}".encode()))
        self.opts = flight.FlightCallOptions(headers=headers)
        self.session = self._action("create_session", {})["session"]

    def _action(self, name: str, body: dict) -> dict:
        results = list(self.client.do_action(
            self._flight.Action(name, json.dumps(body).encode()),
            options=self.opts))
        return json.loads(results[0].body.to_pybytes()) if results else {}

    def run(self, sql: str) -> tuple[list[str], list, str | None]:
        desc = self._flight.FlightDescriptor.for_command(json.dumps(
            {"type": "statement_query", "session": self.session,
             "sql": sql}).encode())
        info = self.client.get_flight_info(desc, options=self.opts)
        table = self.client.do_get(
            info.endpoints[0].ticket, options=self.opts).read_all()
        cols = table.column_names
        rows = [tuple(d[c] for c in cols) for d in table.to_pylist()]
        if cols == ["affected_rows"] and len(rows) == 1:
            return [], [], f"OK ({rows[0][0]} rows affected)"
        return cols, rows, None

    def tables(self) -> list[str]:
        return sorted(
            f.descriptor.path[-1].decode()
            for f in self.client.list_flights(options=self.opts))

    def catalogs(self) -> list[str]:
        cols, rows, _ = self.run("SELECT current_catalog() AS c")
        return [r[0] for r in rows]

    def close(self) -> None:
        try:
            self._action("close_session", {"session": self.session})
        finally:
            self.client.close()


# --- shell ------------------------------------------------------------

_HELP = """\
.mode MODE          output mode: table csv tabs json jsonlines markdown line
.headers on|off     column headers in table/csv output
.maxrows N          rows shown (0 = all)
.maxwidth N         max cell width (0 = unlimited)
.nullvalue S        text printed for NULL
.separator S        csv delimiter
.timer on|off       per-statement timing
.echo on|off        echo statements before results
.bail on|off        stop a script at the first error
.output [FILE]      redirect results to FILE (no arg: back to stdout)
.once FILE          redirect only the next result to FILE
.read FILE          run a ';'-separated SQL script
.tables             list tables
.catalogs           list catalogs
.ops [FILTER]       list pipeline_op() operator names
.schema TABLE       show CREATE-style schema
.describe TABLE     column name/type table
.show               show current settings
.last               re-print the last result
.export_last FILE   write the last result as CSV
.prompt TEXT        change the prompt
.help               this help
.quit / .exit       leave the shell"""


class Shell:
    """Dot-command processor + statement loop (command_processor.cpp
    analog). One instance per connection."""

    def __init__(self, conn, cfg: ShellConfig | None = None, stdout=None):
        self.conn = conn
        self.cfg = cfg or ShellConfig()
        self.stdout = stdout or sys.stdout

    def _emit(self, text: str) -> None:
        target = self.cfg.once_file or self.cfg.outfile
        if target:
            try:
                with open(target, "a", encoding="utf-8") as f:
                    f.write(text + "\n")
            finally:
                self.cfg.once_file = None
            return
        self.stdout.write(text + "\n")

    def execute(self, sql: str) -> bool:
        """Run one statement; returns False when .bail should stop a
        script."""
        if self.cfg.echo:
            self.stdout.write(sql.strip() + "\n")
        t0 = time.perf_counter()
        try:
            cols, rows, message = self.conn.run(sql)
        except Exception as exc:
            self._emit(f"ERROR: {exc}")
            return not self.cfg.bail
        if message is not None:
            out = message
        else:
            self.cfg.last = (cols, rows)
            out = render(cols, rows, self.cfg)
        if self.cfg.timer:
            out += f"  [{time.perf_counter() - t0:.3f}s]"
        self._emit(out)
        return True

    # --- dot-commands -------------------------------------------------

    def dot(self, line: str) -> bool:
        """Handle a dot/meta command; returns False to exit."""
        parts = line.strip().split(None, 1)
        cmd = parts[0].lstrip(".\\").lower()
        arg = parts[1].strip() if len(parts) > 1 else ""

        def onoff(default: bool) -> bool:
            return {"on": True, "off": False}.get(arg.lower(), default)

        if cmd in ("q", "quit", "exit"):
            return False
        if cmd == "help":
            self.stdout.write(_HELP + "\n")
        elif cmd == "mode":
            if arg in MODES:
                self.cfg.mode = arg
            else:
                self.stdout.write(f"modes: {' '.join(MODES)}\n")
        elif cmd == "headers":
            self.cfg.headers = onoff(self.cfg.headers)
        elif cmd == "maxrows":
            self.cfg.maxrows = int(arg or 0)
        elif cmd == "maxwidth":
            self.cfg.maxwidth = int(arg or 0)
        elif cmd == "nullvalue":
            self.cfg.nullvalue = arg
        elif cmd == "separator":
            self.cfg.separator = arg or ","
        elif cmd == "timer":
            self.cfg.timer = onoff(self.cfg.timer)
        elif cmd == "echo":
            self.cfg.echo = onoff(self.cfg.echo)
        elif cmd == "bail":
            self.cfg.bail = onoff(self.cfg.bail)
        elif cmd == "output":
            self.cfg.outfile = arg or None
        elif cmd == "once":
            self.cfg.once_file = arg or None
        elif cmd == "read":
            try:
                with open(arg, encoding="utf-8") as fh:
                    script = fh.read()
            except OSError as exc:
                self.stdout.write(f"ERROR: {exc}\n")
                return True
            for stmt in split_statements(script):
                if not self.execute(stmt):
                    break
        elif cmd in ("tables", "d"):
            names = self.conn.tables()
            self.stdout.write(("\n".join(names) or "(no tables)") + "\n")
        elif cmd == "catalogs":
            self.stdout.write("\n".join(self.conn.catalogs()) + "\n")
        elif cmd == "ops":
            from gizmosql_spark.operators.registry import pipeline_queries

            names = sorted(pipeline_queries())
            if arg:
                names = [n for n in names if arg.lower() in n.lower()]
            self.stdout.write(
                ("\n".join(names) or "(no matching operators)") + "\n")
        elif cmd in ("schema", "describe"):
            if not arg:
                self.stdout.write("usage: .schema TABLE\n")
            else:
                self.execute(f"DESCRIBE {arg}")
        elif cmd == "show":
            for k in ("mode", "headers", "maxrows", "maxwidth", "nullvalue",
                      "separator", "timer", "echo", "bail", "outfile"):
                self.stdout.write(f"{k:>10}: {getattr(self.cfg, k)}\n")
        elif cmd == "last":
            if self.cfg.last:
                self._emit(render(*self.cfg.last, self.cfg))
            else:
                self.stdout.write("(no result yet)\n")
        elif cmd == "export_last":
            if not self.cfg.last or not arg:
                self.stdout.write("usage: .export_last FILE\n")
            else:
                cols, rows = self.cfg.last
                csv_cfg = ShellConfig(
                    mode="csv", maxrows=0, maxwidth=0,
                    separator=self.cfg.separator)
                with open(arg, "w", encoding="utf-8") as f:
                    f.write(render(cols, rows, csv_cfg) + "\n")
                self.stdout.write(f"wrote {len(rows)} rows to {arg}\n")
        elif cmd == "prompt":
            self.cfg.prompt = (arg + " ") if arg else "sql> "
        elif cmd == "settings":  # legacy alias
            self.execute("SELECT * FROM engine_settings()")
        else:
            self.stdout.write(
                f"unknown command: .{cmd} (try .help)\n")
        return True


def run_statement(engine, session_id: str, sql: str) -> str:
    """Execute one statement and render it (compat helper)."""
    out = io.StringIO()
    Shell(EngineConnection(engine, session_id), stdout=out).execute(sql)
    return out.getvalue().rstrip("\n")


def repl(engine_or_conn, session_id: str | None = None,
         stdin=None, stdout=None) -> None:
    """Line loop: dot-commands immediately, SQL on ';' boundaries."""
    conn = (EngineConnection(engine_or_conn, session_id)
            if session_id is not None else engine_or_conn)
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    shell = Shell(conn, stdout=stdout)
    if stdin is sys.stdin and sys.stdin.isatty():  # pragma: no cover
        try:
            import readline  # noqa: F401 (history + line editing)
        except ImportError:
            pass
    buf = ""
    stdout.write("gizmosql-spark shell — .help for commands, .quit to exit\n")
    while True:
        stdout.write(shell.cfg.prompt if not buf else "...> ")
        stdout.flush()
        line = stdin.readline()
        if not line:
            break
        stripped = line.strip()
        if not buf and (stripped.startswith((".", "\\"))
                        or stripped in ("exit", "quit")):
            if not shell.dot(stripped):
                break
            continue
        buf += line
        if ";" not in line:
            continue
        for stmt in split_statements(buf):
            shell.execute(stmt)
        buf = ""


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="gizmosql-spark-cli")
    p.add_argument("-c", "--command", help="run one statement and exit")
    p.add_argument("-f", "--file", help="run a ';'-separated SQL script and exit")
    p.add_argument("--role", default="admin", help="session role (default admin)")
    p.add_argument("--uri", help="connect to a Flight server instead of"
                                 " starting an in-process engine")
    p.add_argument("--user", default="", help="username for --uri")
    p.add_argument("--password", default="", help="password for --uri")
    p.add_argument("--mode", default="table", choices=MODES)
    args = p.parse_args(argv)

    if args.uri:
        conn = FlightConnection(args.uri, args.user, args.password)
    else:
        from gizmosql_spark.engine import Engine

        engine = Engine()
        conn = EngineConnection(engine, engine.create_session(role=args.role))
    shell = Shell(conn, ShellConfig(mode=args.mode))
    try:
        if args.command:
            return 0 if shell.execute(args.command) else 1
        if args.file:
            ok = True
            with open(args.file) as fh:
                for stmt in split_statements(fh.read()):
                    ok = shell.execute(stmt)
                    if not ok:
                        break
            return 0 if ok else 1
        repl(conn)
        return 0
    finally:
        conn.close()


if __name__ == "__main__":
    sys.exit(main())
