"""Lint gate: operator bodies must never mutate shared-session confs.

The engine is multi-session (engine.py shares one SparkSession across
clients), so a set-then-restore window on ``spark.sql.shuffle.
partitions`` silently re-plans a concurrently submitted statement at
the clamped width. The sanctioned alternatives are per-frame
``repartition(n, key)`` (dedup._propagate_min_labels), the
conf-isolated session clones (loader.bounded_session,
streaming.windows.streaming_session), and the input-size-keyed policy
setters (loader.tune_adaptivity / tune_shuffle_width) — which never
restore, re-align on every table() call so the conf always tracks the
dir being queried, and yield permanently to any external SET. The
only files allowed to touch the width are the clone constructors,
the loader policy, and session.py's builder.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "gizmosql_spark"

#: files whose clone constructors / session builder legitimately set
#: the width — on a session they own, at creation time
ALLOWED = {"session.py", "operators/loader.py", "streaming/windows.py"}

_SET_RE = re.compile(
    r"""conf\.set\(\s*['"]spark\.sql\.shuffle\.partitions""")


def test_no_shuffle_partition_mutation_in_operator_bodies():
    offenders = []
    for path in PKG.rglob("*.py"):
        rel = path.relative_to(PKG).as_posix()
        if rel in ALLOWED or rel.startswith("vendor/"):
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if _SET_RE.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "session-global shuffle-width mutation outside the sanctioned "
        "clone constructors:\n" + "\n".join(offenders)
    )


def test_allowed_files_set_width_only_on_clones():
    """The allowed files must set the width on a session they created
    (``s.conf.set`` on a newSession clone / builder confs), never via
    a bare set-then-restore on a caller's session — approximated by
    requiring no conf.get of the key followed by a later restore-style
    set in the same function (the old clamp pattern stored the
    previous value first)."""
    for rel in ("operators/loader.py", "streaming/windows.py"):
        text = (PKG / rel).read_text()
        assert "prev_parts = spark.conf.get" not in text, rel
