"""Engine settings registry.

Re-expresses the reference's ``SET [SESSION|GLOBAL] gizmosql.*``
settings registry (/root/reference/src/duckdb/duckdb_statement.cpp:
1196-1622: detection :82-93, dispatch :1708-1765, Apply :1262-1313)
as a plain Python registry keyed ``engine.*``. Scope semantics match:
SESSION settings live on the session, GLOBAL on the server; non-admin
roles cannot set GLOBAL settings.

The ``engine_settings()`` table function (reference:
``gizmosql_settings()``, duckdb_statement.cpp:1636-1704) is served from
this registry as a DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


class SettingError(ValueError):
    pass


def _positive_int(v: str) -> int:
    i = int(v)
    if i < 0:
        raise SettingError(f"must be >= 0, got {i}")
    return i


def _bool(v: str) -> bool:
    s = str(v).strip().lower()
    if s in ("true", "1", "on", "yes"):
        return True
    if s in ("false", "0", "off", "no"):
        return False
    raise SettingError(f"not a boolean: {v!r}")


@dataclass(frozen=True)
class Setting:
    name: str
    default: Any
    scope: str  # "session" | "global" | "both"
    input_type: str
    description: str
    parse: Callable[[str], Any]
    admin_only: bool = False


#: registry mirrors the reference's settings inventory
#: (duckdb_statement.cpp: query_timeout :1322, query_log_level :1350,
#: capture_query_profile :1388, bypass_queue :1428, session_tag :1454,
#: query_tag :1478, max_concurrent_statements :1497,
#: max_queued_statements :1519, max_queue_wait :1540,
#: graceful_shutdown :1572, shutdown_grace_period_seconds :1594)
REGISTRY: dict[str, Setting] = {
    s.name: s
    for s in [
        Setting("engine.query_timeout", 0, "both", "int",
                "Per-statement timeout in seconds (0 = unlimited)", _positive_int),
        Setting("engine.query_log_level", "info", "both", "str",
                "Log level for statement logging", str),
        Setting("engine.capture_query_profile", False, "both", "bool",
                "Capture the physical plan + metrics per statement", _bool),
        Setting("engine.bypass_queue", False, "session", "bool",
                "Skip admission control for this session", _bool, admin_only=True),
        Setting("engine.session_tag", "", "session", "str",
                "Free-form tag attached to the session", str),
        Setting("engine.query_tag", "", "session", "str",
                "Free-form tag attached to the next statements", str),
        Setting("engine.max_concurrent_statements", 0, "global", "int",
                "Admission cap on concurrently executing statements (0 = off)",
                _positive_int, admin_only=True),
        Setting("engine.max_queued_statements", 100, "global", "int",
                "Bound on the admission queue", _positive_int, admin_only=True),
        Setting("engine.max_queue_wait", 0, "global", "int",
                "Max seconds a statement may wait for admission (0 = forever)",
                _positive_int, admin_only=True),
        Setting("engine.graceful_shutdown", False, "global", "bool",
                "Drain mode: reject new work, finish in-flight", _bool, admin_only=True),
        Setting("engine.shutdown_grace_period_seconds", 30, "global", "int",
                "Grace period before force-interrupt on shutdown", _positive_int,
                admin_only=True),
        Setting("engine.pipeline_data_dir", "", "both", "str",
                "Default data directory for pipeline_op('<name>') "
                "calls that omit the directory argument", str,
                admin_only=True),
    ]
}


@dataclass
class SettingsState:
    """Resolved settings for one scope level."""

    values: dict[str, Any] = field(default_factory=dict)

    def get(self, name: str, fallback: "SettingsState | None" = None) -> Any:
        if name in self.values:
            return self.values[name]
        if fallback is not None and name in fallback.values:
            return fallback.values[name]
        spec = REGISTRY.get(name)
        if spec is None:
            raise SettingError(f"unknown setting: {name}")
        return spec.default

    def set(self, name: str, raw: str, scope: str, is_admin: bool) -> Any:
        spec = REGISTRY.get(name)
        if spec is None:
            raise SettingError(f"unknown setting: {name}")
        if spec.admin_only and not is_admin:
            raise SettingError(f"setting {name} requires the admin role")
        if spec.scope != "both" and scope != spec.scope:
            raise SettingError(
                f"setting {name} has {spec.scope} scope, cannot SET {scope.upper()}"
            )
        value = spec.parse(raw)
        self.values[name] = value
        return value


def settings_rows(
    session: SettingsState, global_: SettingsState
) -> list[tuple]:
    """Rows for the engine_settings() table function, shaped like the
    reference's rewritten VALUES table (duckdb_statement.cpp:1679-1704)."""
    rows = []
    for name, spec in sorted(REGISTRY.items()):
        rows.append(
            (
                name,
                str(session.get(name, global_)),
                str(session.values.get(name, "")),
                str(global_.values.get(name, "")),
                spec.scope,
                spec.input_type,
                str(spec.default),
                spec.description,
            )
        )
    return rows


SETTINGS_SCHEMA = (
    "name string, value string, session_value string, global_value string, "
    "scope string, input_type string, default_value string, description string"
)
