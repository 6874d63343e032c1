"""Secrets manager: the DuckDB secrets analog for object-store and
remote-engine credentials.

Reference surface (admin_command_gating.md:54-55, adbc_scanner doc):
``CREATE [OR REPLACE] [PERSISTENT|TEMPORARY] SECRET name (TYPE t,
key 'value', …)``, ``DROP SECRET [IF EXISTS] name``, and the
``duckdb_secrets()`` listing — all admin-only (secrets expose
credential material). This module re-expresses that Spark-first:

- **Registry** with DuckDB's scope semantics: each secret may carry a
  ``SCOPE 'uri-prefix'``; ``lookup(path)`` returns the secret with the
  LONGEST matching scope prefix (unscoped secrets of the right type
  match everything, last).
- **Application**: ``apply_for_path`` maps a matched secret onto the
  live Hadoop configuration — the Spark-world equivalent of DuckDB's
  httpfs pickup. S3-family secrets become ``fs.s3a.*`` settings
  (bucket-scoped overrides when the scope names a bucket, so two
  secrets for two buckets coexist), GCS becomes ``fs.gs.*``, Azure
  ``fs.azure.account.key.*``. No network is touched: applying a secret
  is pure configuration, which is exactly the testable boundary in
  this sandbox — the actual connector jars are deploy-time.
- **Persistence**: ``PERSISTENT`` secrets serialize as JSON under the
  warehouse (``_secrets/``) and reload on engine start, like DuckDB's
  stored secrets directory. They are stored on the server filesystem
  unencrypted (DuckDB's storage is likewise unencrypted binary);
  the listing NEVER returns raw material — values are masked, same as
  ``duckdb_secrets()``'s redacted column.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from dataclasses import dataclass, field

#: option keys whose values are credential material (masked in every
#: listing; the same inventory querylog redaction scrubs)
_SENSITIVE = {
    "secret", "key_id", "password", "token", "session_token",
    "client_secret", "account_key", "sas_token", "private_key",
}

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(PERSISTENT\s+|TEMPORARY\s+|TEMP\s+)?"
    r"SECRET\s+(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s*\(\s*(.*?)\s*\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+(?:PERSISTENT\s+|TEMPORARY\s+|TEMP\s+)?SECRET\s+"
    r"(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
#: one `key 'value'` / `key value` / `TYPE s3` option
_OPT_RE = re.compile(
    r"([A-Za-z_]\w*)\s+(?:'((?:[^']|'')*)'|([^\s,()']+))"
)


@dataclass
class Secret:
    name: str
    type: str
    options: dict[str, str]
    scope: str = ""
    persistent: bool = False
    created_at: float = field(default_factory=time.time)

    def masked_options(self) -> dict[str, str]:
        return {
            k: ("[REDACTED]" if k.lower() in _SENSITIVE else v)
            for k, v in self.options.items()
        }


def parse_secret_ddl(sql: str):
    """Parse CREATE/DROP SECRET; returns ("create", Secret, replace) |
    ("drop", name, if_exists) | None."""
    m = _CREATE_RE.match(sql)
    if m:
        replace = bool(m.group(1))
        persistent = bool(m.group(2)) and m.group(2).strip().upper() == "PERSISTENT"
        name, body = m.group(3), m.group(4)
        opts: dict[str, str] = {}
        for om in _OPT_RE.finditer(body):
            k = om.group(1).lower()
            v = om.group(2) if om.group(2) is not None else om.group(3)
            opts[k] = v.replace("''", "'") if om.group(2) is not None else v
        stype = opts.pop("type", "").lower()
        if not stype:
            raise ValueError("CREATE SECRET requires a TYPE option")
        scope = opts.pop("scope", "")
        return ("create",
                Secret(name.lower(), stype, opts, scope=scope,
                       persistent=persistent),
                replace)
    m = _DROP_RE.match(sql)
    if m:
        return ("drop", m.group(2).lower(), bool(m.group(1)))
    return None


class SecretsManager:
    """Named-secret registry with scope-based lookup + Hadoop-conf
    application. Thread-safe; persistent entries survive restarts via
    the warehouse ``_secrets/`` directory."""

    def __init__(self, store_dir: str | None = None):
        self._secrets: dict[str, Secret] = {}
        self._lock = threading.Lock()
        self._store_dir = store_dir
        if store_dir and os.path.isdir(store_dir):
            for fn in sorted(os.listdir(store_dir)):
                if not fn.endswith(".json"):
                    continue
                try:
                    with open(os.path.join(store_dir, fn)) as f:
                        d = json.load(f)
                    s = Secret(d["name"], d["type"], d["options"],
                               scope=d.get("scope", ""), persistent=True,
                               created_at=d.get("created_at", 0.0))
                    self._secrets[s.name] = s
                except Exception:
                    continue  # unreadable entry: skip, never crash boot

    def create(self, secret: Secret, replace: bool = False) -> None:
        with self._lock:
            if secret.name in self._secrets and not replace:
                raise ValueError(
                    f"secret {secret.name!r} already exists"
                    " (use CREATE OR REPLACE)")
            self._secrets[secret.name] = secret
            if secret.persistent and self._store_dir:
                os.makedirs(self._store_dir, exist_ok=True)
                path = os.path.join(self._store_dir, f"{secret.name}.json")
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"name": secret.name, "type": secret.type,
                               "options": secret.options,
                               "scope": secret.scope,
                               "created_at": secret.created_at}, f)
                os.replace(tmp, path)

    def drop(self, name: str, if_exists: bool = False) -> bool:
        with self._lock:
            s = self._secrets.pop(name, None)
            if s is None:
                if if_exists:
                    return False
                raise KeyError(f"no secret named {name!r}")
            if self._store_dir:
                try:
                    os.remove(os.path.join(self._store_dir, f"{name}.json"))
                except FileNotFoundError:
                    pass
            return True

    def listing(self) -> list[tuple]:
        """(name, type, scope, persistent, masked-options-json) rows —
        the duckdb_secrets() shape; never exposes raw material."""
        with self._lock:
            return [
                (s.name, s.type, s.scope, s.persistent,
                 json.dumps(s.masked_options(), sort_keys=True))
                for s in sorted(self._secrets.values(),
                                key=lambda x: x.name)
            ]

    def lookup(self, path: str,
               types: tuple[str, ...] | None = None) -> Secret | None:
        """DuckDB scope semantics: longest matching scope prefix wins;
        unscoped secrets match any path (weakest). ``types`` narrows
        the candidates (e.g. only adbc secrets for a Flight uri)."""
        with self._lock:
            best, best_len = None, -1
            for s in self._secrets.values():
                if types is not None and s.type not in types:
                    continue
                if s.scope:
                    if path.startswith(s.scope) and len(s.scope) > best_len:
                        best, best_len = s, len(s.scope)
                elif best is None:
                    best, best_len = s, 0
            return best

    def flight_credentials(self, uri: str) -> tuple[str | None, str | None]:
        """(username, password) from the best adbc/flight secret for a
        remote-engine uri — the reference's `CREATE SECRET (TYPE adbc,
        SCOPE 'grpc+tls://…', username …, password …)` + bare ATTACH
        flow (docs/adbc_scanner_duckdb.md:60-92)."""
        s = self.lookup(uri, types=("adbc", "flight"))
        if s is None:
            return None, None
        o = s.options
        return o.get("username", o.get("user")), o.get("password")

    # -- Spark application -------------------------------------------

    def apply_for_path(self, spark, path: str) -> Secret | None:
        """Map the best-matching secret for ``path`` onto the live
        Hadoop configuration (fs.s3a.* / fs.gs.* / fs.azure.*). Pure
        conf — connector jars and network are deploy-time."""
        s = self.lookup(path, types=("s3", "r2", "gcs_hmac", "gcs", "azure"))
        if s is None:
            return None
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        o = s.options
        if s.type in ("s3", "r2", "gcs_hmac"):
            prefix = "fs.s3a."
            m = re.match(r"^(?:s3a?|r2|gs)://([^/]+)", s.scope)
            if m:  # bucket-scoped override: per-bucket creds coexist
                prefix = f"fs.s3a.bucket.{m.group(1)}."
            if "key_id" in o:
                conf.set(prefix + "access.key", o["key_id"])
            if "secret" in o:
                conf.set(prefix + "secret.key", o["secret"])
            if "session_token" in o:
                conf.set(prefix + "session.token", o["session_token"])
            if "endpoint" in o:
                conf.set(prefix + "endpoint", o["endpoint"])
            if "region" in o:
                conf.set(prefix + "endpoint.region", o["region"])
            if o.get("url_style") == "path":
                conf.set(prefix + "path.style.access", "true")
        elif s.type == "gcs":
            if "key_id" in o:
                conf.set("fs.gs.auth.access.key", o["key_id"])
            if "secret" in o:
                conf.set("fs.gs.auth.secret.key", o["secret"])
        elif s.type == "azure":
            acct = o.get("account_name", "")
            if acct and "account_key" in o:
                conf.set(
                    f"fs.azure.account.key.{acct}.dfs.core.windows.net",
                    o["account_key"])
        # adbc/flight secrets are consumed by flight_scan, not Hadoop
        return s
