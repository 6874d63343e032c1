"""OIDC / OAuth2 bootstrap authentication for the Flight engine.

Re-expresses the reference's enterprise OAuth HTTP server
(/root/reference/src/enterprise/oauth/oauth_http_server.h:30-110,
oauth_http_server.cpp: HandleInitiate / HandleStart / HandleCallback /
HandleTokenPoll) on the Python stdlib HTTP server. The flow is
endpoint-for-endpoint:

1. ``GET /oauth/initiate`` — client generates a pending-auth session:
   a UUID (the client's poll handle) plus its HMAC hash (the value
   that travels through the IdP ``state`` parameter — the UUID itself
   never leaves the client, so a leaked redirect cannot be polled).
2. ``GET /oauth/start?session=HASH`` — 302 to the IdP's authorization
   endpoint (client_id, redirect_uri, scope, state=HASH).
3. ``GET /oauth/callback?code=…&state=HASH`` — exchanges the code at
   the IdP token endpoint (authorization_code grant, cpp:403), checks
   the ID token's email against ``authorized_email_patterns``
   (IsEmailAuthorized), parks the raw ID token under the hash.
4. ``GET /oauth/token/<uuid>`` — poll; on success returns the ID
   token ONCE and forgets the session.
5. The engine verifies the bootstrap token cryptographically
   (issuer / audience / JWKS signature — VerifyAndDecodeBootstrapToken
   analog, ``verify_bootstrap_token``) and mints its own session JWT.

Pending sessions expire after ``pending_ttl_s`` (CleanupExpiredSessions
analog, swept lazily on every touch — no background thread needed at
this scale; a deployment can call ``cleanup()`` from a timer).

The IdP is any OIDC provider; tests run a loopback stub speaking the
same two endpoints. No real-network dependency: everything binds
127.0.0.1.
"""

from __future__ import annotations

import fnmatch
import hashlib
import hmac
import json
import threading
import time
import urllib.parse
import urllib.request
import uuid as uuid_mod
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from gizmosql_spark.auth import AuthError, JwksManager, _unb64url, mint_token


@dataclass
class OAuthConfig:
    """Mirror of OAuthHttpServer::Config (oauth_http_server.h:43-57)."""

    client_id: str
    client_secret: str = ""
    scopes: str = "openid email"
    redirect_uri: str = ""          # auto-constructed if empty
    secret_key: str = "change-me"   # HMAC session hashing only
    instance_id: str = ""           # multi-instance proxy routing tag
    authorized_email_patterns: list[str] = field(default_factory=list)
    authorization_endpoint: str = ""  # from OIDC discovery
    token_endpoint: str = ""
    issuer: str = ""                # expected iss of bootstrap tokens
    pending_ttl_s: float = 300.0


@dataclass
class _PendingAuth:
    created_at: float
    id_token: str | None = None
    error: str | None = None


def _session_hash(secret_key: str, session_uuid: str) -> str:
    return hmac.new(
        secret_key.encode(), session_uuid.encode(), hashlib.sha256
    ).hexdigest()


def _unverified_claims(jwt_token: str) -> dict:
    """Payload decode WITHOUT verification — only ever used for the
    email pre-authorization gate; cryptographic verification happens
    in verify_bootstrap_token (same split as the reference's
    CheckEmailAuthorization vs VerifyAndDecodeBootstrapToken)."""
    try:
        return json.loads(_unb64url(jwt_token.split(".")[1]))
    except Exception as exc:
        raise AuthError(f"malformed id_token: {exc}") from exc


def email_authorized(email: str, patterns: list[str]) -> bool:
    """fnmatch-style patterns ('*@example.com'); empty list = deny all
    (fail-closed, unlike a missing gate)."""
    return any(fnmatch.fnmatch(email, p) for p in patterns)


def verify_bootstrap_token(jwks: JwksManager, id_token: str,
                           config: OAuthConfig) -> dict:
    """Issuer + audience + signature + email authorization — the
    VerifyAndDecodeBootstrapToken analog. Returns the verified claims."""
    claims = jwks.verify(id_token)
    if config.issuer and claims.get("iss") != config.issuer:
        raise AuthError("bootstrap token issuer mismatch")
    aud = claims.get("aud")
    if aud != config.client_id and not (
        isinstance(aud, list) and config.client_id in aud
    ):
        raise AuthError("bootstrap token audience mismatch")
    email = claims.get("email", "")
    if not email_authorized(email, config.authorized_email_patterns):
        raise AuthError(f"email not authorized: {email!r}")
    return claims


def bootstrap_session_token(engine, id_token: str, config: OAuthConfig,
                            role: str = "user",
                            ttl_seconds: int = 3600) -> str:
    """Exchange a verified IdP ID token for an engine-minted session
    JWT (step 7 in the reference flow: external identity in, engine
    session token out)."""
    if engine.jwks is None:
        raise AuthError("engine has no JWKS configured for bootstrap")
    claims = verify_bootstrap_token(engine.jwks, id_token, config)
    return mint_token(
        engine.token_secret, claims["email"], role,
        ttl_seconds=ttl_seconds,
        extra_claims={"auth_method": "oauth",
                      "idp_iss": claims.get("iss", "")},
    )


class OAuthHttpServer:
    """Loopback OAuth bootstrap server over ThreadingHTTPServer."""

    def __init__(self, config: OAuthConfig, host: str = "127.0.0.1",
                 port: int = 0):
        self.config = config
        self._pending: dict[str, _PendingAuth] = {}  # keyed by HASH
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                outer._route(self)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self.base_url = f"http://{host}:{self.port}"
        if not self.config.redirect_uri:
            self.config.redirect_uri = f"{self.base_url}/oauth/callback"
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    # --- lifecycle ----------------------------------------------------

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(5)

    def cleanup(self) -> None:
        """Drop expired pending sessions (CleanupExpiredSessions)."""
        cutoff = time.time() - self.config.pending_ttl_s
        with self._lock:
            for h in [h for h, p in self._pending.items()
                      if p.created_at < cutoff]:
                del self._pending[h]

    # --- routing ------------------------------------------------------

    def _route(self, req: BaseHTTPRequestHandler) -> None:
        self.cleanup()
        parsed = urllib.parse.urlparse(req.path)
        qs = dict(urllib.parse.parse_qsl(parsed.query))
        try:
            if parsed.path == "/oauth/initiate":
                self._initiate(req)
            elif parsed.path == "/oauth/start":
                self._start(req, qs)
            elif parsed.path == "/oauth/callback":
                self._callback(req, qs)
            elif parsed.path.startswith("/oauth/token/"):
                self._poll(req, parsed.path.rsplit("/", 1)[-1])
            else:
                self._json(req, 404, {"error": "not found"})
        except Exception as exc:  # route errors as JSON, never tracebacks
            self._json(req, 500, {"error": str(exc)})

    def _json(self, req, status: int, body: dict) -> None:
        data = json.dumps(body).encode()
        req.send_response(status)
        req.send_header("Content-Type", "application/json")
        req.send_header("Content-Length", str(len(data)))
        req.end_headers()
        req.wfile.write(data)

    # --- endpoints ----------------------------------------------------

    def _initiate(self, req) -> None:
        session_uuid = str(uuid_mod.uuid4())
        h = _session_hash(self.config.secret_key, session_uuid)
        with self._lock:
            self._pending[h] = _PendingAuth(created_at=time.time())
        self._json(req, 200, {
            "session": session_uuid,
            "auth_url": f"{self.base_url}/oauth/start?session={h}",
            "poll_url": f"{self.base_url}/oauth/token/{session_uuid}",
            "instance_id": self.config.instance_id,
        })

    def _start(self, req, qs: dict) -> None:
        h = qs.get("session", "")
        with self._lock:
            known = h in self._pending
        if not known:
            self._json(req, 404, {"error": "unknown session"})
            return
        params = urllib.parse.urlencode({
            "response_type": "code",
            "client_id": self.config.client_id,
            "redirect_uri": self.config.redirect_uri,
            "scope": self.config.scopes,
            "state": h,
        })
        url = f"{self.config.authorization_endpoint}?{params}"
        req.send_response(302)
        req.send_header("Location", url)
        req.end_headers()

    def _callback(self, req, qs: dict) -> None:
        h = qs.get("state", "")
        with self._lock:
            pending = self._pending.get(h)
        if pending is None:
            self._json(req, 404, {"error": "unknown or expired state"})
            return
        code = qs.get("code")
        if not code:
            pending.error = qs.get("error", "missing code")
            self._json(req, 400, {"error": pending.error})
            return
        try:
            id_token = self._exchange_code(code)
            email = _unverified_claims(id_token).get("email", "")
            if not email_authorized(
                    email, self.config.authorized_email_patterns):
                raise AuthError(f"email not authorized: {email!r}")
            pending.id_token = id_token
            self._json(req, 200, {"status": "authenticated",
                                  "email": email})
        except Exception as exc:
            pending.error = str(exc)
            self._json(req, 403, {"error": pending.error})

    def _poll(self, req, session_uuid: str) -> None:
        h = _session_hash(self.config.secret_key, session_uuid)
        with self._lock:
            pending = self._pending.get(h)
            if pending is not None and (pending.id_token or pending.error):
                del self._pending[h]  # single-use
        if pending is None:
            self._json(req, 404, {"error": "unknown or expired session"})
        elif pending.error:
            self._json(req, 403, {"error": pending.error})
        elif pending.id_token:
            self._json(req, 200, {"id_token": pending.id_token})
        else:
            self._json(req, 202, {"status": "pending"})

    # --- IdP token exchange (ExchangeCodeForTokens, cpp:403) ----------

    def _exchange_code(self, code: str) -> str:
        body = urllib.parse.urlencode({
            "grant_type": "authorization_code",
            "code": code,
            "client_id": self.config.client_id,
            "client_secret": self.config.client_secret,
            "redirect_uri": self.config.redirect_uri,
        }).encode()
        reqobj = urllib.request.Request(
            self.config.token_endpoint, data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        with urllib.request.urlopen(reqobj, timeout=10) as resp:
            payload = json.loads(resp.read().decode())
        id_token = payload.get("id_token")
        if not id_token:
            raise AuthError(
                f"token endpoint returned no id_token: {payload}")
        return id_token
