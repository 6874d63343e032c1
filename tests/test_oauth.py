"""OAuth/OIDC bootstrap flow tests (reference
src/enterprise/oauth/oauth_http_server.cpp): full loopback round-trip
against a stub IdP, email authorization, expiry, and the
JWKS-verified bootstrap → engine-session-token exchange."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from gizmosql_spark import oauth
from gizmosql_spark.auth import AuthError, mint_token, write_jwks
from gizmosql_spark.engine import Engine

IDP_ISS = "https://idp.test"
CLIENT_ID = "gizmo-client"
IDP_KEYS = {"idp-k1": b"idp-signing-key-one"}


class _StubIdP:
    """Two-endpoint OIDC stub: /authorize 302s straight back with a
    code; /token redeems the code for a signed ID token."""

    def __init__(self, email: str):
        self.email = email
        self.codes: dict[str, str] = {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                p = urllib.parse.urlparse(self.path)
                qs = dict(urllib.parse.parse_qsl(p.query))
                if p.path == "/authorize":
                    code = f"code-{len(outer.codes)}"
                    outer.codes[code] = outer.email
                    loc = (f"{qs['redirect_uri']}?code={code}"
                           f"&state={qs['state']}")
                    self.send_response(302)
                    self.send_header("Location", loc)
                    self.end_headers()
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                ln = int(self.headers.get("Content-Length", 0))
                form = dict(urllib.parse.parse_qsl(
                    self.rfile.read(ln).decode()))
                email = outer.codes.pop(form.get("code", ""), None)
                if email is None:
                    body = json.dumps({"error": "bad code"}).encode()
                    self.send_response(400)
                else:
                    tok = mint_token(
                        IDP_KEYS["idp-k1"], email, "external",
                        kid="idp-k1",
                        extra_claims={"iss": IDP_ISS, "aud": CLIENT_ID,
                                      "email": email})
                    body = json.dumps({"id_token": tok,
                                       "token_type": "Bearer"}).encode()
                    self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        threading.Thread(target=self.httpd.serve_forever,
                         daemon=True).start()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def _get(url: str, follow: bool = False):
    req = urllib.request.Request(url)
    opener = urllib.request.build_opener(
        *( [] if follow else [_NoRedirect()] ))
    try:
        with opener.open(req, timeout=10) as r:
            return r.status, dict(r.headers), r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read().decode()


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *a, **k):
        return None


@pytest.fixture()
def flow(tmp_path):
    idp = _StubIdP("dev@example.com")
    cfg = oauth.OAuthConfig(
        client_id=CLIENT_ID, client_secret="s3cr3t",
        secret_key="hmac-key",
        authorized_email_patterns=["*@example.com"],
        authorization_endpoint=f"{idp.url}/authorize",
        token_endpoint=f"{idp.url}/token",
        issuer=IDP_ISS)
    srv = oauth.OAuthHttpServer(cfg)
    yield idp, cfg, srv
    srv.shutdown()
    idp.shutdown()


def _run_flow(srv) -> tuple[str, str]:
    """initiate → start (302 to IdP) → IdP authorize (302 back) →
    callback → poll. Returns (uuid, id_token)."""
    _, _, body = _get(f"{srv.base_url}/oauth/initiate")
    init = json.loads(body)
    status, headers, _ = _get(init["auth_url"])
    assert status == 302
    status, headers2, _ = _get(headers["Location"])  # IdP authorize
    assert status == 302
    status, _, cb = _get(headers2["Location"])       # our callback
    assert status == 200, cb
    assert json.loads(cb)["status"] == "authenticated"
    status, _, poll = _get(init["poll_url"])
    assert status == 200
    return init["session"], json.loads(poll)["id_token"]


def test_full_bootstrap_flow(flow):
    _, _, srv = flow
    _, id_token = _run_flow(srv)
    claims = oauth._unverified_claims(id_token)
    assert claims["email"] == "dev@example.com"
    assert claims["aud"] == CLIENT_ID


def test_poll_is_single_use(flow):
    _, _, srv = flow
    session_uuid, _ = _run_flow(srv)
    status, _, _ = _get(f"{srv.base_url}/oauth/token/{session_uuid}")
    assert status == 404


def test_poll_pending_before_callback(flow):
    _, _, srv = flow
    _, _, body = _get(f"{srv.base_url}/oauth/initiate")
    init = json.loads(body)
    status, _, poll = _get(init["poll_url"])
    assert status == 202 and json.loads(poll)["status"] == "pending"


def test_unauthorized_email_rejected(tmp_path):
    idp = _StubIdP("intruder@evil.com")
    cfg = oauth.OAuthConfig(
        client_id=CLIENT_ID, secret_key="k",
        authorized_email_patterns=["*@example.com"],
        authorization_endpoint=f"{idp.url}/authorize",
        token_endpoint=f"{idp.url}/token", issuer=IDP_ISS)
    srv = oauth.OAuthHttpServer(cfg)
    try:
        _, _, body = _get(f"{srv.base_url}/oauth/initiate")
        init = json.loads(body)
        _, headers, _ = _get(init["auth_url"])
        _, headers2, _ = _get(headers["Location"])
        status, _, cb = _get(headers2["Location"])
        assert status == 403 and "not authorized" in json.loads(cb)["error"]
        status, _, poll = _get(init["poll_url"])
        assert status == 403
    finally:
        srv.shutdown()
        idp.shutdown()


def test_expired_session_swept(flow):
    _, cfg, srv = flow
    cfg.pending_ttl_s = 0.0
    _, _, body = _get(f"{srv.base_url}/oauth/initiate")
    init = json.loads(body)
    status, _, _ = _get(init["poll_url"])
    assert status == 404


def test_bootstrap_token_to_engine_session(flow, spark, tmp_path):
    """The verified IdP token exchanges for an engine session JWT that
    create_session accepts (VerifyAndDecodeBootstrapToken → session)."""
    _, cfg, srv = flow
    _, id_token = _run_flow(srv)

    jwks_path = str(tmp_path / "idp_jwks.json")
    write_jwks(jwks_path, IDP_KEYS)
    eng = Engine(spark=spark)
    eng.use_jwks(jwks_path)
    session_jwt = oauth.bootstrap_session_token(
        eng, id_token, cfg, role="analyst")
    sid = eng.create_session(token=session_jwt)
    st = eng._session(sid)
    assert (st.username, st.role) == ("dev@example.com", "analyst")
    eng.close_session(sid)


def test_bootstrap_rejects_wrong_audience(flow, spark, tmp_path):
    _, cfg, srv = flow
    _, id_token = _run_flow(srv)
    jwks_path = str(tmp_path / "idp_jwks.json")
    write_jwks(jwks_path, IDP_KEYS)
    eng = Engine(spark=spark)
    eng.use_jwks(jwks_path)
    bad = oauth.OAuthConfig(
        client_id="other-client", secret_key="k",
        authorized_email_patterns=["*@example.com"], issuer=IDP_ISS)
    with pytest.raises(AuthError, match="audience"):
        oauth.bootstrap_session_token(eng, id_token, bad)


def test_bootstrap_rejects_unknown_issuer(flow, spark, tmp_path):
    _, cfg, srv = flow
    _, id_token = _run_flow(srv)
    jwks_path = str(tmp_path / "idp_jwks.json")
    write_jwks(jwks_path, IDP_KEYS)
    eng = Engine(spark=spark)
    eng.use_jwks(jwks_path)
    bad = oauth.OAuthConfig(
        client_id=CLIENT_ID, secret_key="k",
        authorized_email_patterns=["*@example.com"],
        issuer="https://someone-else")
    with pytest.raises(AuthError, match="issuer"):
        oauth.bootstrap_session_token(eng, id_token, bad)
