"""Authentication: basic-credential verification + signed-token minting.

Re-expresses the reference's auth middleware
(/root/reference/src/common/gizmosql_security.cpp — basic/JWT bearer
verification :317-440, token minting with a ``role`` claim :263-295)
with the Python stdlib: PBKDF2-hashed passwords and HS256 JWT-shaped
tokens (base64url(header).base64url(claims).base64url(hmac)).

The flow matches §3.1 step 1: a client authenticates once with basic
credentials, receives a signed token carrying username/role/catalog
ACL claims, and presents that token on session creation; the engine
trusts only the signature, never client-asserted roles.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time


class AuthError(PermissionError):
    pass


_PBKDF2_ITERS = 100_000


def hash_password(password: str, salt: bytes | None = None) -> str:
    """salt$hash, PBKDF2-HMAC-SHA256."""
    salt = salt or os.urandom(16)
    digest = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, _PBKDF2_ITERS)
    return f"{salt.hex()}${digest.hex()}"


def verify_password(password: str, stored: str) -> bool:
    salt_hex, digest_hex = stored.split("$", 1)
    digest = hashlib.pbkdf2_hmac(
        "sha256", password.encode(), bytes.fromhex(salt_hex), _PBKDF2_ITERS
    )
    return hmac.compare_digest(digest.hex(), digest_hex)


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64url(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def mint_token(
    secret: str,
    username: str,
    role: str,
    ttl_seconds: int = 3600,
    extra_claims: dict | None = None,
) -> str:
    """HS256 JWT (mirrors the reference's CreateJwtToken,
    gizmosql_security.cpp:263-295: issuer, subject, role claim, exp)."""
    header = {"alg": "HS256", "typ": "JWT"}
    now = int(time.time())
    claims = {
        "iss": "gizmosql-spark",
        "sub": username,
        "role": role,
        "iat": now,
        "exp": now + ttl_seconds,
        **(extra_claims or {}),
    }
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = hmac.new(secret.encode(), signing_input.encode(), hashlib.sha256).digest()
    return signing_input + "." + _b64url(sig)


def verify_token(secret: str, token: str) -> dict:
    """Signature + expiry check; returns the claims. Fail-closed
    (bad shape, bad signature, expired → AuthError)."""
    try:
        signing_input, _, sig_part = token.rpartition(".")
        expected = hmac.new(
            secret.encode(), signing_input.encode(), hashlib.sha256
        ).digest()
        if not hmac.compare_digest(expected, _unb64url(sig_part)):
            raise AuthError("bad token signature")
        header_part, _, claims_part = signing_input.partition(".")
        header = json.loads(_unb64url(header_part))
        if header.get("alg") != "HS256":
            raise AuthError("unsupported token algorithm")
        claims = json.loads(_unb64url(claims_part))
    except AuthError:
        raise
    except Exception as exc:
        raise AuthError(f"malformed token: {exc}") from exc
    if claims.get("exp", 0) < time.time():
        raise AuthError("token expired")
    return claims


class UserRegistry:
    """username -> (password hash, role, catalog ACL claims).

    The reference loads basic credentials from flags/env and maps them
    to roles (gizmosql_library.cpp); Enterprise carries per-catalog
    read/write ACLs in JWT claims
    (catalog_permissions_handler.cpp)."""

    def __init__(self) -> None:
        self._users: dict[str, tuple[str, str, dict]] = {}

    def add_user(
        self,
        username: str,
        password: str,
        role: str = "user",
        read_catalogs: list[str] | None = None,
        write_catalogs: list[str] | None = None,
    ) -> None:
        claims = {}
        if read_catalogs is not None:
            claims["read_catalogs"] = read_catalogs
        if write_catalogs is not None:
            claims["write_catalogs"] = write_catalogs
        self._users[username] = (hash_password(password), role, claims)

    def authenticate(self, secret: str, username: str, password: str) -> str:
        entry = self._users.get(username)
        if entry is None or not verify_password(password, entry[0]):
            raise AuthError("invalid credentials")
        pw_hash, role, claims = entry
        return mint_token(secret, username, role, extra_claims=claims)
