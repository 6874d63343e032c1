"""Auth + catalog-permission tests (gizmosql_security.cpp /
catalog_permissions_handler.cpp analogs): basic-credential token
minting, signature/expiry verification, role claims driving session
privileges, catalog ACL wildcards."""

from __future__ import annotations

import pytest

from gizmosql_spark import auth, security
from gizmosql_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine(spark=spark)
    eng.add_user("alice", "wonderland", role="admin")
    eng.add_user("bob", "builder", role="readonly")
    eng.add_user(
        "carol",
        "x",
        role="user",
        read_catalogs=["spark_catalog", "dev_*"],
        write_catalogs=["dev_*"],
    )
    return eng


def test_password_hash_roundtrip():
    h = auth.hash_password("s3cret")
    assert auth.verify_password("s3cret", h)
    assert not auth.verify_password("wrong", h)


def test_token_mint_and_verify():
    tok = auth.mint_token("k", "u", "admin", extra_claims={"read_catalogs": ["a"]})
    claims = auth.verify_token("k", tok)
    assert claims["sub"] == "u"
    assert claims["role"] == "admin"
    assert claims["read_catalogs"] == ["a"]


def test_token_bad_signature_rejected():
    tok = auth.mint_token("k", "u", "admin")
    with pytest.raises(auth.AuthError):
        auth.verify_token("other-key", tok)
    with pytest.raises(auth.AuthError):
        auth.verify_token("k", tok[:-4] + "AAAA")


def test_token_expiry():
    tok = auth.mint_token("k", "u", "user", ttl_seconds=-10)
    with pytest.raises(auth.AuthError):
        auth.verify_token("k", tok)


def test_engine_basic_auth_flow(engine):
    tok = engine.authenticate("alice", "wonderland")
    sid = engine.create_session(token=tok)
    st = engine.sessions[sid]
    assert st.role == "admin" and st.username == "alice"
    # admin may run gated statements (local file read)
    res = engine.execute_sql(
        sid, "SELECT 1 AS x"
    )
    assert engine.collect(sid, res)[0]["x"] == 1
    engine.close_session(sid)


def test_engine_rejects_bad_credentials(engine):
    with pytest.raises(auth.AuthError):
        engine.authenticate("alice", "nope")
    with pytest.raises(auth.AuthError):
        engine.authenticate("nobody", "x")


def test_token_role_overrides_requested(engine):
    tok = engine.authenticate("bob", "builder")
    sid = engine.create_session(role="admin", token=tok)  # claim ignored
    assert engine.sessions[sid].role == "readonly"
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(sid, "CREATE TABLE t_auth_x AS SELECT 1 AS a")
    engine.close_session(sid)


def test_catalog_acl_wildcards():
    assert security.catalog_allowed(["dev_*"], "dev_lake")
    assert not security.catalog_allowed(["dev_*"], "prod")
    assert security.catalog_allowed(None, "anything")


def test_catalog_acl_enforced(engine):
    tok = engine.authenticate("carol", "x")
    sid = engine.create_session(token=tok)
    # allowed: default catalog read
    res = engine.execute_sql(sid, "SELECT 1 AS x")
    assert engine.collect(sid, res)[0]["x"] == 1
    # denied: reading an unauthorized catalog
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(sid, "SELECT * FROM prod_cat.default.secrets")
    # denied: writing the default catalog (write ACL = dev_* only)
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(sid, "INSERT INTO t_acl VALUES (1)")
    engine.close_session(sid)


def test_ddl_write_target_extraction():
    from gizmosql_spark.dialect import ddl_write_target

    assert ddl_write_target("CREATE TABLE prod.db.t AS SELECT 1") == "prod.db.t"
    assert ddl_write_target("CREATE OR REPLACE TABLE t2 (a INT)") == "t2"
    assert ddl_write_target("DROP TABLE IF EXISTS prod.db.t") == "prod.db.t"
    assert ddl_write_target("ALTER TABLE t ADD COLUMN c INT") == "t"
    assert ddl_write_target("TRUNCATE TABLE prod.db.t") == "prod.db.t"
    assert ddl_write_target("DROP VIEW v1") == "v1"
    # TEMP views are session-local, not a catalog write
    assert ddl_write_target("CREATE TEMP VIEW v AS SELECT 1") is None
    assert ddl_write_target("CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 1") is None
    assert ddl_write_target("SELECT * FROM t") is None


def test_catalog_acl_gates_ddl(engine):
    """CREATE TABLE AS / DROP TABLE against a non-writable catalog are
    denied just like DML (reference: modified_databases covers DDL)."""
    tok = engine.authenticate("carol", "x")
    sid = engine.create_session(token=tok)
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(sid, "CREATE TABLE t_ddl_acl AS SELECT 1 AS a")
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(sid, "DROP TABLE IF EXISTS spark_catalog.default.x")
    with pytest.raises(security.CommandDenied):
        engine.execute_sql(sid, "TRUNCATE TABLE some_table")
    # TEMP VIEW creation stays allowed (session-local)
    engine.execute_sql(sid, "CREATE OR REPLACE TEMP VIEW v_acl AS SELECT 1 AS a")
    engine.close_session(sid)


def test_struct_field_access_not_a_catalog_ref():
    """Qualified struct access (alias.col.field) must not parse as a
    catalog reference — it used to spuriously deny ACL'd sessions."""
    # alias 'e' is not a catalog: allowed
    security.check_catalog_access(
        "SELECT e.props.k FROM events e",
        read_catalogs=["spark_catalog"], write_catalogs=None,
        write_target=None,
    )
    # real three-part reference in FROM position: denied
    with pytest.raises(security.CommandDenied):
        security.check_catalog_access(
            "SELECT * FROM prod.db.t",
            read_catalogs=["spark_catalog"], write_catalogs=None,
            write_target=None,
        )
    # comma continuation of a FROM list is still caught
    with pytest.raises(security.CommandDenied):
        security.check_catalog_access(
            "SELECT * FROM spark_catalog.default.a, prod.db.t",
            read_catalogs=["spark_catalog"], write_catalogs=None,
            write_target=None,
        )
    # JOIN position caught, struct access in SELECT list ignored
    security.check_catalog_access(
        "SELECT a.b.c FROM t1 a JOIN spark_catalog.default.t2 b ON a.id = b.id",
        read_catalogs=["spark_catalog"], write_catalogs=None,
        write_target=None,
    )
