"""Concurrency gate: staggered clients, zero failures.

Mirrors the reference's CI concurrency variant
(/root/reference/tests/integration/test_tpch_benchmark.cpp:1078-1251):
10 staggered clients each run a query mix through their own session;
the run must produce zero failures and correct, session-isolated
results.
"""

from __future__ import annotations

import random
import threading
import time

import pytest

from gizmosql_spark.engine import Engine
from gizmosql_spark.operators import tpch

N_CLIENTS = 10
QUERIES_PER_CLIENT = 3


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


def test_staggered_clients_zero_failures(engine, spark, sf_dir):
    errors: list[tuple[int, Exception]] = []
    results: dict[int, list[int]] = {}

    mix = ["q01", "q06", "q14", "q19", "q12"]

    def client(i: int) -> None:
        try:
            time.sleep(0.05 * i)  # staggered start, like the reference
            sid = engine.create_session(role="user")
            rng = random.Random(i)
            counts = []
            for _ in range(QUERIES_PER_CLIENT):
                name = rng.choice(mix)
                df = tpch.QUERIES[name](spark, sf_dir)
                counts.append(df.count())
            # session-scoped temp state stays isolated per client
            st = engine.sessions[sid]
            st.spark.sql(f"CREATE OR REPLACE TEMP VIEW c_{i} AS SELECT {i} AS v")
            assert st.spark.sql(f"SELECT v FROM c_{i}").collect()[0].v == i
            results[i] = counts
            engine.close_session(sid)
        except Exception as e:  # noqa: BLE001 — recorded and asserted
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, f"client failures: {errors}"
    assert len(results) == N_CLIENTS
    for counts in results.values():
        assert all(c > 0 for c in counts)


def test_concurrent_settings_isolation(engine):
    """Parallel SET on different sessions must not leak across them."""
    sids = [engine.create_session(role="user") for _ in range(6)]
    try:
        def setter(i: int) -> None:
            engine.execute_sql(sids[i], f"SET engine.query_timeout = {10 + i}")

        threads = [threading.Thread(target=setter, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(30)
        for i, sid in enumerate(sids):
            st = engine.sessions[sid]
            assert st.settings.get("engine.query_timeout") == 10 + i
    finally:
        for sid in sids:
            engine.close_session(sid)
