"""End-to-end COPY bulk load over a real socket (no live Postgres).

Upgrades the fake-connection unit pins: `copy_into_postgres` and
`bulk_load_with_constraint_hooks` run through genuine
``foreachPartition`` executor calls, streaming length-framed COPY
payloads over TCP to an in-process server (tests/pg_loopback.py) that
applies psycopg2-style commit semantics and ``FORMAT csv, NULL ''``
parsing. Mirrors reference `reports_exporter_v0.83.py:1357-1372`
(COPY-from-buffer bulk load) and `:1801-1835` (constraint lifecycle
around loads above the 400k-row threshold).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.pg_loopback import FakePgServer, make_loopback_connect, parse_copy_csv
from train_reports_etl_spark.sinks.jdbc_copy import (
    bulk_load_with_constraint_hooks,
    constraint_sql_hooks,
    copy_into_postgres,
    encode_csv_rows,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("note", T.StringType()),
    ]
)

# NULL vs empty string, embedded quote/comma/newline, unicode — every
# encoding edge the COPY CSV path must round-trip.
ROWS = [
    (1, "plain", "ok"),
    (2, None, ""),  # NULL vs genuine empty string in one row
    (3, 'quote " inside', "comma, inside"),
    (4, "newline\ninside", "crlf\r\ninside"),
    (5, "unicodé — ✓", None),
]
EXPECTED = {tuple(None if v is None else str(v) for v in r) for r in ROWS}


def test_parse_copy_csv_inverts_encode():
    text, n = encode_csv_rows(iter(ROWS))
    assert n == len(ROWS)
    parsed = parse_copy_csv(text)
    assert {tuple(r) for r in parsed} == EXPECTED


def test_parse_copy_csv_edge_payloads():
    # newline-less payloads: a trailing comma still owes a NULL field
    assert parse_copy_csv("a,") == [["a", None]]
    assert parse_copy_csv("a") == [["a"]]
    assert parse_copy_csv('a,""') == [["a", ""]]
    assert parse_copy_csv("a,\r\n") == [["a", None]]
    assert parse_copy_csv("") == []
    assert parse_copy_csv(",") == [[None, None]]


def test_copy_into_postgres_over_socket(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(4)
    with FakePgServer() as server:
        copy_into_postgres(
            df,
            f"host=127.0.0.1 port={server.port} dbname=test",
            "analytics.loopback",
            connect=make_loopback_connect(server.port),
        )
        assert set(server.tables['"analytics"."loopback"']) == EXPECTED
        # one committed COPY per non-empty partition, each ≤ len(ROWS)
        commits = [e for e in server.events if e[0] == "copy_commit"]
        assert sum(e[2] for e in commits) == len(ROWS)
        assert 1 <= len(commits) <= 4


def test_bulk_load_constraint_hooks_over_socket(spark):
    """Above the row threshold: drop-constraints DDL strictly precedes
    every executor COPY commit, recreate-DDL strictly follows — the
    reference's `:1801-1835` ordering, observed on the server's
    globally-ordered event log."""
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(3)
    with FakePgServer() as server:
        dsn = f"host=127.0.0.1 port={server.port} dbname=test"
        connect = make_loopback_connect(server.port)
        pre, post = constraint_sql_hooks(
            dsn,
            "SELECT analytics.remove_constraints('loopback')",
            "SELECT analytics.recreate_loopback_constraints()",
            connect=connect,
        )
        n = bulk_load_with_constraint_hooks(
            df,
            dsn,
            "analytics.loopback",
            pre_load=pre,
            post_load=post,
            row_threshold=0,  # force the constraint lifecycle
            connect=connect,
        )
        assert n == len(ROWS)
        assert set(server.tables['"analytics"."loopback"']) == EXPECTED
        kinds = [e[0] for e in server.events]
        assert kinds[0] == "exec" and "remove_constraints" in server.events[0][1]
        assert kinds[-1] == "exec" and "recreate" in server.events[-1][1]
        assert all(k == "copy_commit" for k in kinds[1:-1])
        assert kinds.count("copy_commit") >= 1


def test_below_threshold_skips_constraint_ddl(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with FakePgServer() as server:
        dsn = f"host=127.0.0.1 port={server.port} dbname=test"
        connect = make_loopback_connect(server.port)
        pre, post = constraint_sql_hooks(dsn, "SELECT drop", "SELECT add", connect=connect)
        bulk_load_with_constraint_hooks(
            df,
            dsn,
            "t",
            pre_load=pre,
            post_load=post,
            row_threshold=100,  # 5 rows < 100: no DDL
            connect=connect,
        )
        assert all(e[0] == "copy_commit" for e in server.events)  # no DDL
        assert set(server.tables['"t"']) == EXPECTED


def test_failed_partition_commits_nothing(spark):
    """A partition whose stream dies mid-COPY must leave no rows behind
    (psycopg2 transaction semantics: staged COPY discarded on close
    without commit)."""
    df = spark.createDataFrame(ROWS, SCHEMA).repartition(1)
    with FakePgServer() as server:
        # Bind the factory's RESULT (a by-value-picklable closure), not
        # the tests-module factory itself, into the executor closure.
        base_connect = make_loopback_connect(server.port)

        def poisoned_connect(dsn):
            conn = base_connect(dsn)
            real_commit = conn.commit

            def failing_commit():
                conn.close()  # simulate the socket dying before commit
                real_commit()

            conn.commit = failing_commit
            return conn

        with pytest.raises(Exception):
            copy_into_postgres(df, f"port={server.port}", "t", connect=poisoned_connect)
        assert server.tables.get('"t"', []) == []
        assert [e for e in server.events if e[0] == "copy_commit"] == []
