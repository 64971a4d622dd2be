"""Driver-contract registry consistency: every oracle has a query, every
oracle SQL parses and runs against schema-true (zero-row) views — catches
registration typos and SQL column drift before the driver does."""

import duckdb
import pytest

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def test_every_oracle_has_a_query():
    import __ray_entry__ as e

    q, s = e.queries(), e.oracle_sql()
    missing = set(s) - set(q)
    assert not missing, missing
    assert all(callable(f) for f in q.values())
    # the oracle-backed share stays the majority of the surface
    assert len(s) >= 80 and len(q) >= 110


def test_oracle_sql_parses_on_empty_views():
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet') LIMIT 0"
        )
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(sql).fetchdf()
        except Exception as ex:  # pragma: no cover - the assertion message
            pytest.fail(f"oracle {name} failed on empty views: {ex}")
