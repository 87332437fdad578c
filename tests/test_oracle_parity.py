"""Local mirror of the driver's t2 gate at sf0.001: every catalog query with
an oracle must match DuckDB exactly (count + columns + value multiset)."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tools.oracle_check import TABLES, rows_to_multiset


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


def _cases():
    from tdei_extract_load_service_spark.catalog import REGISTRY

    return [(name, e) for name, e in REGISTRY.items()]


@pytest.mark.parametrize("name,entry", _cases(), ids=[n for n, _ in _cases()])
def test_query_matches_oracle(spark, duck, name, entry):
    sdf = entry.query(spark, SF_SMOKE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    if entry.oracle is None:
        assert len(spark_rows) >= 0  # rows-only contract
        return
    res = duck.execute(entry.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert rows_to_multiset(spark_cols, spark_rows) == rows_to_multiset(duck_cols, duck_rows)
