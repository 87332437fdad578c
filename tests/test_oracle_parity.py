"""Local mirror of the driver's t2 gate at sf0.001: every catalog query with
an oracle must match DuckDB exactly — compared the way the DRIVER compares
(pandas frames, dtype-faithful cells), not via lossy value stringification.
Round 8 proved the two gates can disagree: DuckDB returns HUGEINT for
``SUM(<integer>)``, pandas renders HUGEINT as float64, and the driver's
hash rejects ``4.0`` vs ``4`` while a string-normalizing compare accepts
it.  ``tools/oracle_check.compare_frames`` is the single shared canon.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from tools.oracle_check import TABLES, compare_frames


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
    spark_pdf = sdf.toPandas()
    if entry.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract
        return
    duck_pdf = duck.execute(entry.oracle).df()
    problems = compare_frames(spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


# --- static driver-canon contract audit (no Spark, DESCRIBE only) --------
#
# The two r8 failure classes are both visible in the oracle's PLANNED
# output schema, before any row is produced:
#   1. HUGEINT columns (un-cast SUM over an integer column) — pandas
#      renders HUGEINT as float64 while Spark yields int64, and the
#      driver's dtype-sensitive hash rejects the skew.
#   2. LIST / STRUCT / MAP output columns — the driver's pandas
#      canonicalization (sort_values -> factorize) crashes on unhashable
#      cells.
# DuckDB's ``DESCRIBE <query>`` types the result without executing it, so
# this audit is a cheap always-on gate over the ENTIRE catalog.  It fails
# on pre-round-9 HEAD (7 HUGEINT oracles + 2 LIST oracles) and must stay
# green for every future oracle.

_BANNED_TYPE_MARKS = ("HUGEINT", "[]", "STRUCT(", "MAP(")


def test_oracle_output_types_are_driver_hashable(duck):
    from tdei_extract_load_service_spark.catalog import REGISTRY

    offenders = []
    for name, entry in REGISTRY.items():
        if entry.oracle is None:
            continue
        for col, typ, *_ in duck.execute(f"DESCRIBE {entry.oracle}").fetchall():
            t = typ.upper()
            if any(mark in t for mark in _BANNED_TYPE_MARKS):
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle columns the driver canon cannot hash faithfully "
        "(CAST integer SUMs to BIGINT; serialize arrays/structs on both "
        f"sides): {offenders}"
    )
