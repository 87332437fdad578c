"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names and
an order-insensitive multiset of stringified row values. Stricter-or-equal
to any reasonable hash the driver uses: if this passes with exact string
equality, any order-insensitive value hash matches.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(value) -> str:
    """Render a cell the way both engines should agree on."""
    import datetime
    import math

    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(value)
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(normalize(v) for v in value) + "]"
    if isinstance(value, dict):
        return "{" + ",".join(f"{k}:{normalize(v)}" for k, v in sorted(value.items())) + "}"
    if isinstance(value, datetime.datetime):
        return value.isoformat()
    return str(value)


def rows_to_multiset(columns, rows) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter("|".join(normalize(row[i]) for i in order) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-shaped session: NO engine confs (no AQE/shuffle-partition
        # tuning) and a deliberately non-UTC timezone — correctness must
        # not depend on get_spark's configuration, exactly as when the
        # external driver imports __spark_entry__ into its own session
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("oracle_check_vanilla")
            .config("spark.sql.session.timeZone", "America/Los_Angeles")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
    else:
        from tdei_extract_load_service_spark.session import get_spark

        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures, checked, rows_only = [], 0, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        checked += 1
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"columns spark={spark_cols} duck={duck_cols}")
        else:
            s_ms = rows_to_multiset(spark_cols, spark_rows)
            d_ms = rows_to_multiset(duck_cols, duck_rows)
            if s_ms != d_ms:
                extra_s = list((s_ms - d_ms).items())[:3]
                extra_d = list((d_ms - s_ms).items())[:3]
                problems.append(f"values spark-only={extra_s} duck-only={extra_d}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")

    print(
        f"\n{checked} oracle-checked, {len(rows_only)} rows-only, {len(failures)} failures"
        + (f": {[n for n, _ in failures]}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
