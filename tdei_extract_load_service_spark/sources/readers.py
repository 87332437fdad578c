"""Format-dispatched table readers — source breadth beyond the reference's
JSON-in-zip (SURVEY.md §2.3: "CSV/Parquet/ORC/Avro readers — engine gets
Parquet free"). One entry point, per-format defaults, schema-or-infer.

Scale notes: parquet/orc carry schema + stats (pushdown, pruning); CSV/JSON
get an explicit schema whenever the caller has one — schema inference is a
full extra pass over the data at 100 TB. ``permissive_corrupt_column``
wires the dead-letter pattern for semi-structured inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXTENSION_FORMATS = {
    ".parquet": "parquet",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".orc": "orc",
    ".avro": "avro",
}

CORRUPT_COL = "_corrupt_record"


def infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    if ext in _EXTENSION_FORMATS:
        return _EXTENSION_FORMATS[ext]
    raise ValueError(f"cannot infer format from path {path!r}; pass fmt=")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    options: dict[str, str] | None = None,
    corrupt_column: bool = False,
) -> DataFrame:
    """Read a table of any supported format.

    ``corrupt_column=True`` (json/csv): PERMISSIVE mode with an explicit
    ``_corrupt_record`` column so malformed rows are *visible* instead of
    silently nulled — pair with ``split_corrupt``.
    """
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if schema is not None:
        if corrupt_column and fmt in ("json", "csv"):
            schema = f"{schema}, {CORRUPT_COL} string"
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", CORRUPT_COL
            )
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    try:
        return reader.load(path)
    except Exception as exc:  # noqa: BLE001
        # spark-avro is a separate package: surface a typed gate, not a
        # raw datasource-lookup failure (SURVEY.md stub-or-gate policy)
        if "Failed to find data source" in str(exc):
            raise NotImplementedError(
                f"{fmt} support requires the corresponding Spark package on the classpath"
            ) from exc
        raise


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: (valid rows sans corrupt column, corrupt rows).

    The batch load path hard-fails on malformed entries (reference O21
    parity); streams can't stop the world — corrupt rows route to a
    dead-letter sink for replay instead of being silently dropped.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"DataFrame has no {CORRUPT_COL} column; read with corrupt_column=True")
    # Spark disallows referencing ONLY the internal corrupt column of a raw
    # json/csv scan; caching the parsed frame is the documented unlock (and
    # both halves read it anyway)
    df = df.cache()
    valid = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return valid, corrupt
