"""tdei_extract_load_service_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of TaskarCenterAtUW/TDEI-extract-load-service (reference studied
read-only at /root/reference; cited per-function as ``file:line``), extended
with large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Design stance (SURVEY.md §7): the reference is a single-threaded Node stream
pipeline; none of its hand-built machinery (token streaming, chunking,
backpressure, sequential-entry discipline) is ported. Every operator is a
pure ``DataFrame -> DataFrame`` function expressed with the declarative
DataFrame/SQL API so Catalyst owns optimization (pushdown, pruning, join
selection, codegen) and the plan scales from ``local[32]`` to a
1000-executor cluster unchanged.
"""

__version__ = "0.1.0"

from tdei_extract_load_service_spark.session import get_spark, load_tables  # noqa: F401
