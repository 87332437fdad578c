"""spread() guard honesty (ADVICE r4, medium): partition COUNT is a lying
proxy for scan parallelism — a giant single-row-group parquet file splits
into many byte ranges that each report a partition while only one emits
rows. The guard must consult row-group footers for scan frames, skip
shuffle-output frames without probing (df.rdd under AQE can execute
stages), and honor the explicit opt-out."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.session import spread


def _write_parquet(path: str, n_rows: int, row_group_size: int) -> None:
    # uncompressed + no dictionary so the on-disk size is real enough to
    # attract many byte-range splits under a small maxPartitionBytes
    table = pa.table({"id": pa.array(range(n_rows), type=pa.int64()),
                      "payload": pa.array([f"payload-{i:056d}" for i in range(n_rows)])})
    pq.write_table(table, path, row_group_size=row_group_size,
                   compression="NONE", use_dictionary=False)


def test_single_row_group_file_is_repartitioned_despite_byte_splits(spark, tmp_path):
    """The exact pathology from the advice: byte-range splits >= target but
    one row group. The old getNumPartitions() guard skipped the
    repartition and pinned all rows to one task; the footer-based guard
    must repartition."""
    path = str(tmp_path / "one_rg.parquet")
    _write_parquet(path, n_rows=20_000, row_group_size=1_000_000)  # 1 row group
    assert pq.ParquetFile(path).metadata.num_row_groups == 1

    target = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force >= target byte-range splits over the single row group
        spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
        df = spark.read.parquet(path)
        assert df.rdd.getNumPartitions() >= target, "fixture must exhibit the lie"
        out = spread(df)
        assert out is not df, "guard must see through the byte-range partition count"
        assert out.rdd.getNumPartitions() == target
        assert out.count() == 20_000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_many_row_group_file_is_left_alone(spark, tmp_path):
    """Real row-group parallelism (the 100 TB shape) must NOT be funneled
    through a needless full shuffle."""
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "many_rg.parquet")
    _write_parquet(path, n_rows=target * 100, row_group_size=100)
    assert pq.ParquetFile(path).metadata.num_row_groups >= target
    df = spark.read.parquet(path)
    assert spread(df) is df


def test_shuffle_output_frame_is_not_probed_or_repartitioned(spark):
    agg = (
        spark.range(1000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    assert spread(agg) is agg


def test_well_partitioned_opt_out(spark):
    df = spark.range(10).coalesce(1)
    assert spread(df, well_partitioned=True) is df


def test_in_memory_frame_still_spreads(spark):
    df = spark.range(100, numPartitions=1)
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_explicit_caller_partitioning_is_respected(spark):
    # coalesce/repartition in the lineage = the caller already chose a
    # partitioning; spread must not second-guess it
    df = spark.range(100).coalesce(1)
    assert spread(df) is df


def test_spread_factor_multiplies_target(spark):
    df = spark.range(100, numPartitions=1)
    out = spread(df, factor=2)
    assert out.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism


def test_keyed_spread_skips_round_robin_sort_and_preserves_rows(spark, tmp_path):
    """key= replaces keyless round-robin with deterministic hash
    partitioning (pmod(xxhash64(key), 100*target)): no local sort in the
    plan, every row present exactly once, and the same guard ladder
    (a well-partitioned frame is still left alone)."""
    path = str(tmp_path / "keyed_rg.parquet")
    _write_parquet(path, n_rows=20_000, row_group_size=1_000_000)
    df = spark.read.parquet(path)
    out = spread(df, key="id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # multiset of rows is unchanged
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).first()[0] == sum(range(20_000))
    # the exchange is hash-partitioned on the synthetic key, not
    # round-robin (whose determinism requires a local sort of the input)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "roundrobin" not in plan.lower()
    assert "xxhash64" in plan.lower()
    # guard ladder unchanged: a frame that already has the parallelism
    # is returned as-is even with a key
    many = str(tmp_path / "keyed_many_rg.parquet")
    target = spark.sparkContext.defaultParallelism
    _write_parquet(many, n_rows=target * 100, row_group_size=100)
    df2 = spark.read.parquet(many)
    assert spread(df2, key="id") is df2


def test_keyed_spread_distributes_rows(spark, tmp_path):
    """A high-cardinality key must actually spread rows across tasks —
    the point of the deterministic synthetic key (guide: 100x more
    distinct values than partitions)."""
    path = str(tmp_path / "keyed_dist.parquet")
    _write_parquet(path, n_rows=20_000, row_group_size=1_000_000)
    df = spark.read.parquet(path)
    out = spread(df, key="id")
    sizes = (
        out.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    non_empty = [r["count"] for r in sizes]
    target = spark.sparkContext.defaultParallelism
    assert len(non_empty) >= max(2, target // 2)
    assert max(non_empty) < 20_000  # not funneled into one task
