"""Sequence packing + embedding quantization — training-data pipeline
operators (north-star extension, BASELINE.json: the ops a large-scale
LLM data pipeline runs between dedup and the trainer).

Both are single-pass declarative plans:

- ``pack_sequences``: assign documents to fixed-token-budget bins by
  contiguous fill over a deterministic order (the streaming-order packing
  real pipelines use: lay documents end-to-end and cut every ``budget``
  tokens). One window cumsum — one shuffle on the ordering, no iteration.
  A bin's documents are contiguous in the order, so downstream writers can
  ``partitionBy(bin_id)`` and read each training shard sequentially.
- ``quantize_embeddings``: per-vector symmetric int8 quantization
  (scale = max|v|, q_i = trunc(v_i / scale * 127)) entirely in
  higher-order functions — the compression step before ANN index build or
  shipping embeddings to a trainer. Truncation (not rounding) is chosen
  deliberately: CAST AS INT truncates toward zero identically in Spark
  and ANSI SQL engines, making the op value-verifiable cross-engine,
  while round-half-even vs half-away differs.

Scale notes: packing's only shuffle is the global ordering (range
partition by the sort key); at 100 TB pack within coarse shards instead
(pass ``partition_cols``) so each shard orders independently — the same
trick every distributed sort uses. Quantization is a pure projection —
no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str | Column,
    budget: int,
    partition_cols: tuple[str, ...] = (),
    allow_global_sort: bool = False,
) -> DataFrame:
    """Contiguous-fill sequence packing: documents laid end-to-end in
    deterministic ``id`` order are cut into bins every ``budget`` tokens.

    Returns (id, n_tokens, bin_id, bin_offset): ``bin_id`` = which
    training shard the document STARTS in, ``bin_offset`` = its first
    token's position within that bin (documents may straddle a boundary —
    the standard packed-dataset layout where the trainer reads shards as
    one token stream).

    Shape: one window cumulative sum over the (optionally sharded)
    ordering. With ``partition_cols`` the cumsum is per shard — no global
    sort at scale. WITHOUT them the window is one total order
    (``Window.orderBy`` with no partition = a single task holding the
    whole corpus), which only makes sense for bounded inputs — so it must
    be requested explicitly with ``allow_global_sort=True``; a 100 TB
    caller that forgets ``partition_cols`` gets this error, not a
    silently-pinned single task.
    """
    nt = _col(n_tokens_col)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(id_col)
    elif allow_global_sort:
        w = Window.orderBy(id_col)
    else:
        raise ValueError(
            "pack_sequences without partition_cols is a single total order "
            "(one task holds the whole corpus). Pass partition_cols to pack "
            "within shards, or allow_global_sort=True for bounded inputs."
        )
    pre = (F.sum(nt).over(w) - nt).cast("bigint")
    out_cols = [
        _col(id_col).alias("id") if id_col != "id" else F.col("id"),
        nt.cast("bigint").alias("n_tokens"),
        # explicit floor: double-division-then-int-cast truncates toward
        # zero in Spark but ROUNDS in some SQL engines — floor is the one
        # spelling every engine agrees on
        F.floor(pre / budget).cast("bigint").alias("bin_id"),
        (pre % budget).alias("bin_offset"),
    ]
    return df.select(*[F.col(c) for c in partition_cols], *out_cols)


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, bits_range: int = 127
) -> DataFrame:
    """Symmetric int8 quantization per vector: ``scale = max(|v_i|)``,
    ``q_i = trunc(v_i / scale * bits_range)`` — all ``F.transform``/
    ``F.aggregate`` higher-order functions, zero Python on the data path.

    Returns (id, n_dims, scale, q_checksum) where ``q_checksum`` =
    ``sum(q_i * (i+1))`` — the same position-weighted checksum shape the
    multimodal decode oracle uses, so the full quantized vector is
    value-verified without shipping arrays through the comparator.
    All-zero vectors quantize to zeros (scale 0 guarded).

    No shuffle — but DO spread single-row-group scans: the per-vector
    higher-order-function work is real compute, and a one-partition
    input pins it to one core."""
    from tdei_extract_load_service_spark.session import spread

    df = spread(df)
    v = F.transform(_col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(v, lambda x: F.when(scale > 0, (x / scale * bits_range).cast("int")).otherwise(F.lit(0)))
    checksum = F.aggregate(
        F.zip_with(q, F.sequence(F.lit(1), F.size(q)), lambda qi, i: qi.cast("bigint") * i),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(
        _col(id_col).alias("id"),
        F.size(v).alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        checksum.alias("q_checksum"),
    )


def embedding_normalize(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Unit-L2-normalize an embedding column — the prep step cosine
    pipelines assume (after it, dot product IS cosine). Returns
    ``(id_col, unit array<double>, norm)``; zero vectors pass through
    unscaled with norm 0 (dividing by zero would poison downstream
    aggregates with NaN/Inf).

    Scale shape: a pure projection; the norm is ONE left fold (the
    engines' shared dot-product order, so the DuckDB oracle matches
    bit-identically) and the scaling one ``transform``. No shuffle."""
    v = _col(vec_col)
    norm = F.sqrt(
        F.aggregate(
            v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
    )
    staged = df.select(_col(id_col).alias(id_col), v.alias("_v"), norm.alias("_n"))
    unit = F.when(
        F.col("_n") == 0.0, F.transform("_v", lambda x: x.cast("double"))
    ).otherwise(F.transform("_v", lambda x: x.cast("double") / F.col("_n")))
    return staged.select(
        id_col,
        unit.alias("unit"),
        F.round(F.col("_n"), 6).alias("norm"),
    )
