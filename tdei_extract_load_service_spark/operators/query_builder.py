"""DynamicQueryBuilder — 1:1 API parity with the reference's
``DynamicQueryObject`` (src/database/dynamic-query-object.ts:5-66), the only
queries-over-tables surface in the reference codebase.

The reference builds a SQL string + bind-parameter list and hands it to
Postgres to plan. Here each builder call appends a *logical* DataFrame
transformation and ``get_query()`` returns the composed DataFrame — Catalyst
replaces Postgres as planner/executor, so the same builder program gets
predicate pushdown, column pruning and join selection for free.

Method map (reference line → method):
  buildSelect      (:30-32) → build_select
  buildInnerJoin   (:34-36) → build_inner_join   (same-named key only, as ref)
  condition        (:18-28) → condition           (conjunctive, parameterized)
  buildOrder       (:42-44) → build_order         (single column, ASC|DESC)
  buildPagination  (:45-58) → build_pagination    (page>=1, size in [1,50])
  getQuery         (:60-62) → get_query
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.operators import relational


class DynamicQueryBuilder:
    """Compose SELECT ⊕ JOIN* ⊕ WHERE ⊕ ORDER ⊕ LIMIT/OFFSET declaratively.

    Unlike the reference's mutable string fragments, state here is the
    pieces of a logical plan; nothing executes until the caller acts on the
    returned DataFrame.
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._base: DataFrame | None = None
        self._select: list[str] | None = None
        self._conditions: list[Column] = []
        self._order: list[Column] = []
        self._page_no: int | None = None
        self._page_size: int | None = None

    def build_select(self, table: str | DataFrame, columns: list[str]) -> "DynamicQueryBuilder":
        """``SELECT columns FROM table`` (dynamic-query-object.ts:30-32).

        ``table`` may be a registered view name or a DataFrame.
        """
        self._base = self._spark.table(table) if isinstance(table, str) else table
        self._select = list(columns)
        return self

    def build_inner_join(
        self, other: str | DataFrame, join_column: str, broadcast: bool = False
    ) -> "DynamicQueryBuilder":
        """``INNER JOIN other ON other.k = src.k`` (dynamic-query-object.ts:34-36).

        The reference only supports a same-named key; kept as the contract.
        ``broadcast=True`` is the engine's scale extension for dim tables.
        """
        if self._base is None:
            raise ValueError("build_select must be called before build_inner_join")
        right = self._spark.table(other) if isinstance(other, str) else other
        self._base = relational.join_inner(self._base, right, on=join_column, broadcast_right=broadcast)
        return self

    def condition(self, predicate: Column | str) -> "DynamicQueryBuilder":
        """Append one conjunct (dynamic-query-object.ts:18-28).

        Accepts a Column or a SQL predicate string; values are embedded in
        the expression tree (Catalyst literals), the moral equivalent of the
        reference's bind parameters.
        """
        self._conditions.append(F.expr(predicate) if isinstance(predicate, str) else predicate)
        return self

    def build_order(self, column: str, direction: str = "ASC") -> "DynamicQueryBuilder":
        """Single-column ORDER BY (dynamic-query-object.ts:42-44)."""
        col = F.col(column)
        self._order.append(col.desc() if direction.upper() == "DESC" else col.asc())
        return self

    def build_pagination(self, page_no: int = 1, page_size: int = 10) -> "DynamicQueryBuilder":
        """LIMIT/OFFSET with the reference's floors and the 50-row cap
        (dynamic-query-object.ts:45-58)."""
        self._page_no = page_no
        self._page_size = page_size
        return self

    def get_query(self) -> DataFrame:
        """Assemble the plan (dynamic-query-object.ts:60-62)."""
        if self._base is None:
            raise ValueError("build_select was never called")
        df = relational.filter_conjunctive(self._base, self._conditions)
        if self._select:
            df = df.select(*self._select)
        if self._page_no is not None or self._page_size is not None:
            if not self._order:
                raise ValueError("pagination requires build_order for deterministic results")
            return relational.paginate(
                df, self._order, page_no=self._page_no or 1, page_size=self._page_size or 10
            )
        if self._order:
            df = df.orderBy(*self._order)
        return df
