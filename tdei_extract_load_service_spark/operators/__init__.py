"""Named engine operators (SURVEY.md §2.4).

Each operator is a pure ``DataFrame -> DataFrame`` function so plans compose
declaratively and Catalyst optimizes the whole chain.
"""

from tdei_extract_load_service_spark.operators.relational import (  # noqa: F401
    agg_group,
    filter_conjunctive,
    join_anti,
    join_inner,
    join_semi,
    paginate,
    project,
    route_case,
    sort,
    top_k,
)
from tdei_extract_load_service_spark.operators.query_builder import (  # noqa: F401
    DynamicQueryBuilder,
)
