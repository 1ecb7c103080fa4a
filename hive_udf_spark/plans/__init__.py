"""Query registry: every SURVEY.md §2 operator exposes a named query.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB-runnable ANSI SQL oracle (or None for ops whose
semantics are not SQL-expressible — the driver then records a rows-only
check). Importing this package populates the registry.
"""

from hive_udf_spark.plans.registry import QUERIES, oracle_sql_map, queries_map, register  # noqa: F401

# Import for registration side effects.
from hive_udf_spark.plans import (  # noqa: E402,F401
    dedup_queries,
    freq_queries,
    pipeline_queries,
    relational_queries,
    retrieval_queries,
    similarity_queries,
    sketch_queries,
    streaming_queries,
    temporal_queries,
    text_queries,
    web_queries,
)
