"""hive_udf_spark — a PySpark-native approximate-analytics engine.

Re-expresses the capability surface of the reference repo MLnick/hive-udf
(a Hive GenericUDAF for cardinality estimation via HyperLogLog and Linear
Counting — /root/reference/src/main/java/com/github/mlnick/hive/udaf/
UDAFCardinalityEstimator.java) as an idiomatic Spark DataFrame/SQL function
package, and extends it with the LLM-data-pipeline operator set (dedup,
similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Design tiers (SURVEY.md §3):
  Tier A — native Catalyst expressions (hll_sketch_agg & friends): the
           100 TB path; partial aggregation, whole-stage codegen for free.
  Tier B — composed JVM DataFrame expressions (Linear Counting, MinHash,
           SimHash over xxhash64/md5): still no Python in the hot loop.
  Tier C — Arrow-vectorized pandas UDFs, only where per-group imperative
           logic is unavoidable (sketch binary materialization, stubs).
"""

__version__ = "0.1.0"

from hive_udf_spark.functions.sql_registry import sql  # noqa: F401
from hive_udf_spark.session import get_spark  # noqa: F401
