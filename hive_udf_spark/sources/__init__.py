from hive_udf_spark.sources.tables import TABLES, load_all, load_table  # noqa: F401
