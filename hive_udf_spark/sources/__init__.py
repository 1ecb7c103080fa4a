from hive_udf_spark.sources.tables import TABLES, load_all, load_table, register_views  # noqa: F401
from hive_udf_spark.sources.sinks import (  # noqa: F401
    read_sketch_table,
    write_bucketed,
    write_partitioned,
    write_sketch_table,
)
from hive_udf_spark.sources.text_files import read_csv, read_jsonl, read_orc, write_orc  # noqa: F401
from hive_udf_spark.sources.delta import (  # noqa: F401
    checkpoint_delta,
    delta_snapshot,
    read_delta,
    write_delta_commits,
)
from hive_udf_spark.sources.iceberg import (  # noqa: F401
    iceberg_live_files,
    read_iceberg,
    write_iceberg_table,
)
from hive_udf_spark.sources.hudi import (  # noqa: F401
    hudi_live_files,
    hudi_timeline,
    read_hudi,
    write_hudi_table,
)
from hive_udf_spark.sources.changes import (  # noqa: F401
    delete_from_delta,
    read_delta_changes,
    read_hudi_incremental,
    read_iceberg_incremental,
)
from hive_udf_spark.sources.merge import (  # noqa: F401
    merge_into_delta,
    merge_into_hudi,
    merge_into_iceberg,
)
from hive_udf_spark.sources.txn import (  # noqa: F401
    CommitConflictError,
    publish_if_absent,
)
