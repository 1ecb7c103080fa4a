from hive_udf_spark.functions.sketch import (  # noqa: F401
    HLL_DEFAULT_B,
    LC_DEFAULT_SIZE,
    approx_distinct,
    approx_distinct_on,
    approx_distinct_table,
    approx_distinct_tuple,
    sketch_difference_estimate,
    sketch_estimate,
    sketch_intersect_estimate,
    sketch_jaccard_estimate,
    sketch_merge_agg,
    sketch_union,
)
from hive_udf_spark.functions.freq import (  # noqa: F401
    approx_top_k_agg,
    cms_join_size_estimate,
    cms_lookup,
    cms_table,
    top_k_exploded,
)
from hive_udf_spark.functions.kmv import (  # noqa: F401
    KMV_DEFAULT_K,
    kmv_estimate,
    kmv_difference_estimate,
    kmv_intersect_estimate,
    kmv_jaccard,
    kmv_merge_table,
    kmv_table,
    kmv_union,
)
from hive_udf_spark.functions.sql_registry import (  # noqa: F401
    expand_approx_distinct,
    register_sql,
)
from hive_udf_spark.functions.qsketch import (  # noqa: F401
    qsketch_quantile,
    quantile_sketch_table,
)
from hive_udf_spark.functions.pcsa import (  # noqa: F401
    PCSA_DEFAULT_M,
    pcsa_estimate,
    pcsa_merge_table,
    pcsa_table,
)
from hive_udf_spark.functions.bpe import (  # noqa: F401
    bpe_doc_token_counts,
    bpe_train,
)
from hive_udf_spark.functions.hllp import (  # noqa: F401
    HLLP_DEFAULT_M,
    hllp_estimate,
    hllp_intersect_estimate,
    hllp_merge_table,
    hllp_table,
)
