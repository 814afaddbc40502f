"""Column-expression function layer (the reference's "macro" surface).

The reference registers four DuckDB SQL macros (src/common.py:200-257)
and re-derives several scalar expressions inline in its feature
builders. Here every scalar becomes a plain Python function returning a
``pyspark.sql.Column`` — zero serialization cost, fully visible to
Catalyst, no UDFs.
"""

from tpg_weather_etl_spark.functions.macros import (  # noqa: F401
    delay_minutes,
    minute_diff,
    rain_bin,
    robust_bool,
    second_diff,
    status_rank,
    temp_bin,
    wind_bin,
)
from tpg_weather_etl_spark.functions.time import (  # noqa: F401
    cyclic_hour_cos,
    cyclic_hour_sin,
    dow_monday0,
    month_key,
    time_bin,
)
from tpg_weather_etl_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    norm_text,
    punct_ratio,
    stable_hash60,
    stopword_hits,
    token_count,
)
from tpg_weather_etl_spark.functions.vectors import (  # noqa: F401
    cosine_from_norms,
    cosine_from_parts,
    cosine_similarity,
    dot_product,
    dot_product_d,
    l2_norm,
)
