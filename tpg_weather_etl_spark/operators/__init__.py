"""Reusable relational operators the built-in DataFrame API lacks.

Each operator is a composition of existing DataFrame ops (never a
driver-side loop, never a row-at-a-time UDF) so Catalyst/AQE still
optimize through it.
"""

from tpg_weather_etl_spark.operators.dedupe import (  # noqa: F401
    exact_dedupe,
    group_median_dedupe,
    priority_dedupe,
)
from tpg_weather_etl_spark.operators.quantiles import (  # noqa: F401
    discrete_quantile_expr,
    with_group_quantiles,
)
from tpg_weather_etl_spark.operators.asof import asof_join  # noqa: F401
from tpg_weather_etl_spark.operators.sampling import deterministic_sample  # noqa: F401
