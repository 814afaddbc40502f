"""Plan-inspection helpers: assert the physical plans we designed for
actually materialize (pushdown reached the scan, joins broadcast,
no stray shuffles)."""

from tpg_weather_etl_spark.plans.audit import (  # noqa: F401
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
)
