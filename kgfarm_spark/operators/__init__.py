from kgfarm_spark.operators.asof import asof_join
from kgfarm_spark.operators.windows import (
    lag_lead_features,
    rolling_aggregates,
    sessionize,
    role_transitions,
    backfill_features,
)

__all__ = [
    "asof_join",
    "lag_lead_features",
    "rolling_aggregates",
    "sessionize",
    "role_transitions",
    "backfill_features",
]
