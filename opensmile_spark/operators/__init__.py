from opensmile_spark.operators.windows import (  # noqa: F401
    clamped_lag,
    clamped_lead,
    delta_regression,
    preemphasis,
    sma,
    trailing_agg,
)
from opensmile_spark.operators.sessionize import sessionize, session_bounds  # noqa: F401
from opensmile_spark.operators.asof import asof_join, backfill_functionals  # noqa: F401
