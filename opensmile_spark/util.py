"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col) -> Column:
    """Fractional epoch seconds from TIMESTAMP or TIMESTAMP_NTZ.

    TIMESTAMP_NTZ cannot be cast to double directly (Spark 4); route through
    TIMESTAMP. The engine pins spark.sql.session.timeZone=UTC (session.py) so
    NTZ values are interpreted as UTC — matching DuckDB's naive epoch(ts)
    and keeping timestamp arithmetic oracle-comparable.
    """
    if isinstance(col, str):
        col = F.col(col)
    return col.cast("timestamp").cast("double")
