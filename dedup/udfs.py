"""Pandas UDFs whose kind is inferred from REAL type hints.

NO ``from __future__ import annotations`` here, on purpose: PySpark
derives the pandas-UDF flavor (scalar / grouped-agg) from the evaluated
annotation objects, and the future import would turn them into plain
strings it cannot parse (UNSUPPORTED_SIGNATURE).
"""

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def mean_udf(v: pd.Series) -> float:
    """GROUPED_AGG (Series → scalar): plain mean, the F7 custom-UDAF
    demo. Exact for integer inputs (int64 sum / count in float64)."""
    return float(v.mean())
