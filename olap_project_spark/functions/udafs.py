"""Custom aggregate (UDAF) extension point: Arrow grouped-agg pandas
UDFs. Kept in its own module WITHOUT ``from __future__ import
annotations`` — pandas_udf infers the eval type from real annotation
objects, and stringified annotations with locally-imported pandas break
that inference."""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Geometric mean: exp(mean(ln(v))) — one vectorized numpy
    reduction per group (Arrow grouped-agg)."""
    return float(np.exp(np.log(v.to_numpy()).mean()))


@pandas_udf("long")
def group_size(v: pd.Series) -> int:
    """Group row count as a pandas UDAF — Spark refuses to mix
    grouped-agg pandas UDFs with built-in aggregates in one agg(), so
    companions must be pandas-side too."""
    return int(len(v))
