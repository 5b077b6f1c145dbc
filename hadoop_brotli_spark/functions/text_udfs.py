"""Arrow-vectorized text UDFs.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
infers the eval type from real (non-string) type hints.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def readability_score(text: pd.Series, n_chars: pd.Series) -> pd.Series:
    """log1p(n_chars) + 0.1 * word_count, rounded to 6 — computed
    whole-batch in numpy over Arrow-transferred columns."""
    import numpy as np

    n_words = text.str.split(" ").str.len().astype("float64")
    return np.round(np.log1p(n_chars.astype("float64")) + 0.1 * n_words, 6)
