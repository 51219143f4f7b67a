"""Grouped-map Pandas operators (``applyInPandas``).

The escape hatch for semantics the built-in operators genuinely cannot
express (model scoring, scipy transforms, per-group fitting). Everything
here ALSO has a built-in twin in this repo — the tests pin the two
implementations against each other, which is the pattern to follow:
never ship a Pandas-UDF path without a plan-native reference
implementation to validate it.

Scale: applyInPandas shuffles on the group key and materializes ONE GROUP
per pandas DataFrame — groups must fit in executor memory. For skewed
group sizes prefer mapInPandas (batch-bounded) or the window form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def zscore_grouped(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_cols: list[str],
    decimals: int = 4,
) -> DataFrame:
    """applyInPandas twin of windows.zscore_normalize (same output shape)."""
    import numpy as np

    out_schema = ", ".join(
        [f"{c} {t}" for c, t in df.select(*id_cols, key_col, value_col).dtypes]
        + ["zscore double"]
    )

    def normalize(pdf):
        v = pdf[value_col]
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std and std > 0 else np.nan
        out = pdf[[*id_cols, key_col, value_col]].copy()
        out["zscore"] = np.round(z, decimals)
        return out

    return df.groupBy(key_col).applyInPandas(normalize, out_schema)
