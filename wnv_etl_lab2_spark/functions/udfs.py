"""The Python-UDF surface, done the fast way (SURVEY.md §2.2).

The reference's only UDF is the row-at-a-time geocoder (O4). Spark's
equivalent surface, in preference order: built-in expressions (used
everywhere else in this repo), Arrow-vectorized pandas UDFs (here),
applyInPandas for grouped UDAFs (here), mapInPandas for per-partition
kernels (operators/multimodal.py, operators/enrichment.py). Never
row-at-a-time `F.udf` — it pays serde per row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quality_score_kernel(text: pd.Series) -> pd.Series:
    """Vectorized document quality score in [0, 1]: length saturation
    x alpha-density (the classic cheap pre-filter for training data).
    One Arrow batch in, one out — no per-row Python dispatch."""
    n = text.str.len().clip(lower=1)
    length_sat = (n / 500.0).clip(upper=1.0)
    alpha_ratio = text.str.count(r"[A-Za-z ]") / n
    return (length_sat * alpha_ratio).astype("float64")


def quality_score_udf():
    """Built lazily: pandas_udf parses its DDL return type against the
    active session, so the decorator can't run at import time."""
    return F.pandas_udf(_quality_score_kernel, "double")


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("quality", quality_score_udf()(F.col(text_col)))


def address_parts_udtf():
    """Python UDTF (Spark 4): one address string in, one row per
    component out — the table-function leg of the UDF/UDAF/UDTF
    surface. Built lazily like the pandas UDF above."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="part_idx int, part string")
    class AddressParts:
        def eval(self, addr: str):
            if not addr:
                return
            for i, part in enumerate(addr.split(" ")):
                yield (i, part)

    return AddressParts


def trimmed_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim: float = 0.1,
) -> DataFrame:
    """Grouped UDAF via applyInPandas: mean of the values with the top
    and bottom ``trim`` fraction removed — a robust statistic with no
    built-in Spark form. Each group is one pandas frame; the shuffle
    is the same single exchange a built-in groupBy would do."""
    group_type = df.schema[group_col].dataType.simpleString()
    out_schema = f"{group_col} {group_type}, trimmed_mean double, n_used long"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].sort_values()
        k = int(len(v) * trim)
        used = v.iloc[k : len(v) - k] if len(v) > 2 * k else v
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "trimmed_mean": [float(used.mean())],
                "n_used": [len(used)],
            }
        )

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        per_group, schema=out_schema
    )
