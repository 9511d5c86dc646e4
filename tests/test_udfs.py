"""pandas UDF / applyInPandas UDAF surface vs pandas ground truth."""

from __future__ import annotations

import pandas as pd

from wnv_etl_lab2_spark.functions.udfs import trimmed_mean_by_group, with_quality_score
from wnv_etl_lab2_spark.sources.catalog import load_table


def test_quality_score_vectorized(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    out = with_quality_score(docs).select("doc_id", "quality").toPandas()
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    # ground truth for one row
    row = docs.limit(1).collect()[0]
    n = max(len(row.text), 1)
    expected = min(n / 500.0, 1.0) * (sum(c.isalpha() or c == " " for c in row.text) / n)
    got = out.set_index("doc_id").loc[row.doc_id, "quality"]
    assert abs(got - expected) < 1e-9


def test_address_parts_udtf(spark):
    from wnv_etl_lab2_spark.functions.udfs import address_parts_udtf

    AddressParts = address_parts_udtf()
    spark.udtf.register("address_parts", AddressParts)
    rows = spark.sql(
        "SELECT p.* FROM VALUES ('825 Walnut St') t(a), LATERAL address_parts(a) p"
    ).collect()
    assert [(r.part_idx, r.part) for r in rows] == [(0, "825"), (1, "Walnut"), (2, "St")]


def test_trimmed_mean_matches_pandas(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    got = (
        trimmed_mean_by_group(orders, "o_orderpriority", "o_totalprice", trim=0.1)
        .toPandas()
        .set_index("o_orderpriority")
        .sort_index()
    )
    pdf = orders.select("o_orderpriority", "o_totalprice").toPandas()

    def tm(v: pd.Series) -> float:
        v = v.sort_values()
        k = int(len(v) * 0.1)
        return float((v.iloc[k : len(v) - k] if len(v) > 2 * k else v).mean())

    truth = pdf.groupby("o_orderpriority")["o_totalprice"].apply(tm).sort_index()
    assert ((got["trimmed_mean"] - truth).abs() < 1e-6).all()
