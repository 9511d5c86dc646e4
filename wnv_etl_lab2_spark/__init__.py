"""wnv_etl_lab2_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference ETL pipeline (mberna113/WNV-ETL-Lab2, surveyed in
/root/repo/SURVEY.md), generalized into a reusable operator library
designed for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst + AQE do the planning),
- explicit schemas, Parquet-native sources,
- scalable spatial joins (grid-cell bucketing, no cross joins),
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/embedding),
  similarity search (brute-force + LSH ANN), text analysis, multimodal
  column plumbing,
- Structured Streaming over the events table.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from wnv_etl_lab2_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
