"""Multimodal-column query: binary payload -> Arrow-batched features.

The decode is stubbed (no media libs in the container; see
operators/multimodal.py) so this is registered rows-only: the driver
checks row count/schema stability, and tests/test_multimodal.py checks
the feature values deterministically.
"""

from __future__ import annotations

from wnv_etl_lab2_spark.operators.multimodal import binary_features, documents_as_binary
from wnv_etl_lab2_spark.queries import register
from wnv_etl_lab2_spark.sources.catalog import load_table


@register("multimodal_binary_features")
def multimodal_binary_features(spark, sf_dir):
    """Opaque-binary feature extraction over mapInPandas: byte length,
    checksum, stub-decoded dimensions. Payload bytes cross the Arrow
    boundary once per batch; only (id, payload) is projected in."""
    docs = load_table(spark, "documents", sf_dir)
    return binary_features(documents_as_binary(docs))
