from wnv_etl_lab2_spark.operators.spatial import (
    bbox_containment_join,
    with_join_count,
    within_distance_anti_join,
    within_distance_semi_join,
)

__all__ = [
    "bbox_containment_join",
    "with_join_count",
    "within_distance_anti_join",
    "within_distance_semi_join",
]
