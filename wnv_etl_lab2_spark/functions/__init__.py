from wnv_etl_lab2_spark.functions.cleaning import clean_cast_double, with_constant, with_full_address
from wnv_etl_lab2_spark.functions.vectors import cosine_similarity_col, dot_col, norm_col

__all__ = [
    "clean_cast_double",
    "with_constant",
    "with_full_address",
    "cosine_similarity_col",
    "dot_col",
    "norm_col",
]
