"""Fixed-width token windows — the one explode both `doc_chunking`
(width 32) and `repeated_span_removal` (width 5) are built on, kept in
a single definition (Spark side AND oracle-SQL side) so the slice
arithmetic can never diverge between the two queries.

Scale shape: pure flatMap over the scan (`sequence` + `slice`), fanout
ceil(n/width) per document — output is linear in corpus tokens and a
skewed document only skews its own row's work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_windows(
    df: DataFrame, width: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode whitespace-token windows of ``width`` per document:
    (id, w_idx, w_text, w_tokens), where the last window clips to the
    document end."""
    d = df.select(id_col, F.split(text_col, " ").alias("_ws"))
    n_w = F.ceil(F.size("_ws") / F.lit(float(width))).cast("long")
    d = d.select(
        id_col,
        "_ws",
        F.explode(F.sequence(F.lit(0).cast("long"), n_w - 1)).alias("w_idx"),
    )
    start = (F.col("w_idx") * width + 1).cast("int")
    took = F.least(F.lit(width).cast("long"), F.size("_ws") - F.col("w_idx") * width)
    return d.select(
        id_col,
        "w_idx",
        F.array_join(F.slice("_ws", start, F.lit(width)), " ").alias("w_text"),
        took.alias("w_tokens"),
    )


def token_windows_sql(
    width: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The DuckDB twin of :func:`token_windows` — same columns, same
    clipping arithmetic, as a subquery string for oracle interpolation."""
    return f"""
      SELECT {id_col}, c AS w_idx,
             array_to_string(list_slice(ws, c * {width} + 1,
                                        LEAST((c + 1) * {width}, LEN(ws))), ' ') AS w_text,
             CAST(LEAST((c + 1) * {width}, LEN(ws)) - c * {width} AS BIGINT) AS w_tokens
      FROM (SELECT {id_col}, string_split({text_col}, ' ') AS ws FROM {table}),
           UNNEST(generate_series(0, CAST(CEIL(LEN(ws) / {width}.0) AS BIGINT) - 1)) AS t(c)
    """
