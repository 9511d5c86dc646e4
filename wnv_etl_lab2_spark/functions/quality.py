"""Shared document-quality expressions (Gopher-style rule family).

One definition used by BOTH the auditable per-rule query
(`queries/pipeline_q.quality_rules_filter`) and the executable
curation pipeline (`wnv_etl_lab2_spark/curation.py`), so the filter a
user runs is provably the filter the oracle checked. All built-in
Catalyst expressions — pure map, no shuffle, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORD_RE = r"\b(the|a|of|and|is)\b"
WORD_CNT_RANGE = (25, 90)
MEAN_WORD_LEN_RANGE = (4.0, 5.0)
MIN_STOP_HITS = 2


def word_cnt(text_col: str = "text") -> Column:
    return F.size(F.split(text_col, " ")).cast("long")


def mean_word_len(text_col: str = "text") -> Column:
    return F.length(F.regexp_replace(text_col, " ", "")).cast("double") / F.size(
        F.split(text_col, " ")
    )


def stop_hits(text_col: str = "text") -> Column:
    return F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(STOPWORD_RE), F.lit(0))
    ).cast("long")


def quality_keep(text_col: str = "text") -> Column:
    """The conjunctive keep decision over the three rules."""
    return (
        word_cnt(text_col).between(*WORD_CNT_RANGE)
        & mean_word_len(text_col).between(*MEAN_WORD_LEN_RANGE)
        & (stop_hits(text_col) >= MIN_STOP_HITS)
    )


def keep_sql(text_expr: str = "text") -> str:
    """The same conjunctive keep decision as DuckDB-oracle SQL, built
    from THIS module's constants — every oracle that needs the quality
    predicate interpolates this fragment, so a policy change here can
    never leave an oracle stale."""
    lo, hi = WORD_CNT_RANGE
    mlo, mhi = MEAN_WORD_LEN_RANGE
    return (
        f"(LEN(string_split({text_expr}, ' ')) BETWEEN {lo} AND {hi}) "
        f"AND (CAST(LENGTH(REPLACE({text_expr}, ' ', '')) AS DOUBLE) "
        f"/ LEN(string_split({text_expr}, ' ')) BETWEEN {mlo} AND {mhi}) "
        f"AND LEN(regexp_extract_all(LOWER({text_expr}), '{STOPWORD_RE}')) >= {MIN_STOP_HITS}"
    )
