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


def rule_pass_columns(text_col: str = "text") -> dict[str, Column]:
    """Per-rule PASS booleans, keyed by rule name — the decomposition
    the ablation sheet (`quality_rule_ablation`) audits rule by rule;
    `quality_keep` is their conjunction."""
    return {
        "word_cnt": word_cnt(text_col).between(*WORD_CNT_RANGE),
        "mean_word_len": mean_word_len(text_col).between(*MEAN_WORD_LEN_RANGE),
        "stop_hits": stop_hits(text_col) >= MIN_STOP_HITS,
    }


def quality_keep(text_col: str = "text") -> Column:
    """The conjunctive keep decision over the three rules."""
    rules = list(rule_pass_columns(text_col).values())
    keep = rules[0]
    for r in rules[1:]:
        keep = keep & r
    return keep


def rule_pass_sqls(text_expr: str = "text") -> dict[str, str]:
    """The same per-rule PASS booleans as DuckDB-oracle SQL fragments,
    built from THIS module's constants and keyed identically to
    `rule_pass_columns` — a policy change here updates both engines'
    rules and every interpolating oracle at once."""
    lo, hi = WORD_CNT_RANGE
    mlo, mhi = MEAN_WORD_LEN_RANGE
    return {
        "word_cnt": f"(LEN(string_split({text_expr}, ' ')) BETWEEN {lo} AND {hi})",
        "mean_word_len": (
            f"(CAST(LENGTH(REPLACE({text_expr}, ' ', '')) AS DOUBLE) "
            f"/ LEN(string_split({text_expr}, ' ')) BETWEEN {mlo} AND {mhi})"
        ),
        "stop_hits": (
            f"(LEN(regexp_extract_all(LOWER({text_expr}), '{STOPWORD_RE}')) "
            f">= {MIN_STOP_HITS})"
        ),
    }


def keep_sql(text_expr: str = "text") -> str:
    """The conjunctive keep decision as DuckDB-oracle SQL — the AND of
    `rule_pass_sqls`, so every oracle that needs the quality predicate
    interpolates fragments that can never drift from the Spark rules."""
    return " AND ".join(rule_pass_sqls(text_expr).values())
