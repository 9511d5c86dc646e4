"""PII detection + redaction (the C4/Dolma-style scrub stage of a
training-data pipeline).

Patterns are written WITHOUT backslash escapes (`[0-9]` not `\\d`,
`[.]` not `\\.`): Spark SQL string literals process backslashes
(Hive-style) while DuckDB's do not, so a backslash-free pattern is the
one spelling both engines read identically — the same
engine-portability trick the dedup family uses with md5. All patterns
are group-free and every extraction passes an explicit group index 0,
because the engines disagree on the DEFAULT group (Spark
`regexp_extract_all` defaults to group 1, DuckDB to 0).

Masking replaces every match (Spark `regexp_replace` is global;
the DuckDB twin must pass the 'g' flag) with a typed placeholder, in
a fixed order; placeholders contain no digits or '@', so one rule
can never manufacture a match for a later rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern, placeholder — applied in this order
PII_RULES: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "[EMAIL]"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    ("ip", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "[IP]"),
]


def pii_counts(col: str) -> list[Column]:
    """One bigint match-count column per rule, named n_<rule>s."""
    return [
        F.size(F.expr(f"regexp_extract_all({col}, '{pat}', 0)"))
        .cast("long")
        .alias(f"n_{name}s")
        for name, pat, _ in PII_RULES
    ]


def pii_scrub_col(col: str) -> Column:
    """The masked text: every rule's matches replaced by its
    placeholder, rules applied in PII_RULES order."""
    out = F.col(col)
    for _, pat, placeholder in PII_RULES:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def pii_scrub_sql(col: str) -> str:
    """The DuckDB twin of `pii_scrub_col` ('g' flag: DuckDB
    regexp_replace is first-match-only by default, Spark's is
    global)."""
    out = col
    for _, pat, placeholder in PII_RULES:
        out = f"regexp_replace({out}, '{pat}', '{placeholder}', 'g')"
    return out
