"""JSONL (newline-delimited JSON) source + sink.

The interchange format of LLM training-data pipelines — every public
corpus release (C4, The Pile, RedPajama, Dolma) ships as compressed
JSONL shards. The reference has only CSV I/O (SURVEY.md O1/O9); this
module is the extension users switching from it actually need.

Design:
- WRITE: one JSON object per line via Spark's native json writer
  (parallel, splittable downstream when compressed with a splittable
  codec; gzip shards are the C4/Pile convention — one file per task,
  whole-file-per-task on read).
- READ: schema is REQUIRED, never inferred — inference is a full
  extra pass over 100 TB and silently widens types on dirty data.
  Malformed lines follow the same three-mode policy as the CSV source
  (PERMISSIVE with a corrupt-record column / DROPMALFORMED /
  FAILFAST), so ingest behavior is a declared contract, not a
  default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write one JSON object per line; ``compression`` e.g. 'gzip'
    for the conventional .json.gz shards."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    malformed: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-mandatory JSONL read with a declared malformed-line
    policy. In PERMISSIVE mode the corrupt-record column is included
    so callers can route bad lines to a quarantine sink instead of
    silently nulling them."""
    if malformed not in _MODES:
        raise ValueError(f"malformed={malformed!r}; use one of {_MODES}")
    full_schema = schema
    if malformed == "PERMISSIVE" and CORRUPT_COL not in schema:
        full_schema = f"{schema}, {CORRUPT_COL} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", malformed)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean rows, quarantined lines);
    quarantine keeps every column (the raw line is what re-processing
    needs).

    The parse is cached first: Spark refuses plans whose file scan
    references ONLY the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — e.g. the
    quarantine side's count), and its documented fix is to cache/save
    the parsed result and query that. Caching one ingest batch is
    also what you want operationally — both splits come from a single
    pass over the raw bytes instead of two."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"no {CORRUPT_COL} column; read with malformed='PERMISSIVE'")
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
