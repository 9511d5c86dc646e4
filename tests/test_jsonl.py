"""JSONL source/sink round-trip: the format LLM corpora ship in.
Checks value fidelity (unicode, nulls, nested-ish strings), the
schema-mandatory read, the three malformed-line modes, and gzip."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from wnv_etl_lab2_spark.sources.jsonl import (
    CORRUPT_COL,
    quarantine_split,
    read_jsonl,
    write_jsonl,
)

SCHEMA = "doc_id long, text string, lang string"


def test_roundtrip_values_and_gzip(spark, tmp_path, sf_dir):
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text", "lang")
        .limit(100)
    )
    extra = spark.createDataFrame(
        [(10_000_001, 'quote " backslash \\ newline\\n unicode é中文', None)],
        SCHEMA,
    )
    out = str(tmp_path / "shard")
    write_jsonl(docs.union(extra), out, compression="gzip")
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    back = read_jsonl(spark, out, SCHEMA)
    clean, bad = quarantine_split(back)
    assert bad.count() == 0
    a = {r.doc_id: (r.text, r.lang) for r in clean.collect()}
    b = {r.doc_id: (r.text, r.lang) for r in docs.union(extra).collect()}
    assert a == b


def test_malformed_modes(spark, tmp_path):
    p = tmp_path / "dirty"
    p.mkdir()
    (p / "part-0.json").write_text(
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"})
        + "\n{not json at all\n"
        + json.dumps({"doc_id": 2, "text": "also ok", "lang": "de"})
        + "\n"
    )
    perm = read_jsonl(spark, str(p), SCHEMA, malformed="PERMISSIVE")
    clean, bad = quarantine_split(perm)
    assert clean.count() == 2
    assert bad.collect()[0][CORRUPT_COL].startswith("{not json")
    dropped = read_jsonl(spark, str(p), SCHEMA, malformed="DROPMALFORMED")
    assert dropped.count() == 2
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), SCHEMA, malformed="FAILFAST").collect()
    with pytest.raises(ValueError):
        read_jsonl(spark, str(p), SCHEMA, malformed="nonsense")
