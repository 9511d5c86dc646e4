"""ingest_provenance is rows-only for the driver (its fixed DuckDB
views cannot see file names), so pin it EXACTLY here: DuckDB
`read_parquet(..., filename=true)` and the filesystem are the
independent ground truth for (file, size, row count)."""

from __future__ import annotations

import os

import duckdb

from wnv_etl_lab2_spark.sources.catalog import TABLES


def test_ingest_provenance_matches_duckdb_and_fs(spark, sf_dir):
    from wnv_etl_lab2_spark.queries import REGISTRY, _ensure_loaded

    _ensure_loaded()
    out = REGISTRY["ingest_provenance"].fn(spark, sf_dir).toPandas()
    assert sorted(out.table_name) == sorted(TABLES)
    con = duckdb.connect()
    for _, r in out.iterrows():
        path = os.path.join(sf_dir, r.file_name)
        assert os.path.getsize(path) == r.file_bytes, r.file_name
        n, fname = con.sql(
            "SELECT COUNT(*), ANY_VALUE(parse_filename(filename)) "
            f"FROM read_parquet('{path}', filename=true)"
        ).fetchone()
        assert n == r.n_rows, (r.table_name, n, r.n_rows)
        assert fname == r.file_name
