"""HTTP CSV source (O1) + config binding (O2): the reference's
extract() and YAML wiring, network-free via the injected opener."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.config import PipelineConfig, load_config
from wnv_etl_lab2_spark.sources.http import fetch_to_landing, read_http_csv

CSV_BODY = b"Timestamp,Street Address,Zipcode\n1/1/2025 10:00:00,825 Walnut St,80302\n1/1/2025 10:01:00,1200 Pearl St,80302\n"


def fake_opener(url: str) -> bytes:
    assert url.startswith("https://docs.example/")
    return CSV_BODY


def test_fetch_overwrites_landing(tmp_path):
    p = str(tmp_path / "landing" / "optout.csv")
    fetch_to_landing("https://docs.example/sheet", p, lambda u: b"old")
    fetch_to_landing("https://docs.example/sheet", p, fake_opener)
    assert open(p, "rb").read() == CSV_BODY


def test_read_http_csv_with_schema(spark, tmp_path):
    df = read_http_csv(
        spark,
        "https://docs.example/sheet",
        str(tmp_path / "optout.csv"),
        fake_opener,
        schema="`Timestamp` string, `Street Address` string, `Zipcode` string",
    )
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["Street Address"] == "825 Walnut St"


def test_malformed_csv_rows_drop_not_abort(spark, tmp_path):
    """Reader-level row-skip (reference O7 drop-on-error semantics):
    PERMISSIVE nulls bad cells; DROPMALFORMED removes the rows."""
    p = tmp_path / "dirty.csv"
    p.write_text("id,val\n1,10\n2,not_a_number\n3,30\n")
    schema = "id int, val int"
    permissive = spark.read.option("header", True).schema(schema).csv(str(p))
    assert [(r.id, r.val) for r in permissive.orderBy("id").collect()] == [
        (1, 10),
        (2, None),
        (3, 30),
    ]
    dropped = (
        spark.read.option("header", True)
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(str(p))
    )
    assert [(r.id, r.val) for r in dropped.orderBy("id").collect()] == [(1, 10), (3, 30)]


def test_config_roundtrip_yaml(tmp_path):
    p = tmp_path / "wnv.yaml"
    p.write_text(
        "remote_url: https://docs.example/sheet\n"
        "local_dir: /tmp/landing\n"
        "data_format: csv\n"
        "gdb_path: /tmp/out\n"
    )
    cfg = load_config(str(p))
    assert cfg.remote_url == "https://docs.example/sheet"
    assert cfg.data_format == "csv"
    assert cfg.proj_dir == ""  # defaulted


def test_config_rejects_unknown_keys(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("remote_url: x\nmystery_key: y\n")
    with pytest.raises(ValueError, match="mystery_key"):
        load_config(str(p))


def test_format_roundtrips_preserve_values(spark, sf_dir, tmp_path):
    """Every bundled columnar/text format (parquet, ORC, JSON-lines,
    CSV) must round-trip the same rows through the Pipeline
    source/sink pairs — the 'any source a reference user needs' claim,
    exercised."""
    from wnv_etl_lab2_spark.pipeline import (
        Pipeline,
        csv_sink,
        csv_source,
        jsonl_sink,
        jsonl_source,
        orc_sink,
        orc_source,
        parquet_sink,
        parquet_source,
    )
    from wnv_etl_lab2_spark.sources.catalog import load_table

    base = (
        load_table(spark, "nation", sf_dir)
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    want = sorted(map(tuple, base.toPandas().values.tolist()))
    ddl = "n_nationkey bigint, n_name string, n_regionkey bigint"

    cases = [
        (parquet_sink, parquet_source, {}),
        (orc_sink, orc_source, {}),
        (jsonl_sink, jsonl_source, {"schema": ddl}),
        (csv_sink, csv_source, {"schema": ddl}),
    ]
    for sink_fn, source_fn, src_kwargs in cases:
        path = str(tmp_path / sink_fn.__name__)
        sink_fn(path)(base)
        got_df = Pipeline(source_fn(path, **src_kwargs) if src_kwargs else source_fn(path)).build(spark)
        got = sorted(map(tuple, got_df.select("n_nationkey", "n_name", "n_regionkey").toPandas().values.tolist()))
        assert got == want, f"{sink_fn.__name__} roundtrip drifted"


def test_recorded_redirect_flow_end_to_end(spark, tmp_path):
    """Byte-replay of the reference's recorded sheet fetch
    (`Nonewnv.log:3-6`): publish URL answers 307 with a Location to
    the googleusercontent host, which serves the CSV 200. The full
    fetch -> landing -> spark.read path runs against the recording."""
    from wnv_etl_lab2_spark.sources.http import read_http_csv, replay_opener

    pub = "https://docs.example/spreadsheets/d/e/KEY/pub?output=csv"
    real = "https://doc-14-0c.sheets.example/pub/KEY?output=csv"
    csv = b"ADDRESS,CITY\n825 Walnut St,Boulder\n633 S Broadway,Boulder\n"
    opener = replay_opener(
        {
            pub: (307, {"Location": real}, b""),
            real: (200, {"Content-Type": "text/csv"}, csv),
        }
    )
    landing = str(tmp_path / "landing" / "wnv.csv")
    df = read_http_csv(spark, pub, landing, opener, "ADDRESS string, CITY string")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0].ADDRESS == "825 Walnut St"
    with open(landing, "rb") as f:
        assert f.read() == csv  # landing file is the verbatim body


def test_replay_opener_error_semantics():
    from wnv_etl_lab2_spark.sources.http import replay_opener

    import pytest as _pytest

    loop = replay_opener({"u": (307, {"Location": "u"}, b"")})
    with _pytest.raises(RuntimeError, match="redirect loop"):
        loop("u")
    missing_loc = replay_opener({"u": (302, {}, b"")})
    with _pytest.raises(ValueError, match="without Location"):
        missing_loc("u")
    err = replay_opener({"u": (404, {}, b"not found")})
    with _pytest.raises(RuntimeError, match="HTTP 404"):
        err("u")
    unknown = replay_opener({})
    with _pytest.raises(KeyError):
        unknown("u")


def test_cluster_conf_profile(spark):
    """The 100 TB submission profile is well-formed: every value a
    string (spark-submit contract), partitions ~2x cores, and the
    profile is accepted verbatim by a builder config pass."""
    from wnv_etl_lab2_spark.session import cluster_conf

    conf = cluster_conf(total_cores=5000, executor_cores=5)
    assert all(isinstance(v, str) for v in conf.values())
    assert conf["spark.sql.shuffle.partitions"] == "10000"
    assert conf["spark.executor.instances"] == "1000"
    # settable on a live session where dynamic (runtime-changeable);
    # restored afterwards so the shared session fixture's scan
    # partitioning is unchanged for later tests
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            conf["spark.sql.files.maxPartitionBytes"],
        )
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "192m"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
