"""Spark 4 Python DataSource for HTTP CSV manifests (reference O1,
executor-parallel form).

`sources/http.py` reproduces the reference's shape — ONE driver-side
GET landed to a file (`GSheetsETL_Lab2.py:28-39`), then a parallel
`spark.read.csv`. That is right for one published sheet; a crawl-scale
ingest has a MANIFEST of many URLs, and the fetches themselves are the
parallel work. This module packages that as a first-class connector on
the Spark 4 Python DataSource API:

    spark.dataSource.register(HttpCsvDataSource)
    df = (spark.read.format("http_csv")
          .schema("x double, y double, type string")
          .option("urls", "https://a.example/f1.csv,https://b.example/f2.csv")
          .load())

- one InputPartition per URL: fetches run IN EXECUTORS, in parallel,
  with per-partition retry/recovery owned by Spark's task machinery —
  the 100 TB ingestion shape (the driver never touches the payload);
- each partition parses its body with pyarrow.csv and yields Arrow
  RecordBatches — the vectorized path through the Python source API,
  not row-at-a-time tuples;
- the URL opener is injectable exactly like `sources/http.py` (this
  container has no network): subclass with an ``opener`` class
  attribute IN LOCAL SCOPE and register the subclass — a
  non-importable class is pickled by value, so the opener travels to
  the data-source workers (an importable class registers by
  reference and keeps the default urllib opener). Tests drive the
  full executor-side path this way with the recorded-response
  `replay_opener`.

Schema contract: the caller supplies the schema (`.schema(...)`) —
streaming-source discipline applied to ingest (never infer from a
payload you haven't fetched yet); the CSV header row is validated
against it per partition and a mismatch fails the task loudly (the
fail-loud policy of `pipeline.py`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

Opener = Callable[[str], bytes]


def _default_opener(url: str) -> bytes:
    import urllib.request

    return urllib.request.urlopen(url, timeout=10).read()  # pragma: no cover


class HttpCsvDataSource(DataSource):
    """`format("http_csv")`: executor-parallel CSV-over-HTTP reads
    from a comma-separated URL manifest in option ``urls``."""

    # Injectable fetch function (url -> bytes): override in a
    # locally-defined subclass (see module docstring for the
    # pickling contract).
    opener: staticmethod = staticmethod(_default_opener)

    @classmethod
    def name(cls) -> str:
        return "http_csv"

    def schema(self):
        raise NotImplementedError(
            "http_csv requires an explicit .schema(...) — ingestion "
            "never infers from an unfetched payload"
        )

    def reader(self, schema) -> "HttpCsvReader":
        urls = [u for u in self.options.get("urls", "").split(",") if u]
        if not urls:
            raise ValueError("http_csv needs option 'urls' (comma-separated)")
        _validate_csv_schema(schema)  # fail at plan time, not per-partition
        return HttpCsvReader(schema, urls, type(self).opener)


# Spark simpleString -> Arrow type for CSV payload columns. A declared
# type OUTSIDE this map raises at plan time (see _validate_csv_schema)
# instead of silently mapping to pa.string() and yielding Arrow batches
# that disagree with the declared schema.
def _csv_arrow_types():
    import pyarrow as pa

    return {
        "double": pa.float64(),
        "float": pa.float32(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
    }


def _validate_csv_schema(schema) -> None:
    supported = set(_csv_arrow_types())
    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if f.dataType.simpleString() not in supported
    ]
    if bad:
        raise TypeError(
            f"http_csv cannot map declared field(s) {bad} to Arrow CSV "
            f"types; supported Spark types: {sorted(supported)}"
        )


class HttpCsvReader(DataSourceReader):
    def __init__(self, schema, urls: list[str], opener: Opener) -> None:
        self._schema = schema
        self._urls = urls
        self._opener = opener

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(u) for u in self._urls]

    def read(self, partition: InputPartition) -> Iterator:
        import io

        import pyarrow as pa
        import pyarrow.csv as pacsv

        body = self._opener(partition.value)
        expected = [f.name for f in self._schema.fields]
        types = _csv_arrow_types()
        arrow_schema = pa.schema(
            [(f.name, types[f.dataType.simpleString()]) for f in self._schema.fields]
        )
        table = pacsv.read_csv(
            io.BytesIO(body),
            convert_options=pacsv.ConvertOptions(
                column_types={f.name: t for f, t in zip(self._schema.fields, arrow_schema.types)}
            ),
        )
        if table.column_names != expected:
            raise ValueError(
                f"http_csv header mismatch for {partition.value!r}: "
                f"payload has {table.column_names}, schema expects {expected}"
            )
        yield from table.cast(arrow_schema).to_batches()
