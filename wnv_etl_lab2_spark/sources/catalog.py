"""Table catalog over the driver-provided Parquet test data.

The reference binds its single source from a YAML config and reads CSV
row-at-a-time (SURVEY.md O1/O2; reference `config_loader.py:4-7`,
`Lab2ETL.py:67`). Here the catalog is a thin declarative layer: every
table is a columnar Parquet scan, so Catalyst gets predicate pushdown,
column pruning and partition pruning for free. At 100 TB these would be
partitioned/bucketed managed tables; the access pattern (named table ->
DataFrame, lazily read) is identical.
"""

from __future__ import annotations

import os

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# spread_scan: (path, mtime) -> (row_groups, rows) from the parquet
# footer, so repeated plan builds (bench warm + 5 timed passes) read
# each footer once. Bounded like _MANIFEST_TEXT_CACHE (r17 ADVICE):
# spread_scan runs over arbitrary df.inputFiles(), so a long session
# rewriting temp dirs in a loop would otherwise accumulate stale
# entries without bound — past the cap, drop the oldest half.
_FOOTER_CACHE: dict[tuple[str, float], tuple[int, int]] = {}
_FOOTER_CACHE_MAX = 4096


def _cache_put(cache: dict, key, val, cap: int) -> None:
    if len(cache) >= cap:
        for k in list(cache)[: cap // 2]:  # insertion order = oldest first
            del cache[k]
    cache[key] = val


def _parquet_footer(path: str) -> tuple[int, int]:
    """(row_groups, rows) of one local parquet file (footer read only)."""
    key = (path, os.path.getmtime(path))
    hit = _FOOTER_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        hit = (md.num_row_groups, md.num_rows)
        _cache_put(_FOOTER_CACHE, key, hit, _FOOTER_CACHE_MAX)
    return hit


_SIZE_RE = re.compile(r"^([0-9]+)\s*([kmgtp]?)b?$")
_SIZE_MULT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf value — every legal spelling
    ('128m', '128mb', '1g', '134217728b', '2tb'), r17 ADVICE: the old
    parser stripped only a trailing 'b' and had no 't'/'p', so
    '128mb' crashed every spread_scan plan build. Unparseable values
    fall back to the 128 MB default instead of raising."""
    m = _SIZE_RE.match(conf_val.strip().lower())
    if not m:
        return 128 << 20
    return int(m.group(1)) * _SIZE_MULT[m.group(2)]


def spread_scan(df: DataFrame, *keys: str, full_width: bool = False) -> DataFrame:
    """Spread a narrow parquet scan across the session's task slots —
    but ONLY when the files themselves cannot (guide §2.5 input skew /
    §6 input split size): a parquet row group is indivisible, so a
    single-row-group file is one scan task no matter what
    maxPartitionBytes says, and every expression evaluated before the
    first exchange (explodes, shingling, HOF kernels) runs on one core.
    AQE cannot fix this — it only coalesces AFTER a shuffle.

    Scale-adaptive by derivation from the input, not a local constant:
    the repartition is inserted only when BOTH
      (a) the scan's real parallelism ceiling (total row groups across
          the input files) is below the session's defaultParallelism, and
      (b) the whole input is smaller than parallelism x
          maxPartitionBytes — i.e. the table couldn't fill the cluster
          at the target split size even if it were splittable, so the
          spreading exchange moves a bounded, cluster-trivial byte
          volume.
    On a 100 TB table either test fails (thousands of row groups,
    bytes >> cores x 128 MB) and the scan is returned untouched — the
    zero-extra-shuffle plans SCALING.md argues for are exactly the
    plans a real cluster sees. Hash-partitioning by ``keys`` (when
    given) keeps the placement content-deterministic; with no keys the
    round-robin path relies on Spark's sort-before-repartition for
    retry determinism (results are partitioning-independent anyway —
    every oracle query hash-matches DuckDB, a different engine with a
    different row order).
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        from urllib.parse import urlparse

        files = [
            urlparse(f).path if "://" in f or f.startswith("file:") else f
            for f in df.inputFiles()
        ]
        if not files:
            return df
        total = sum(os.path.getsize(f) for f in files)
        footers = [_parquet_footer(f) for f in files]
        row_groups = sum(rg for rg, _ in footers)
    except Exception:
        return df  # non-local / non-parquet source: leave the scan alone
    max_pb = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if row_groups >= par or total >= par * max_pb:
        return df
    # ``full_width``: the caller declares the downstream per-row work
    # is CPU-heavy out of all proportion to the input bytes (e.g. a
    # tiny probe side whose scan stage hosts every overlay clip kernel
    # via a broadcast join), so the byte-derived width would starve
    # cores — spread over every task slot instead (round 18; the
    # polygon-clip family regressed 1.4-1.6x under the derived width).
    width = par if full_width else _spread_width(par, total)
    return df.repartition(width, *keys) if keys else df.repartition(width)


# Target input bytes per task for a SPREADING repartition (round 18,
# r17 verdict #5). The r17 helper spread to a flat defaultParallelism,
# which over-shoots when the input is tiny: the driver's 8-vs-32-core
# scaling block measured the six spread queries ~2x FASTER at 8 cores
# because repartition(32) of a sub-MB input pays more exchange +
# task-scheduling than 32-way parallelism buys back. Deriving the
# width from the input (ceil(bytes / target), clamped to [2, par])
# keeps it scale-adaptive: ~128 KiB of compressed parquet per task is
# enough downstream expansion work to amortize a task launch, measured
# across the spread sites at 32 cores (width 4-8 is the flat optimum
# for both the 594 KB documents and 799 KB embeddings inputs; flat 32
# was 1.3-1.5x slower on every one). At scale the spread_scan guard
# no-ops before this matters; the knob is env-tunable for clusters
# whose scheduling overhead differs.
SPREAD_TARGET_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_TARGET_BYTES", str(128 << 10))
)


def _spread_width(par: int, total_bytes: int) -> int:
    return max(2, min(par, -(-total_bytes // max(1, SPREAD_TARGET_BYTES))))


def scan_width(df: DataFrame, default: int) -> int:
    """Right-sized partition count for a spreading repartition whose
    purpose is to parallelize per-row expansion work over ``df``'s
    (local parquet) input files — `_spread_width` of the input bytes,
    never more than ``default``. Inputs that cannot be inspected
    (non-local, non-parquet, synthetic) keep ``default``, so at real
    scale callers behave exactly as before."""
    try:
        from urllib.parse import urlparse

        files = [
            urlparse(f).path if "://" in f or f.startswith("file:") else f
            for f in df.inputFiles()
        ]
        if not files:
            return default
        total = sum(os.path.getsize(f) for f in files)
    except Exception:
        return default
    return min(default, _spread_width(default, total))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (path, mtime) -> the schema Spark itself INFERRED for that file, so
# repeat scans of an immutable catalog table skip per-call footer
# inference (~0.12 s of driver time per spark.read.parquet at sf0.1,
# paid by every load_table site on every plan build). The schema is
# recorded from Spark's own first read — never converted from another
# library — so the fast path is bit-identical by construction; an
# updated file (new mtime) re-infers. Metadata caching only: the scan
# itself stays lazy and reads the parquet input on every execution.
_SCHEMA_CACHE: dict[tuple[str, float], T.StructType] = {}


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    try:
        key = (path, os.path.getmtime(path))
    except OSError:
        return spark.read.parquet(path)  # non-local path: no fast path
    sch = _SCHEMA_CACHE.get(key)
    if sch is not None:
        return spark.read.schema(sch).parquet(path)
    df = spark.read.parquet(path)
    _cache_put(_SCHEMA_CACHE, key, df.schema, _FOOTER_CACHE_MAX)
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Lazy Parquet scan for one catalog table."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    # The driver may hand us its own session (bypassing our factory):
    # pin the confs correctness depends on. UTC matches DuckDB's
    # naive-UTC timestamps; both are runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is Parquet TIMESTAMP(NANOS) — no Spark type exists
        # for it, so read nanos-as-long and convert (values are
        # microsecond-aligned; DuckDB's ns->us conversion is identical).
        # Set here (not only in our session factory) because the driver
        # may hand us its own session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return _read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so `spark.sql` works over the
    same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
