"""SparkSession factory.

The reference pipeline has no engine configuration at all (a single
Python thread; see SURVEY.md §4.1). Here the session is where the
scale-relevant knobs live:

- AQE on (runtime join re-planning, partition coalescing, skew-join),
- shuffle partitions sized to the local core count (on a real cluster
  this would be ~2-3x total cores; the driver harness runs local[N]),
- Arrow enabled for the Pandas-UDF slow path,
- session timezone pinned to UTC so timestamps compare exactly against
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "wnv-etl-lab2-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session with scale-appropriate defaults.

    ``cpus`` only matters when this call creates the session; if a
    session already exists (e.g. the driver passed one in), its master
    wins — all our operators take the session as an argument, so they
    run identically either way.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos
        # type, so read as long and convert in the catalog (lossless:
        # the data is microsecond-aligned).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The default whole-stage-codegen class cache holds 100
        # entries (LRU); this workload runs a 160-query registry whose
        # stages generate well over that, so under an interleaved
        # bench/correctness sweep every query's generated classes are
        # evicted before its next run and janino recompiles on EVERY
        # execution — measured ~2x wall on the expression-heaviest
        # queries and the likely source of prior rounds' ±15%
        # unexplained drift. A few thousand compiled classes are a
        # few hundred MB of metaspace at most; static conf, so it
        # must be set at session build.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # zstd shuffle/broadcast compression, matching the 100 TB
        # submission profile below (cluster_conf has prescribed it
        # since round 2; the local session now measures what the
        # cluster would ship). The trade is MEASURED, not free: on the
        # text-heavy exchanges (shingle postings, df pass) zstd moves
        # ~35-40% fewer bytes than the lz4 default, but costs
        # ~0.2-0.3 s of compression CPU per shuffle-heavy query
        # locally — ~15-23% wall on the pair backbone (r8 A/B,
        # min-of-5: lz4 1.80/1.59 s vs zstd 2.15/1.82 s) and ~8% on
        # dedup_minhash_lsh (r9 A/B: lz4 1.405 vs zstd 1.526) — with
        # no local network to win the bytes back. At cluster scale the
        # exchanges are network-bound and the bytes dominate; the
        # accepted local ceilings are pinned in
        # bench.py:DECLARED_WALL_BOUNDS_SF01.
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/wnv_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_conf(
    total_cores: int,
    executor_cores: int = 5,
    target_partition_mb: int = 192,
) -> dict[str, str]:
    """The 100 TB submission profile: the spark-submit --conf set this
    engine expects on a real cluster, derived from the same analysis
    SCALING.md documents per operator family. Local runs never use it
    (get_spark's local[N] defaults stand); it exists so a user taking
    these plans to a 1000-executor cluster starts from the measured
    shape instead of Spark's 200-partition defaults.

    - shuffle partitions ~2x total cores: every heavy operator here is
      shuffle-bound on digests/ids; 2x keeps reduce tasks ~seconds at
      TB-scale inputs while AQE coalesces the small ones.
    - maxPartitionBytes sizes scan tasks so a 100 TB corpus yields
      ~500k scan tasks (bounded scheduler pressure, good locality).
    - AQE + skew-join on: the salting operators (operators/skew.py)
      handle diagnosed hot keys; AQE absorbs the residual skew.
    - Kryo + registrationRequired=false: the shuffled records are
      Catalyst rows (Tungsten binary, serializer mostly moot), but
      broadcast variables (IVF centroids, hyperplanes) benefit.
    - shuffle-spill compression and zstd: digest-heavy shuffles
      compress ~3-5x, which at 100 TB is the difference between a
      network-bound and a disk-bound exchange.
    - speculation on: stragglers dominate p99 stage time at 1000
      executors; every operator here is deterministic and side-effect
      free (noop/file sinks are atomic via commit protocol), so
      speculative duplicates are safe.
    - codegen class cache sized to the registry: with 160 query
      shapes the 100-entry default evicts every class between runs
      and recompiles per execution (measured ~2x wall locally).
    """
    n_exec = max(1, total_cores // executor_cores)
    return {
        "spark.executor.cores": str(executor_cores),
        "spark.executor.instances": str(n_exec),
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.io.compression.codec": "zstd",
        "spark.shuffle.compress": "true",
        "spark.shuffle.spill.compress": "true",
        "spark.speculation": "true",
        "spark.speculation.multiplier": "3",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # a 160-query workload generates far more whole-stage-codegen
        # classes than the 100-entry default cache; eviction means
        # janino recompilation on every re-execution (measured ~2x
        # wall on expression-heavy queries locally — same effect on a
        # cluster driver)
        "spark.sql.codegen.cache.maxEntries": "2000",
    }
