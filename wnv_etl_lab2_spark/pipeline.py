"""Pipeline protocol: the engine's public composition API.

The reference's template-method hierarchy (`SpatialETL_Lab2.py:1-17`:
SpatialEtl.extract/transform/load, overridden by GSheetsEtl, driven by
`.process()` at `GSheetsETL_Lab2.py:137-151`) generalizes here to a
lazy Source -> Transform* -> Sink composition over DataFrames. Unlike
the reference — which materializes a file between every stage (a hard
pipeline breaker, SURVEY.md §3) — a Pipeline builds ONE logical plan;
Catalyst optimizes across stage boundaries and nothing materializes
until the sink action.

Failure semantics: the job fails loudly (no v4-style swallow-and-
continue, `final_project2.py:44-45`); row-level skip stays where it
belongs, in the cleaning expressions (functions/cleaning.py).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

Source = Callable[[SparkSession], DataFrame]
Transform = Callable[[DataFrame], DataFrame]
Sink = Callable[[DataFrame], None]


@dataclass
class Pipeline:
    """Composable ETL pipeline: one logical plan, sink-triggered."""

    source: Source
    transforms: list[Transform] = field(default_factory=list)
    name: str = "pipeline"

    def then(self, *transforms: Transform) -> "Pipeline":
        return Pipeline(self.source, [*self.transforms, *transforms], self.name)

    def build(self, spark: SparkSession) -> DataFrame:
        """Compose the full plan. Lazy for expression-only transforms;
        a transform that is itself iterative (e.g. connected
        components) may run its own jobs while composing."""
        df = self.source(spark)
        for t in self.transforms:
            df = t(df)
        return df

    def run(
        self,
        spark: SparkSession,
        sink: Sink,
        metrics: "dict[str, object] | None" = None,
    ) -> "dict[str, object] | None":
        """Trigger the plan into a sink — the only action.

        ``metrics`` (name -> aggregate Column) rides the sink job via
        ``df.observe``: the observability generalization of the
        reference's GetCount logging (O22, `final_project2.py`), but
        computed as accumulator-style metrics INSIDE the one sink
        action instead of a second count job — at 100 TB a separate
        ``df.count()`` re-executes the whole plan, while an observed
        metric is free. Returns the collected metric values (or None
        when no metrics were requested); they are also logged."""
        log.info("pipeline %s: building plan", self.name)
        df = self.build(spark)
        obs = None
        if metrics:
            from pyspark.sql import Observation

            obs = Observation(self.name)
            df = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
        sink(df)
        log.info("pipeline %s: sink complete", self.name)
        if obs is not None:
            vals = obs.get
            log.info("pipeline %s: observed metrics %s", self.name, vals)
            return vals
        return None


def parquet_source(path: str) -> Source:
    return lambda spark: spark.read.parquet(path)


def csv_source(path: str, schema: str | None = None, mode: str = "PERMISSIVE") -> Source:
    """Header CSV source; pass an explicit DDL schema in production
    (inference mirrors the reference's DictReader convenience path).

    ``mode`` is Spark's malformed-row policy — the remote-sheet feed
    the reference ingests (O1) can always hand back a garbled line:
    PERMISSIVE (default) nulls bad fields and captures the raw line in
    a ``_corrupt_record`` column when the schema declares one,
    DROPMALFORMED silently drops bad rows, FAILFAST raises on the
    first one. Pick FAILFAST for pipelines that must not load partial
    data, PERMISSIVE + a corrupt-record audit for ones that must keep
    going."""

    def read(spark: SparkSession) -> DataFrame:
        r = spark.read.option("header", True).option("mode", mode)
        return r.schema(schema).csv(path) if schema else r.option("inferSchema", True).csv(path)

    return read


def csv_sink(path: str) -> Sink:
    """Overwrite CSV sink (reference O9: delete-before-write,
    `Lab2ETL.py:54-64` — mode('overwrite') is the idempotent form)."""
    return lambda df: df.write.mode("overwrite").option("header", True).csv(path)


def parquet_sink(path: str, partition_by: tuple[str, ...] = ()) -> Sink:
    def write(df: DataFrame) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    return write


def jsonl_source(path: str, schema: str | None = None) -> Source:
    """JSON-lines source; pass a DDL schema in production (schemaless
    reads pay an extra inference scan)."""

    def read(spark: SparkSession) -> DataFrame:
        r = spark.read
        return r.schema(schema).json(path) if schema else r.json(path)

    return read


def jsonl_sink(path: str) -> Sink:
    return lambda df: df.write.mode("overwrite").json(path)


def orc_source(path: str) -> Source:
    return lambda spark: spark.read.orc(path)


def orc_sink(path: str) -> Sink:
    return lambda df: df.write.mode("overwrite").orc(path)
