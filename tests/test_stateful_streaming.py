"""Custom stateful operator (applyInPandasWithState): running per-user
stats must converge to the batch ground truth after full replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.catalog import load_table
from wnv_etl_lab2_spark.streaming.events import read_events_stream
from wnv_etl_lab2_spark.streaming.stateful import running_user_stats


def test_running_user_stats_converge_to_batch(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_stream")
    load_table(spark, "events", sf_dir).write.mode("overwrite").parquet(path)

    stream = read_events_stream(spark, path)
    q = (
        running_user_stats(stream, watermark="2 hours")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode can emit a row per user per batch — the LAST emission
    # per user is the final state
    final = spark.sql(
        """
        SELECT user_id, n_events, total_value, max_value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
            FROM t_state
        ) WHERE rn = 1
        """
    ).toPandas().set_index("user_id").sort_index()

    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(final.index) == list(batch.index)
    assert (final["n_events"] == batch["n_events"]).all()
    assert (final["max_value"] == batch["max_value"]).all()
    assert ((final["total_value"] - batch["total_value"]).abs() < 1e-6).all()
