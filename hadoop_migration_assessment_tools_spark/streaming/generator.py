"""SRC1 live form: a rate-source generator of synthetic hook events.

Turns Spark's built-in rate source into a stream of HOOK_INPUT_SCHEMA rows and feeds
them through the *real* ``construct_events`` pipeline — the end-to-end demo that the
event-construction operators are source-agnostic (same code, batch or stream). Each
rate tick becomes one lifecycle event; consecutive ticks pair into submit/complete for
the same query id, with a deterministic failure fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.events import construct_events
from ..schema import HOOK_INPUT_SCHEMA


def synthetic_hook_stream(spark: SparkSession, rows_per_second: int = 50) -> DataFrame:
    """Rate source -> HOOK_INPUT rows. tick 2k = submit of query k; tick 2k+1 =
    completion of query k (failure when k % 10 == 0)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    qk = (F.col("value") / 2).cast("long")
    is_submit = F.col("value") % 2 == 0
    cols = {
        "hook_type": F.when(is_submit, "PRE_EXEC_HOOK")
        .when(qk % 10 == 0, "ON_FAILURE_HOOK")
        .otherwise("POST_EXEC_HOOK"),
        "query_id": F.concat(F.lit("live_query_"), qk.cast("string")),
        "query_type": F.lit("QUERY"),
        "query_text": F.concat(F.lit("SELECT * FROM t_"), (qk % 7).cast("string")),
        "query_start_time": F.col("timestamp"),
        "event_time": F.col("timestamp"),
        "execution_engine": F.lit("tez"),
        "hook_user_name": F.concat(F.lit("user_"), (qk % 5).cast("string")),
        "ugi_user_name": F.concat(F.lit("user_"), (qk % 5).cast("string")),
        "is_hs2": F.lit(True),
        "default_db": F.lit("default"),
        "error_message": F.when(~is_submit & (qk % 10 == 0), F.lit("synthetic failure")),
        "queue_tez": F.concat(F.lit("q"), (qk % 3).cast("string")),
        "tasks": F.array(
            F.struct(
                F.lit("TEZ").alias("task_type"),
                (qk % 4 == 0).alias("is_llap"),
                F.lit(None).cast("string").alias("job_id"),
            )
        ),
        "inputs": F.array(
            F.struct(
                F.lit("TABLE").alias("entity_type"),
                F.concat(F.lit("db@t_"), (qk % 7).cast("string")).alias("name"),
            )
        ),
        "outputs": F.array().cast("array<struct<entity_type string, name string>>"),
    }
    projected = []
    for field in HOOK_INPUT_SCHEMA.fields:
        col = cols.get(field.name, F.lit(None))
        projected.append(col.cast(field.dataType).alias(field.name))
    return rate.select(*projected)


def live_event_stream(spark: SparkSession, rows_per_second: int = 50) -> DataFrame:
    """The full live pipeline: rate -> hook rows -> construct_events (QueryEvents)."""
    return construct_events(synthetic_hook_stream(spark, rows_per_second))
