"""Downstream QueryEvents analytics operators (capability layer B, SURVEY §0).

These are the operators the persisted data model is *designed* to support: the schema
splits one query across a QUERY_SUBMITTED and a QUERY_COMPLETED row keyed by QueryId
(EventRecordConstructor.java:104,142), making the correlation join, the rollups, and
the table-frequency explode the defining consumption semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..config import EVENT_QUERY_COMPLETED, EVENT_QUERY_SUBMITTED
from ..plans.ranking import distributed_row_number


def deduplicate_events(events: DataFrame) -> DataFrame:
    """DDP1: at-least-once upstream delivery (retry loop EventLogger.java:196-210) makes
    duplicates possible; canonical dedup key is (QueryId, EventType). Deterministic:
    keeps the earliest event timestamp rather than an arbitrary row."""
    ts = F.coalesce(F.col("StartTime"), F.col("EndTime"))
    w = Window.partitionBy("QueryId", "EventType").orderBy(ts.asc_nulls_last())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def correlate_submit_complete(events: DataFrame, how: str = "left") -> DataFrame:
    """JN1: pair each QUERY_SUBMITTED with its QUERY_COMPLETED on QueryId and derive
    duration/status. Left join keeps never-completed submissions (NULL EndTime).

    Scale: an equi self-join on QueryId — sort-merge under AQE; both sides are
    pre-projected to only the columns each contributes, so the shuffle carries the
    minimum payload. Skewed QueryIds can't exist (ids are unique per side after DDP1).
    """
    sub = events.filter(F.col("EventType") == EVENT_QUERY_SUBMITTED).select(
        "QueryId",
        "QueryType",
        "QueryText",
        "ExecutionMode",
        "ExecutionEngine",
        "RequestUser",
        "UserName",
        "Queue",
        "StartTime",
        "TablesRead",
        "TablesWritten",
        "DatabasesRead",
        "DatabasesWritten",
        "DefaultDatabase",
        "SessionId",
    )
    comp = events.filter(F.col("EventType") == EVENT_QUERY_COMPLETED).select(
        "QueryId",
        "EndTime",
        "Status",
        "ErrorMessage",
        "PerfObject",
        "CountersObject",
        "YarnApplicationId",
        F.col("Queue").alias("FinalQueue"),  # post-event Queue overwrite (:162)
        "HiveHostName",
    )
    return sub.join(comp, "QueryId", how).withColumn(
        "DurationMillis",
        (F.unix_millis(F.col("EndTime")) - F.unix_millis(F.col("StartTime"))).cast("long"),
    )


def query_log_rollups(correlated: DataFrame, *group_cols: str) -> DataFrame:
    """AGG5: the assessment rollup — query counts, failure counts, duration stats per
    arbitrary dimension set (user, queue, mode, day...). Map-side partial agg makes this
    one cheap shuffle regardless of input size."""
    if not group_cols:
        group_cols = ("RequestUser",)
    return (
        correlated.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("query_count"),
            F.sum(F.when(F.col("Status") == "FAIL", 1).otherwise(0)).cast("long").alias("failed_count"),
            F.round(F.avg("DurationMillis"), 3).alias("avg_duration_ms"),
            F.max("DurationMillis").alias("max_duration_ms"),
            F.approx_count_distinct("QueryId").alias("approx_distinct_queries"),
        )
    )


def table_access_frequency(events: DataFrame) -> DataFrame:
    """AGG6: explode TablesRead/TablesWritten into per-table read/write counts with a
    hot-table rank. The explode fans out rows but each carries only (table, flag) —
    the shuffle payload stays tiny at 100 TB of logs.

    hot_rank is a two-phase distributed rank (plans/ranking.py), not a global
    no-partitionBy Window: a large estate can have millions of distinct tables, and
    the single-task global window would be the scale bottleneck of this query."""
    sub = events.filter(F.col("EventType") == EVENT_QUERY_SUBMITTED)
    reads = sub.select(F.explode("TablesRead").alias("table_name")).withColumn(
        "is_write", F.lit(0)
    )
    writes = sub.select(F.explode("TablesWritten").alias("table_name")).withColumn(
        "is_write", F.lit(1)
    )
    counts = (
        reads.unionByName(writes)
        .groupBy("table_name")
        .agg(
            F.sum(F.lit(1) - F.col("is_write")).cast("long").alias("read_count"),
            F.sum("is_write").cast("long").alias("write_count"),
        )
        .withColumn("total_count", (F.col("read_count") + F.col("write_count")).cast("long"))
    )
    return distributed_row_number(
        counts,
        [F.desc("total_count"), F.asc("table_name")],
        rank_col="hot_rank",
    )


def merge_rollup_increment(
    base_agg: DataFrame, delta: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view delta pattern): merge a
    new batch's partial rollup into a previously computed rollup WITHOUT touching the
    base data again. Only algebraically mergeable aggregates participate
    (count/sum/min/max — avg derives from sum/count at read time); holistic
    aggregates (count_distinct, median) are deliberately excluded because their
    partials do not merge.

    Both inputs must carry the schema (group_cols..., n, total, vmin, vmax).
    At 100 TB this is THE difference between re-scanning the corpus per refresh and
    touching only the delta: the merge input is |groups| rows, not |events| rows.
    """
    from pyspark.sql import functions as F

    delta_agg = delta
    merged = base_agg.unionByName(delta_agg)
    return merged.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
