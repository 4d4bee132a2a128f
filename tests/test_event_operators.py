"""Golden-record tests for the event-construction operators, mirroring the reference's
test strategy (SURVEY §5; fixture values from FIXTURES.md §A / testing/TestUtils.java:64-66,
136-171 and EventRecordConstructorTest.java)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from hadoop_migration_assessment_tools_spark.operators.events import (
    classify_execution_mode,
    construct_events,
    post_hook_event,
    pre_hook_event,
)
from hadoop_migration_assessment_tools_spark.operators.correlate import (
    correlate_submit_complete,
    deduplicate_events,
    table_access_frequency,
)
from hadoop_migration_assessment_tools_spark.functions.scalars import (
    is_supported_hive_version,
    mr_job_to_application_id,
)
from hadoop_migration_assessment_tools_spark.schema import HOOK_INPUT_SCHEMA, QUERY_EVENTS_SCHEMA


def _ms(millis: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(millis / 1000, tz=dt.timezone.utc).replace(tzinfo=None)


BASE_INPUT = {
    # Canonical fixture values (TestUtils.java:64-66 etc.)
    "hook_type": "PRE_EXEC_HOOK",
    "query_id": "hive_query_id_999",
    "query_type": "QUERY",
    "query_text": "SELECT * FROM employees",
    "query_start_time": _ms(1234),
    "event_time": _ms(9999),
    "execution_engine": "mr",
    "hook_user_name": "test_user",
    "ugi_user_name": "test_user",
    "operation_id": "test_op_id",
    "session_id": "test_session_id",
    "invoker_info": "test_session_id",
    "thread_name": "test_thread_id",
    "hive_version": "2.2.0",
    "client_ip": "192.168.10.10",
    "hive_address": "hive_addr",
    "is_hs2": True,
    "default_db": "default",
    "error_message": None,
    "queue_mr": None,
    "queue_tez": None,
    "queue_llap": None,
    "tasks": [],
    "inputs": [],
    "outputs": [],
    "perf": {},
    "counters_tez": None,
    "counters_mr": None,
    "yarn_application_id": None,
    "tez_session_app_id": None,
    "llap_app_id": None,
}


def make_input(spark, **overrides):
    row = dict(BASE_INPUT)
    row.update(overrides)
    return spark.createDataFrame([row], schema=HOOK_INPUT_SCHEMA)


def test_pre_hook_event_golden(spark):
    """Golden pre-exec row (FIXTURES.md §A; TestUtils.java:136-158)."""
    df = make_input(
        spark,
        inputs=[
            {"entity_type": "TABLE", "name": "dbName@tableName"},
            {"entity_type": "PARTITION", "name": "dbName@tableName@continent=Europe"},
            {"entity_type": "PARTITION", "name": "dbName@tableName@continent=Asia"},
            {"entity_type": "PARTITION", "name": "dbName@tableName@continent=Asia"},
            {"entity_type": "DATABASE", "name": "dbName"},
        ],
    )
    row = pre_hook_event(df).collect()[0]
    assert row["QueryId"] == "hive_query_id_999"
    assert row["QueryType"] == "QUERY"
    assert row["QueryText"] == "SELECT * FROM employees"
    assert row["EventType"] == "QUERY_SUBMITTED"
    assert row["ExecutionMode"] == "CLIENT_ONLY"  # empty task list
    assert row["ExecutionEngine"] == "mr"
    assert row["StartTime"] == _ms(1234)
    assert row["EndTime"] is None
    assert row["RequestUser"] == "test_user"
    assert row["HookVersion"] == "1.0"
    assert row["HiveVersion"] == "2.2.0"
    assert row["ClientIpAddress"] == "192.168.10.10"
    assert row["HiveAddress"] == "hive_addr"
    assert row["HiveInstanceType"] == "HS2"
    assert row["OperationId"] == "test_op_id"
    assert row["DefaultDatabase"] == "default"
    assert row["TablesRead"] == ["dbName@tableName"]
    # set semantics, order-free compare (EventRecordConstructorTest.java:144-147)
    assert sorted(row["PartitionsRead"]) == [
        "dbName@tableName@continent=Asia",
        "dbName@tableName@continent=Europe",
    ]
    assert row["DatabasesRead"] == ["dbName"]
    assert row["TablesWritten"] == [] and row["PartitionsWritten"] == []
    assert row["Status"] is None and row["CountersObject"] is None


@pytest.mark.parametrize(
    "tasks,expected",
    [
        ([], "CLIENT_ONLY"),
        ([{"task_type": "TEZ", "is_llap": False, "job_id": None}], "TEZ"),
        ([{"task_type": "TEZ", "is_llap": True, "job_id": None}], "LLAP"),
        (
            [
                {"task_type": "TEZ", "is_llap": False, "job_id": None},
                {"task_type": "TEZ", "is_llap": True, "job_id": None},
            ],
            "LLAP",
        ),
        ([{"task_type": "MAPRED", "is_llap": None, "job_id": "job_1_2"}], "MR"),
        ([{"task_type": "SPARK", "is_llap": None, "job_id": None}], "SPARK"),
        ([{"task_type": "DDL", "is_llap": None, "job_id": None}], "DDL"),
        ([{"task_type": "COPY", "is_llap": None, "job_id": None}], "NONE"),
        # Tez wins over MR when both present (reference checks Tez first, :320-333)
        (
            [
                {"task_type": "MAPRED", "is_llap": None, "job_id": None},
                {"task_type": "TEZ", "is_llap": False, "job_id": None},
            ],
            "TEZ",
        ),
    ],
)
def test_execution_mode_matrix(spark, tasks, expected):
    """Execution-mode decision table (EventRecordConstructorTest.java:150-175)."""
    df = make_input(spark, tasks=tasks)
    got = df.select(classify_execution_mode(F.col("tasks")).alias("m")).collect()[0]["m"]
    assert got == expected


def test_post_hook_event_success_and_fail(spark):
    for hook_type, status in [("POST_EXEC_HOOK", "SUCCESS"), ("ON_FAILURE_HOOK", "FAIL")]:
        df = make_input(spark, hook_type=hook_type, error_message="boom" if status == "FAIL" else None)
        row = post_hook_event(df).collect()[0]
        assert row["QueryId"] == "hive_query_id_999"
        assert row["EventType"] == "QUERY_COMPLETED"
        assert row["EndTime"] == _ms(9999)  # fixed clock QUERY_END_TIME = 9999
        assert row["Status"] == status
        assert row["PerfObject"] == "{}"
        assert row["HookVersion"] == "1.0"
        assert row["OperationId"] == "test_op_id"
        assert row["StartTime"] is None


def test_counters_golden_json(spark):
    """Golden counters JSON (EventRecordConstructorTest.java:284-287):
    [[{"counters_group1":{"metric_key1":123}},{"counters_group2":{"metric_key1":456,"metric_key2":789}}]]"""
    counters = [
        [
            {"group": "counters_group1", "counters": {"metric_key1": 123}},
            {"group": "counters_group2", "counters": {"metric_key1": 456, "metric_key2": 789}},
        ]
    ]
    df = make_input(spark, hook_type="POST_EXEC_HOOK", counters_tez=counters)
    row = post_hook_event(df).collect()[0]
    expected = [
        [
            {"counters_group1": {"metric_key1": 123}},
            {"counters_group2": {"metric_key1": 456, "metric_key2": 789}},
        ]
    ]
    # Compare parsed (key order inside JSON objects is unordered in both engines —
    # SURVEY §7 known hard part 1).
    assert json.loads(row["CountersObject"]) == expected


def test_counters_mr_fallback_and_empty(spark):
    mr = [[{"group": "g", "counters": {"k": 1}}]]
    df = make_input(spark, hook_type="POST_EXEC_HOOK", counters_tez=None, counters_mr=mr)
    row = post_hook_event(df).collect()[0]
    assert json.loads(row["CountersObject"]) == [[{"g": {"k": 1}}]]
    # empty counters -> field omitted (null), reference :252
    df2 = make_input(spark, hook_type="POST_EXEC_HOOK", counters_tez=[], counters_mr=None)
    assert post_hook_event(df2).collect()[0]["CountersObject"] is None


def test_perf_running_fallback(spark):
    """AGG2: duration 0 -> now - start (EventRecordConstructor.java:262-266)."""
    perf = {
        "compile": {"start_millis": 1000, "duration_millis": 500},
        "execute": {"start_millis": 2000, "duration_millis": 0},  # still running
    }
    df = make_input(spark, hook_type="POST_EXEC_HOOK", perf=perf)
    row = post_hook_event(df).collect()[0]
    assert json.loads(row["PerfObject"]) == {"compile": 500, "execute": 9999 - 2000}


@pytest.mark.parametrize(
    "version,ok",
    [
        ("2.2.0", True),
        ("2.3.8", True),
        ("2.3", True),
        ("3.1.3", True),
        ("2.1.9", False),
        ("1.1.2", False),
        ("4.0.0", False),
        ("unexpected", False),
        ("5", False),
        ("3.abc1", False),
    ],
)
def test_version_gate_matrix(spark, version, ok):
    """PRJ8 (VersionValidatorTest.java:29-49)."""
    df = spark.createDataFrame([(version,)], ["v"])
    got = df.select(is_supported_hive_version(F.col("v")).alias("ok")).collect()[0]["ok"]
    assert got is ok


def test_app_id_conversion(spark):
    """FLT7 golden (ApplicationIdRetrieverTest.java:68-97)."""
    df = spark.createDataFrame(
        [("job_1685098059769_1951",), ("malformed",), (None,)], ["job_id"]
    )
    got = [
        r["app"]
        for r in df.select(mr_job_to_application_id(F.col("job_id")).alias("app")).collect()
    ]
    assert got == ["application_1685098059769_1951", None, None]


def test_queue_dispatch(spark):
    cases = [
        ([{"task_type": "TEZ", "is_llap": True, "job_id": None}], "llap_q"),
        ([{"task_type": "MAPRED", "is_llap": None, "job_id": None}], "mr_q"),
        ([{"task_type": "TEZ", "is_llap": False, "job_id": None}], "tez_q"),
        ([], None),
    ]
    for tasks, expected in cases:
        df = make_input(spark, tasks=tasks, queue_mr="mr_q", queue_tez="tez_q", queue_llap="llap_q")
        assert pre_hook_event(df).collect()[0]["Queue"] == expected


def test_construct_events_dispatch_and_gate(spark):
    """FLT4/FLT5 + union: 3 hook types produce records, others dropped; null plan dropped."""
    rows = []
    for ht in ["PRE_EXEC_HOOK", "POST_EXEC_HOOK", "ON_FAILURE_HOOK", "UNKNOWN_HOOK"]:
        r = dict(BASE_INPUT)
        r["hook_type"] = ht
        rows.append(r)
    null_plan = dict(BASE_INPUT)
    null_plan["query_id"] = None
    rows.append(null_plan)
    raw = spark.createDataFrame(rows, schema=HOOK_INPUT_SCHEMA)
    out = construct_events(raw)
    # Names + types must match the avsc-derived schema exactly. Nullability may be
    # tighter on literal-derived columns (non-null is a safe subtype of nullable;
    # Spark's analyzer keeps the tighter flag through any cast).
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in QUERY_EVENTS_SCHEMA.fields
    ]
    got = [(r["EventType"], r["Status"]) for r in out.collect()]
    assert sorted(got) == [
        ("QUERY_COMPLETED", "FAIL"),
        ("QUERY_COMPLETED", "SUCCESS"),
        ("QUERY_SUBMITTED", None),
    ]


def test_yarn_enrichment_join(spark):
    """JN2: broadcast lookup replaces the per-query RM RPC; absent app -> nulls kept."""
    mr_tasks = [{"task_type": "MAPRED", "is_llap": None, "job_id": "job_1685098059769_1951"}]
    df = make_input(spark, hook_type="POST_EXEC_HOOK", tasks=mr_tasks)
    apps = spark.createDataFrame(
        [("application_1685098059769_1951", "host-1", "root.etl")],
        ["application_id", "host", "queue"],
    )
    row = post_hook_event(df, yarn_applications=apps).collect()[0]
    assert row["YarnApplicationId"] == "application_1685098059769_1951"
    assert row["HiveHostName"] == "host-1"
    assert row["Queue"] == "root.etl"
    # unmatched app id -> enrichment silently skipped (nulls), reference :159-163
    df2 = make_input(
        spark,
        hook_type="POST_EXEC_HOOK",
        tasks=[{"task_type": "MAPRED", "is_llap": None, "job_id": "job_0_0"}],
    )
    row2 = post_hook_event(df2, yarn_applications=apps).collect()[0]
    assert row2["YarnApplicationId"] == "application_0_0"
    assert row2["HiveHostName"] is None


def _synthetic_events(spark, n=6):
    """Synthetic QueryEvents table (FIXTURES.md §A generator): 2 rows per query,
    one orphan submit, one duplicated completion."""
    rows = []
    for i in range(n):
        qid = f"hive_query_id_{i}"
        sub = {f.name: None for f in QUERY_EVENTS_SCHEMA.fields}
        sub.update(
            QueryId=qid,
            EventType="QUERY_SUBMITTED",
            StartTime=_ms(1000 * i),
            RequestUser=f"user_{i % 2}",
            TablesRead=[f"db@t{i % 3}"],
            TablesWritten=["db@sink"] if i % 2 == 0 else [],
            ExecutionMode="TEZ",
        )
        rows.append(sub)
        if i < n - 1:  # last query never completes (orphan)
            comp = {f.name: None for f in QUERY_EVENTS_SCHEMA.fields}
            comp.update(
                QueryId=qid,
                EventType="QUERY_COMPLETED",
                EndTime=_ms(1000 * i + 500),
                Status="SUCCESS" if i % 3 else "FAIL",
                RequestUser=f"user_{i % 2}",
            )
            rows.append(comp)
            if i == 0:  # duplicate delivery
                rows.append(dict(comp))
    for r in rows:
        r["TablesRead"] = r.get("TablesRead") or []
        r["TablesWritten"] = r.get("TablesWritten") or []
        r["PartitionsRead"] = r.get("PartitionsRead") or []
        r["PartitionsWritten"] = r.get("PartitionsWritten") or []
        r["DatabasesRead"] = r.get("DatabasesRead") or []
        r["DatabasesWritten"] = r.get("DatabasesWritten") or []
    return spark.createDataFrame(rows, schema=QUERY_EVENTS_SCHEMA)


def test_dedup_and_correlate(spark):
    ev = _synthetic_events(spark)
    deduped = deduplicate_events(ev)
    assert deduped.count() == 11  # 6 submits + 5 completes, duplicate dropped
    corr = correlate_submit_complete(deduped)
    assert corr.count() == 6
    by_id = {r["QueryId"]: r for r in corr.collect()}
    assert by_id["hive_query_id_0"]["DurationMillis"] == 500
    assert by_id["hive_query_id_5"]["EndTime"] is None  # orphan kept by left join
    assert by_id["hive_query_id_0"]["Status"] == "FAIL"


def test_table_access_frequency(spark):
    ev = _synthetic_events(spark)
    freq = {r["table_name"]: r for r in table_access_frequency(ev).collect()}
    assert freq["db@sink"]["write_count"] == 3
    assert freq["db@sink"]["read_count"] == 0
    assert freq["db@t0"]["read_count"] == 2  # i=0,3
    assert freq["db@sink"]["hot_rank"] == 1


def test_writer_id_column_shape(spark):
    """PRJ10 (utils/IdGenerator.java:22-30): 10-char alnum ids, random per row."""
    from hadoop_migration_assessment_tools_spark.functions.scalars import writer_id

    rows = [r["wid"] for r in spark.range(50).select(writer_id().alias("wid")).collect()]
    assert all(len(w) == 10 and w.isalnum() for w in rows)
    assert len(set(rows)) == 50  # uuid-derived: unique per row


# --- SCD2 merge (operators/scd.py) ---------------------------------------------------


def test_scd2_apply_routes_rows(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.operators.scd import scd2_apply

    t0, t1, t2 = (dt.datetime(2020, 1, 1), dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1))
    dim = spark.createDataFrame(
        [(1, 10.0, t0, None), (2, 20.0, t0, None), (3, 30.0, t0, t1)],
        "k long, v double, valid_from timestamp, valid_to timestamp",
    )
    # update existing key 1, insert brand-new key 9
    updates = spark.createDataFrame(
        [(1, 11.0, t1), (9, 99.0, t1)], "k long, v double, eff_ts timestamp"
    )
    out1 = scd2_apply(dim, updates, "k", "eff_ts", ["v"])
    rows = {(r["k"], r["valid_from"], r["valid_to"]): r["v"] for r in out1.collect()}
    assert rows[(1, t0, t1)] == 10.0       # closed old version
    assert rows[(1, t1, None)] == 11.0     # new current version
    assert rows[(2, t0, None)] == 20.0     # untouched current
    assert rows[(3, t0, t1)] == 30.0       # history passes through
    assert rows[(9, t1, None)] == 99.0     # brand-new key inserts
    assert len(rows) == 5

    # second batch chains: key 1 updated again -> 3 versions, exactly one current
    out2 = scd2_apply(
        out1, spark.createDataFrame([(1, 12.0, t2)], "k long, v double, eff_ts timestamp"),
        "k", "eff_ts", ["v"],
    )
    k1 = sorted(
        (r["valid_from"], r["valid_to"], r["v"])
        for r in out2.filter(F.col("k") == 1).collect()
    )
    assert k1 == [(t0, t1, 10.0), (t1, t2, 11.0), (t2, None, 12.0)]
    assert out2.filter(F.col("valid_to").isNull() & (F.col("k") == 1)).count() == 1


def test_normalize_query_text_goldens(spark):
    from pyspark.sql import functions as F

    from hadoop_migration_assessment_tools_spark.functions.scalars import (
        normalize_query_text,
    )

    cases = [
        ("SELECT * FROM t WHERE id = 42", "select * from t where id = ?"),
        ("select a,b  FROM  T where x='O''Neil corp' and y=7",
         "select a,b from t where x=? and y=?"),
        ("INSERT INTO x VALUES (1, 'a'), (2, 'b')",
         "insert into x values (?, ?), (?, ?)"),
        ("  SELECT\t1\n", "select ?"),
        # digits inside identifiers survive (word-bounded literal stripping):
        # queries over different numbered tables keep distinct fingerprints.
        ("SELECT col2 FROM t1 WHERE k = 10", "select col2 from t1 where k = ?"),
    ]
    df = spark.createDataFrame([(q,) for q, _ in cases], "q: string")
    got = [r["f"] for r in df.select(normalize_query_text(F.col("q")).alias("f")).collect()]
    want = [w for _, w in cases]
    assert got == want
