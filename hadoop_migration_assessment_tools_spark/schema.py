"""The QueryEvents data model as Spark types.

Reference: src/java/com/google/cloud/bigquery/dwhassessment/hooks/avro/QueryEvents.avsc:1-288
(33 fields; every scalar a nullable union with null default, arrays default empty;
Start/EndTime are timestamp-millis logical types). Field order below matches the avsc
declaration order — SURVEY §1.2 has the field-by-field citation table.

The two JSON-in-string escape hatches (PerfObject, CountersObject — SURVEY §1.1) get
first-class parse schemas here so consumers can ``from_json`` them.
"""

from __future__ import annotations

from pyspark.sql import types as T

_S = T.StringType()
_TS = T.TimestampType()
_ARR = T.ArrayType(T.StringType())


def _f(name: str, dtype: T.DataType) -> T.StructField:
    # Nullability-first: every field nullable with null default (QueryEvents.avsc, all unions).
    return T.StructField(name, dtype, nullable=True)


#: The 33-field event record (QueryEvents.avsc:2-286), avsc declaration order.
QUERY_EVENTS_SCHEMA = T.StructType(
    [
        _f("QueryId", _S),  # avsc:5-12  — correlation key for submit/complete pairing
        _f("QueryType", _S),  # avsc:13-20
        _f("QueryText", _S),  # avsc:21-28
        _f("EventType", _S),  # avsc:29-36 — QUERY_SUBMITTED | QUERY_COMPLETED
        _f("ExecutionMode", _S),  # avsc:37-44 — MR/TEZ/LLAP/DDL/CLIENT_ONLY/SPARK/NONE
        _f("ExecutionEngine", _S),  # avsc:45-52
        _f("RequestUser", _S),  # avsc:53-60
        _f("UserName", _S),  # avsc:61-68
        _f("Queue", _S),  # avsc:69-76
        _f("OperationId", _S),  # avsc:77-84
        _f("StartTime", _TS),  # avsc:85-95  — timestamp-millis
        _f("EndTime", _TS),  # avsc:96-106 — timestamp-millis
        _f("TablesRead", _ARR),  # avsc:107-116 — set semantics (distinct, unordered)
        _f("TablesWritten", _ARR),  # avsc:117-126
        _f("PartitionsRead", _ARR),  # avsc:127-136 — names 'db@table@k=v'
        _f("PartitionsWritten", _ARR),  # avsc:137-146
        _f("Status", _S),  # avsc:147-154 — SUCCESS | FAIL
        _f("ErrorMessage", _S),  # avsc:155-162
        _f("PerfObject", _S),  # avsc:163-170 — JSON {perf_key: millis}
        _f("CountersObject", _S),  # avsc:171-178 — JSON [[{group:{counter:long}}]]
        _f("SessionId", _S),  # avsc:179-186
        _f("InvokerInfo", _S),  # avsc:187-194
        _f("ThreadName", _S),  # avsc:195-202
        _f("HookVersion", _S),  # avsc:203-210 — constant "1.0"
        _f("HiveVersion", _S),  # avsc:211-218
        _f("ClientIpAddress", _S),  # avsc:219-226
        _f("HiveAddress", _S),  # avsc:227-234
        _f("HiveHostName", _S),  # avsc:235-242
        _f("HiveInstanceType", _S),  # avsc:243-250 — HS2 | CLI
        _f("YarnApplicationId", _S),  # avsc:251-258
        _f("DatabasesRead", _ARR),  # avsc:259-268
        _f("DatabasesWritten", _ARR),  # avsc:269-278
        _f("DefaultDatabase", _S),  # avsc:279-286
    ]
)

#: PerfObject payload: flat map perf_key -> millis (EventRecordConstructor.java:255-271).
PERF_OBJECT_SCHEMA = T.MapType(T.StringType(), T.LongType())

#: CountersObject payload: [[{group: {counter: long}}]] — array (one element per job) of
#: array (one element per counter group) of single-key map group -> {counter: value}
#: (EventRecordConstructor.java:223-253).
COUNTERS_OBJECT_SCHEMA = T.ArrayType(
    T.ArrayType(T.MapType(T.StringType(), T.MapType(T.StringType(), T.LongType())))
)

#: Raw hook-context input row: what SRC1 receives per lifecycle event, before the
#: PRJ1/PRJ2 projections shape it into QUERY_EVENTS_SCHEMA. Mirrors the fields the
#: reference pulls off HookContext/QueryPlan/HiveConf (EventRecordConstructor.java:94-132).
HOOK_INPUT_SCHEMA = T.StructType(
    [
        _f("hook_type", _S),  # PRE_EXEC_HOOK | POST_EXEC_HOOK | ON_FAILURE_HOOK
        _f("query_id", _S),
        _f("query_type", _S),
        _f("query_text", _S),
        _f("query_start_time", _TS),
        _f("event_time", _TS),  # injectable clock (SURVEY §5.4 — never current_timestamp)
        _f("execution_engine", _S),
        _f("hook_user_name", _S),  # hookContext.getUserName()
        _f("ugi_user_name", _S),  # UserGroupInformation user
        _f("operation_id", _S),
        _f("session_id", _S),
        _f("invoker_info", _S),
        _f("thread_name", _S),
        _f("hive_version", _S),
        _f("client_ip", _S),
        _f("hive_address", _S),
        _f("is_hs2", T.BooleanType()),
        _f("default_db", _S),
        _f("error_message", _S),
        _f("queue_mr", _S),  # conf[mapreduce.job.queuename]
        _f("queue_tez", _S),  # conf[tez.queue.name]
        _f("queue_llap", _S),  # conf[hive.llap.daemon.queue.name]
        # Task DAG, pre-flattened to one struct per task (FLT6/PRJ7 operate on this).
        _f(
            "tasks",
            T.ArrayType(
                T.StructType(
                    [
                        _f("task_type", _S),  # TEZ | MAPRED | SPARK | DDL | other
                        _f("is_llap", T.BooleanType()),
                        _f("job_id", _S),  # MR job id, e.g. job_1685098059769_1951
                    ]
                )
            ),
        ),
        # Read/write entity sets (FLT1-3 operate on these).
        _f(
            "inputs",
            T.ArrayType(
                T.StructType(
                    [_f("entity_type", _S), _f("name", _S)]  # TABLE | PARTITION | DATABASE | ...
                )
            ),
        ),
        _f(
            "outputs",
            T.ArrayType(
                T.StructType([_f("entity_type", _S), _f("name", _S)])
            ),
        ),
        # Perf entries: perf_key -> (start millis, duration millis); duration 0 == still
        # running, resolved against the event clock (AGG2, EventRecordConstructor.java:255-271).
        _f(
            "perf",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [_f("start_millis", T.LongType()), _f("duration_millis", T.LongType())]
                ),
            ),
        ),
        # Counters: per job, per group, counter -> value (AGG1).
        _f(
            "counters_tez",
            T.ArrayType(T.ArrayType(T.StructType([_f("group", _S), _f("counters", T.MapType(_S, T.LongType()))]))),
        ),
        _f(
            "counters_mr",
            T.ArrayType(T.ArrayType(T.StructType([_f("group", _S), _f("counters", T.MapType(_S, T.LongType()))]))),
        ),
        _f("yarn_application_id", _S),
        _f("tez_session_app_id", _S),  # ApplicationIdRetriever.java:58-72
        _f("llap_app_id", _S),  # ApplicationIdRetriever.java:100-120
    ]
)
