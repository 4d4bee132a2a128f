"""PySpark-native analytics engine with the query/data-processing capabilities of
google/hadoop-migration-assessment-tools (the BigQuery Migration Assessment Hive hook).

Layout (SURVEY.md is the blueprint; every operator cites the reference file:line):

- ``schema``    — the 33-field QueryEvents data model as a Spark StructType
                  (reference: src/java/.../hooks/avro/QueryEvents.avsc).
- ``session``   — SparkSession factory with the engine's required configs (UTC, AQE).
- ``config``    — constants mirroring LoggingHookConstants / LoggerVarsConfig.
- ``sources``   — parquet/avro readers and the date-partitioned rolling sink
                  (reference: DatePartitionedRecordsWriterFactory / RecordsWriter).
- ``operators`` — event construction, extraction, classification, aggregation
                  (reference: EventRecordConstructor and friends), plus the
                  analytics-layer relational operators.
- ``functions`` — scalar-function surface (SURVEY §2.7).
- ``streaming`` — Structured Streaming equivalents of the hook's async pipeline
                  (SURVEY §2.8), incl. stateful submit/complete pairing.
- ``ext``       — [EXT] LLM-data-pipeline operators: dedup (exact/minhash/simhash),
                  embedding similarity search, text analysis, multimodal plumbing.
- ``queries``   — the named query registry exported through __spark_entry__.py.
- ``logger``    — config-driven logger facade with the reference's degrade-to-noop
                  contract (EventLogger.java:90-103): bad config disables, never
                  breaks the host workload.
"""

__version__ = "0.1.0"
