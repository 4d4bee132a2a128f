from .readers import (  # noqa: F401
    load_table,
    load_tables,
    read_event_log,
    read_jsonl_with_quarantine,
    register_views,
)
from .sink import DatePartitionedSink, compact_log_tree  # noqa: F401
from .avro_ocf import (  # noqa: F401
    OcfWriter,
    RollingOcfWriterFactory,
    SystemClock,
    TickableFixedClock,
    avsc_to_struct,
    generate_logger_id,
    read_ocf,
    read_ocf_bytes,
    struct_to_avsc,
    write_ocf,
    write_with_retries,
)
