from .readers import load_table, load_tables, register_views  # noqa: F401
from .sink import DatePartitionedSink  # noqa: F401
