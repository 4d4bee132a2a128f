from .bucketing import save_bucketed, read_bucketed_table, assert_no_shuffle_join  # noqa: F401
from .ranking import distributed_row_number  # noqa: F401
from .skew import diagnose_join_skew, salted_aggregate, salted_join_left  # noqa: F401
from .range_join import range_join  # noqa: F401
from .audit import plan_signature, formatted_plan, assert_scale_safe  # noqa: F401
