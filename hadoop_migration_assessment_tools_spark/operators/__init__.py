from .events import (  # noqa: F401
    classify_execution_mode,
    construct_events,
    counters_json,
    determine_application_id,
    extract_entity_names,
    perf_json,
    post_hook_event,
    pre_hook_event,
    queue_name,
)
from .correlate import correlate_submit_complete, merge_rollup_increment  # noqa: F401
from .scd import scd2_apply  # noqa: F401
