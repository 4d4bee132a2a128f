from .parity import money, sum_money, avg_exact, count_big  # noqa: F401
from .scalars import (  # noqa: F401
    coalesce_user,
    complete_table_name,
    partition_name,
    version_major_minor,
    is_supported_hive_version,
    mr_job_to_application_id,
)
