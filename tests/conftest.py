from __future__ import annotations

import pytest

from hadoop_migration_assessment_tools_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hadoop-migration-assessment-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
