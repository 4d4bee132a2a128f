"""Every registry query with an oracle must hash-match DuckDB at sf0.01 —
the local stand-in for the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from hadoop_migration_assessment_tools_spark.queries.registry import ORACLE_SQL, QUERIES
from hadoop_migration_assessment_tools_spark.testing import assert_oracle_parity

from conftest import SF_CORRECT


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, name):
    assert_oracle_parity(spark, QUERIES[name], ORACLE_SQL[name], SF_CORRECT)


def test_all_queries_return_rows(spark):
    for name, q in QUERIES.items():
        assert q(spark, SF_CORRECT).count() > 0, name
