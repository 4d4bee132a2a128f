"""Zero-job literal DataFrames (r13 optimization, guide §5 driver discipline).

``spark.createDataFrame(list_of_tuples, schema)`` ships the literals through a
pickled RDD cut into ``defaultParallelism`` slices — on a 32-core session that
is a 32-task job round-tripping 32 Python workers to materialize a handful of
rows. The registry's selector/threshold patterns (quantile spec tables, price
bands, advisor probes) each paid 0.5-1 s per call for it under load.

``local_df`` routes the same rows through a ``pyarrow.Table`` instead, which
Spark turns into a LocalTableScan: the rows embed in the plan, no job, no
tasks, and downstream broadcasts build straight from the local relation.
PyArrow (unlike pandas) represents missing values as true nulls, so None
round-trips exactly for every column type. Any conversion surprise falls back
to the classic list path — behavior, never correctness, is the optimization.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["local_df"]


def local_df(spark: SparkSession, rows: Iterable[tuple], schema) -> DataFrame:
    """A small literal DataFrame as a LocalRelation (no Spark job).

    ``rows``: iterable of tuples in schema field order (list-of-tuples exactly
    as ``spark.createDataFrame`` takes). ``schema``: DDL string or StructType.
    """
    rows = list(rows)
    try:
        import pyarrow as pa

        struct = (
            schema
            if isinstance(schema, T.StructType)
            else T._parse_datatype_string(schema)
        )
        names = struct.fieldNames()
        columns = {
            name: [row[i] for row in rows] for i, name in enumerate(names)
        }
        table = pa.table(columns)
        return spark.createDataFrame(table, schema=struct)
    except Exception:
        # conversion surprise (exotic type, pyarrow mismatch): the classic
        # parallelize path is slower but always correct
        return spark.createDataFrame(rows, schema)
