"""Local stand-in for the driver's correctness gate.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same parquet dir,
then compares row count, column-name set, and an order-insensitive canonical value
multiset — the same discipline as CORRECTNESS_r{N}.json (BASELINE.md §B).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from .config import CORPUS_TABLES


def _canon_cell(v):
    """Canonicalize a cell so Spark and DuckDB representations compare equal."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits absorbs float64 repr jitter across engines while still
        # catching real value mismatches.
        return f"{v:.12g}"
    if isinstance(v, Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        if isinstance(v, _dt.datetime) and v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int, str)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    # numpy scalars and the like
    try:
        import numpy as np

        if isinstance(v, np.floating):
            return _canon_cell(float(v))
        if isinstance(v, np.integer):
            return _canon_cell(int(v))
        if isinstance(v, np.ndarray):
            return _canon_cell(list(v))
        if isinstance(v, np.datetime64):
            import pandas as pd

            return _canon_cell(pd.Timestamp(v).to_pydatetime())
    except ImportError:
        pass
    return repr(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    rows = df.collect()
    return list(df.columns), [tuple(r) for r in rows]


def duckdb_result(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    import duckdb

    con = duckdb.connect()
    try:
        for t in CORPUS_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        return cols, res.fetchall()
    finally:
        con.close()


def assert_oracle_parity(spark: SparkSession, query, sql: str, sf_dir: str) -> None:
    s_cols, s_rows = spark_result(query(spark, sf_dir))
    d_cols, d_rows = duckdb_result(sql, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), f"schema mismatch: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs {len(d_rows)}"
    s_canon = _canon_rows(s_cols, s_rows)
    d_canon = _canon_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
