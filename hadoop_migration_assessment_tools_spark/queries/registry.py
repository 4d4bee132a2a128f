"""Named query registry exported through __spark_entry__.py.

QUERIES[name] is a (spark, sf_dir) -> DataFrame callable; ORACLE_SQL[name] is the DuckDB
twin. Names missing from ORACLE_SQL get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible operators — SURVEY §7 Stage 3 note).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import tpch

Query = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, Query] = {
    "q1_pricing_summary": tpch.q1_pricing_summary,
    "q3_shipping_priority": tpch.q3_shipping_priority,
    "q5_local_supplier_volume": tpch.q5_local_supplier_volume,
    "top_customers_by_revenue": tpch.top_customers_by_revenue,
    "order_priority_semijoin": tpch.order_priority_semijoin,
    "customers_without_orders": tpch.customers_without_orders,
    "rollup_order_status": tpch.rollup_order_status,
}

ORACLE_SQL: dict[str, str] = {
    "q1_pricing_summary": tpch.Q1_ORACLE,
    "q3_shipping_priority": tpch.Q3_ORACLE,
    "q5_local_supplier_volume": tpch.Q5_ORACLE,
    "top_customers_by_revenue": tpch.TOP_CUSTOMERS_ORACLE,
    "order_priority_semijoin": tpch.ORDER_PRIORITY_ORACLE,
    "customers_without_orders": tpch.CUSTOMERS_WITHOUT_ORDERS_ORACLE,
    "rollup_order_status": tpch.ROLLUP_ORDER_STATUS_ORACLE,
}
