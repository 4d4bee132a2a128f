from .registry import QUERIES, ORACLE_SQL  # noqa: F401
