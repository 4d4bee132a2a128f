"""Scalar-function surface (SURVEY §2.7) — the reference's transformations as Columns.

Everything here is a pure Column expression (JVM-side, whole-stage-codegen friendly);
no Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Regex the reference uses to gate Hive versions (utils/VersionValidator.java:29).
_VERSION_RE = r"^(\d+)\.(\d+).*"


def coalesce_user(hook_user: Column, ugi_user: Column) -> Column:
    """PRJ3: RequestUser = coalesce(hookContext.userName, ugi.userName)
    (EventRecordConstructor.java:307-310)."""
    return F.coalesce(hook_user, ugi_user)


def complete_table_name(db: Column | str, table: Column | str) -> Column:
    """Table identity 'db@table' (Hive getCompleteName(), EventRecordConstructor.java:277)."""
    db = F.col(db) if isinstance(db, str) else db
    table = F.col(table) if isinstance(table, str) else table
    return F.concat_ws("@", db, table)


def partition_name(db: Column, table: Column, part_key: Column, part_val: Column) -> Column:
    """Partition identity 'db@table@key=val' (golden: EventRecordConstructorTest.java:145-147)."""
    return F.concat_ws("@", db, table, F.concat_ws("=", part_key, part_val))


def version_major_minor(version: Column) -> Column:
    """PRJ8: parse 'major.minor' out of a version string; null when unparseable
    (utils/VersionValidator.java:44-51)."""
    major = F.regexp_extract(version, _VERSION_RE, 1)
    minor = F.regexp_extract(version, _VERSION_RE, 2)
    return F.when(
        major != "", F.concat_ws(".", major, minor)
    ).otherwise(F.lit(None).cast("string"))


def is_supported_hive_version(version: Column) -> Column:
    """PRJ8 gate: major==2 ? minor>=2 : major==3; unparseable -> false
    (utils/VersionValidator.java:44-55; matrix VersionValidatorTest.java:29-49).

    try_cast, not cast: a regex-matched component can still overflow the numeric
    type (e.g. '2147483647.0' * 1000 under ANSI mode crashed the whole query).
    The reference's Integer.parseInt rejects such strings (NumberFormatException
    -> unsupported); try_cast-to-long yields null there, and null comparisons
    fall through to the coalesce(false). No multiplication anywhere, so no
    arithmetic can overflow regardless of input.
    """
    maj = F.regexp_extract(version, _VERSION_RE, 1).try_cast("long")
    mino = F.regexp_extract(version, _VERSION_RE, 2).try_cast("long")
    # the reference parses BOTH components before comparing, so an overflow
    # in EITHER rejects — without the explicit null guard, major==3 would
    # ignore an unparseable minor and diverge from that reading
    ok = (
        F.when(maj.isNull() | mino.isNull(), F.lit(False))
        .when(maj == 2, mino >= 2)
        .otherwise(maj == 3)
    )
    return F.coalesce(ok, F.lit(False))


def mr_job_to_application_id(job_id: Column) -> Column:
    """FLT7: MR job id -> YARN application id; malformed -> null
    (ApplicationIdRetriever.java:78-94; golden ApplicationIdRetrieverTest.java:68-97:
    job_1685098059769_1951 -> application_1685098059769_1951)."""
    ok = job_id.rlike(r"^job_\d+_\d+$")
    return F.when(ok, F.regexp_replace(job_id, r"^job_", "application_"))


def writer_id(length: int = 10) -> Column:
    """PRJ10 (utils/IdGenerator.java:22-30): random alphanumeric writer id, default 10
    chars — used to tag sink files/instances. uuid-derived (hex subset of alnum)."""
    return F.substring(F.regexp_replace(F.uuid(), "-", ""), 1, length)


def json_get_long(json_col: Column | str, key: str) -> Column:
    """JSON scalar extraction used all over the analytics layer (SURVEY §2.7 JSON family).

    try_cast, not cast: the JSON value is user-controlled text, and under ANSI
    mode (Spark 4 default) cast("long") of an out-of-range number string kills
    the whole query. Malformed/overflowing -> null, same as a missing key.
    """
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.get_json_object(c, f"$.{key}").try_cast("long")


def normalize_query_text(col: Column) -> Column:
    """Query fingerprinting: strip literals so structurally identical queries
    collapse to one shape — the standard assessment move for grouping a workload's
    QueryText (avsc:21-28) into migration-relevant patterns. Lowercase, replace
    quoted string literals then bare integer literals with '?', collapse
    whitespace. The string-literal pattern honors SQL doubled-quote escapes
    ('O''Neil' is ONE literal) and is written in the unrolled linear-scan form
    '[^']*(?:''[^']*)*' — same language as the per-character alternation
    '([^']|'')*' but runs as a plain scan in both Java regex and RE2.
    The integer pattern is word-bounded so digits
    INSIDE identifiers survive ("t1"/"col2" keep their digits — different
    numbered tables must NOT collapse to one fingerprint). Literal and integer
    replacement run as ONE alternation pass (the branches can never match at
    the same position — quote vs digit — so leftmost semantics equal the
    sequential two-pass result in both engines, and every row is scanned one
    fewer time: at corpus scale the regex passes ARE the operator's cost).
    Dialect-portable regexes (no backrefs; \\b is an ASCII word boundary in
    both Java regex and RE2); the DuckDB oracle runs the identical
    expressions."""
    t = F.lower(col)
    t = F.regexp_replace(t, r"'[^']*(?:''[^']*)*'|\b[0-9]+\b", "?")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)
