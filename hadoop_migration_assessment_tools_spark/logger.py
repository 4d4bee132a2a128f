"""Config-driven event-logger facade with the reference's degrade-to-noop contract.

Reference behavior being re-expressed (EventLogger.java:90-103,131-137;
MigrationAssessmentLoggingHook.java:52-67): when the base-directory config key is
blank or unset, the hook LOGS an error and disables itself — every subsequent
handle() call is a silent no-op — instead of failing the host workload. A Hive
deployment must never lose queries to a misconfigured assessment hook; the same
holds for a Spark pipeline embedding this engine.

The engine's default posture everywhere else is fail-loud (SURVEY §4.2 documented
deviation); this module is the opt-in fidelity path for embedders who want the
reference's exact resilience semantics. ``EventLogger.from_conf`` is the validated
entry point: it returns either an enabled logger wrapping ``DatePartitionedSink``
or an explicitly ``disabled`` one whose writes do nothing (EventLoggerTest.java:71-84:
construct with an empty conf, handle events, assert the log dir stays empty).
"""

from __future__ import annotations

import logging
from typing import Mapping

from pyspark.sql import DataFrame

from .config import (
    CONF_BASE_DIRECTORY,
    CONF_QUEUE_CAPACITY,
    CONF_ROLLOVER_INTERVAL,
    DEFAULT_QUEUE_CAPACITY,
    DEFAULT_ROLLOVER_INTERVAL_SECONDS,
)

LOG = logging.getLogger(__name__)

_SUFFIX_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_duration_seconds(value, default: int) -> int:
    """Parse a duration config value: int seconds, or a string with an optional
    s/m/h/d suffix (the reference accepts Hadoop time-duration strings). Bad values
    degrade to the default with a logged error — config never throws here."""
    if value is None:
        return default
    try:
        s = str(value).strip().lower()
        if s and s[-1] in _SUFFIX_SECONDS:
            return int(float(s[:-1]) * _SUFFIX_SECONDS[s[-1]])
        return int(float(s))
    except (ValueError, TypeError):
        LOG.error("Invalid duration %r for rollover interval; using default %ss", value, default)
        return default


class EventLogger:
    """Enabled-or-disabled event logger; construct via ``from_conf``.

    ``disabled`` is an explicit, inspectable state (not an exception path): the
    reference models it as a null writer factory checked on every handle()
    (EventLogger.java:131-137); here it is a flag checked in ``handle``.
    """

    def __init__(
        self,
        base_dir: str | None,
        rollover_seconds: int = DEFAULT_ROLLOVER_INTERVAL_SECONDS,
        queue_capacity: int = DEFAULT_QUEUE_CAPACITY,
        fmt: str = "avro",
    ) -> None:
        self.base_dir = base_dir
        self.rollover_seconds = rollover_seconds
        self.queue_capacity = queue_capacity
        self.fmt = fmt
        self.events_written = 0
        if base_dir is None:
            self._sink = None
        else:
            from .sources.sink import DatePartitionedSink

            self._sink = DatePartitionedSink(base_dir, fmt=fmt)

    @classmethod
    def from_conf(cls, conf: Mapping[str, object], fmt: str = "avro") -> "EventLogger":
        """Validated construction from the reference's config-key surface.

        Blank/unset base dir -> DISABLED logger + error log (EventLogger.java:90-97);
        malformed capacity/interval values degrade to defaults, never raise."""
        base_dir = conf.get(CONF_BASE_DIRECTORY)
        base_dir = str(base_dir).strip() if base_dir is not None else ""
        if not base_dir:
            LOG.error(
                "Log dir configuration key '%s' is not set, logging disabled.",
                CONF_BASE_DIRECTORY,
            )
            return cls(None, fmt=fmt)
        try:
            capacity = int(conf.get(CONF_QUEUE_CAPACITY, DEFAULT_QUEUE_CAPACITY))
        except (ValueError, TypeError):
            LOG.error(
                "Invalid queue capacity %r; using default %d",
                conf.get(CONF_QUEUE_CAPACITY),
                DEFAULT_QUEUE_CAPACITY,
            )
            capacity = DEFAULT_QUEUE_CAPACITY
        rollover = parse_duration_seconds(
            conf.get(CONF_ROLLOVER_INTERVAL), DEFAULT_ROLLOVER_INTERVAL_SECONDS
        )
        return cls(base_dir, rollover_seconds=rollover, queue_capacity=capacity, fmt=fmt)

    @property
    def disabled(self) -> bool:
        return self._sink is None

    def handle(self, events: DataFrame) -> int:
        """Persist a batch of QueryEvents rows; no-op (returns 0) when disabled —
        the reference's handle() early-returns on a null writer factory."""
        if self._sink is None:
            return 0
        n = events.count()
        self._sink.write_batch(events)
        self.events_written += n
        return n
