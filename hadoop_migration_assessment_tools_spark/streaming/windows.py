"""STR7: event-time windows with watermarks (SURVEY §2.8).

Not in the reference (its files are partitioned by processing-time wall clock —
DatePartitionedRecordsWriterFactory.java:204-206); required for event-time-correct
analytics over StartTime/EndTime and the events table. Late rows beyond the watermark
are dropped by the engine; state is bounded by watermark horizon × window count.

Every function works identically on batch DataFrames (same operators) — that is how
correctness is cross-checked against the batch twins in queries/events_analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling per-window × event_type counts/sums (batch twin: events_hourly_rollup)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("event_count"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def sliding_window_value(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows: each event lands in window/slide overlapping buckets."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("event_count"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_count",
            "approx_users",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows per user (gap-based), the streaming form of
    events_sessionize. State closes when the watermark passes session end + gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("events_in_session"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "events_in_session",
            "session_value",
        )
    )


def daily_hll_registers(
    events: DataFrame,
    watermark: str = "2 days",
    ts_col: str = "ts",
    value_col: str = "user_id",
    p: int = 5,
) -> DataFrame:
    """Streaming + sketch composition: per-day HLL register sets maintained
    INCREMENTALLY by the engine — state is groupBy(day window, reg).max(rank),
    i.e. <= 2^p bounded rows per day regardless of event volume, and MAX is
    both the streaming-safe aggregate and the sketch's merge operator, so each
    micro-batch folds into the state exactly as a batch union would.

    Batch twin: ext/sketch.hll_registers_grouped over to_date(ts) — the parity
    test asserts register-level equality. Downstream, trailing-window distinct
    estimates merge these rows with no history rescan
    (events_sliding_hll_users' shape)."""
    from ..ext.sketch import _hll_hash_and_rank

    m = 1 << p
    h, rank = _hll_hash_and_rank(value_col, p)
    return (
        events.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, "1 day").alias("w"),
            h.bitwiseAND(F.lit(m - 1)).cast("int").alias("reg"),
        )
        .agg(F.max(rank).cast("int").alias("max_rank"))
        .select(F.col("w.start").cast("date").alias("day"), "reg", "max_rank")
    )


def daily_kmv_sketches(
    events: DataFrame,
    k: int = 32,
    ts_col: str = "ts",
    value_col: str = "user_id",
) -> DataFrame:
    """Streaming KMV maintainer: per-day bottom-k distinct-hash sketches held as
    explicit state — the streaming twin of ``ext/sketch.kmv_bottom_k`` grouped
    by day, completing the mergeable-sketch/streaming symmetry the HLL
    maintainer above established.

    State per day is at most ``k`` longs plus a fold counter (bounded
    regardless of event volume), and each micro-batch folds in via the
    sketch's own merge operator — k smallest of (state ∪ batch hashes) — so
    the final state equals the batch sketch for ANY micro-batch partitioning
    of the input: incremental maintenance IS the merge theorem, live. Every
    update emits ``(day, n_seen, hashes)`` with ``n_seen`` monotone; a
    consumer (and the parity test) keeps the row with the max ``n_seen`` per
    day. MAX-register HLL gets to be a plain streaming aggregate; bottom-k
    needs a set, hence applyInPandasWithState with a flat array state."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..ext.sketch import kmv_hash

    out_schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("hashes", T.ArrayType(T.LongType())),
        ]
    )

    def fold(key, pdfs, state):
        hashes, n_seen = state.get if state.exists else ((), 0)
        cur = set(hashes)
        for pdf in pdfs:
            n_seen += len(pdf)
            cur.update(int(h) for h in pdf["h"])
        top = sorted(cur)[:k]
        state.update((top, n_seen))
        yield pd.DataFrame({"day": [key[0]], "n_seen": [n_seen], "hashes": [top]})

    hashed = events.where(F.col(value_col).isNotNull()).select(
        F.to_date(ts_col).alias("day"), kmv_hash(value_col).alias("h")
    )
    return hashed.groupBy("day").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="hashes array<long>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def daily_sample_quantiles(
    events: DataFrame,
    k: int = 64,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_id",
) -> DataFrame:
    """Streaming quantile-sketch maintainer: per-day bottom-k ROW samples
    ((hash, value) pairs, the streaming twin of ``ext/sketch.bottom_k_rows``
    grouped by day) held as bounded state — quantile estimates over an
    unbounded stream with <= k rows of state per day and no history rescan.

    Each micro-batch folds in via the sample's own merge operator — k smallest
    (hash, value) pairs of (state ∪ batch) — so the final state equals the
    batch sample for ANY micro-batch partitioning (the same merge-theorem-live
    property daily_kmv_sketches certifies for distinct counting; this carries a
    payload column, which is what turns the sketch from set-size into CDF).
    Every update emits ``(day, n_seen, p50, hashes, vals)``; consumers keep the
    max-``n_seen`` row per day. p50 is the ceil(k'/2)-th smallest sampled value
    — events_sampled_quantiles certifies the identical estimator relationally
    in batch.

    ``key_col`` must be a UNIQUE row key (bottom_k_rows' contract, ADVICE r8):
    state dedups on (hash, value) pairs, so two distinct rows sharing a key
    (or an at-least-once source replaying a key with a DIFFERENT value) would
    collapse here while the batch twin keeps both rows. With unique keys the
    set-dedup is exactly what makes same-row replays idempotent — the
    batch == stream equality the parity tests pin assumes it."""
    import math

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..ext.sketch import kmv_hash

    out_schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("p50", T.DoubleType()),
            T.StructField("hashes", T.ArrayType(T.LongType())),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
        ]
    )

    def fold(key, pdfs, state):
        hashes, vals, n_seen = state.get if state.exists else ((), (), 0)
        pairs = set(zip(hashes, vals))
        for pdf in pdfs:
            n_seen += len(pdf)
            pairs.update(zip((int(h) for h in pdf["h"]), (float(v) for v in pdf["v"])))
        top = sorted(pairs)[:k]
        hs, vs = [p[0] for p in top], [p[1] for p in top]
        state.update((hs, vs, n_seen))
        p50 = sorted(vs)[max(1, math.ceil(0.5 * len(vs))) - 1] if vs else None
        yield pd.DataFrame(
            {"day": [key[0]], "n_seen": [n_seen], "p50": [p50],
             "hashes": [hs], "vals": [vs]}
        )

    hashed = (
        events.where(F.col(value_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.to_date(ts_col).alias("day"),
            kmv_hash(key_col).alias("h"),
            F.col(value_col).cast("double").alias("v"),
        )
    )
    return hashed.groupBy("day").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType="hashes array<long>, vals array<double>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def daily_cms_counters(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "event_type",
    watermark: str = "1 day",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Streaming Count-Min maintainer: per-day CMS counter tables as a PLAIN
    watermarked streaming aggregate — no custom state at all, because the CMS
    merge operator IS elementwise SUM, which Spark's incremental aggregation
    already is. This completes the streaming-maintainer symmetry across the
    mergeable-sketch family: MAX-mergeable HLL (daily_hll_registers) and
    SUM-mergeable CMS ride the engine's own aggregates; set-shaped KMV and
    bottom-k samples need applyInPandasWithState (daily_kmv_sketches /
    daily_sample_quantiles). State per day is <= d*w counters regardless of
    event volume; batch twin: ext/sketch.cms_counters grouped by to_date(ts)."""
    from ..ext.sketch import _cms_positions

    pos = F.posexplode(_cms_positions(F.col(value_col), d, w))
    return (
        events.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), pos.alias("row", "pos"))
        .groupBy(
            F.window(ts_col, "1 day").alias("wnd"), F.col("row"), F.col("pos")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.col("wnd.start").cast("date").alias("day"), "row", "pos", "cnt")
    )


def daily_priority_samples(
    events: DataFrame,
    k: int = 32,
    ts_col: str = "ts",
    weight_col: str = "value",
    key_col: str = "event_id",
    salt: str = "prio",
) -> DataFrame:
    """Streaming priority-sample maintainer (r11): per-day DLT top-k
    (priority, id, weight) state — the weighted complement of
    ``daily_kmv_sketches`` (uniform distinct sample) and
    ``daily_sample_quantiles`` (uniform row sample): the persisted k rows
    answer any later per-day subset-SUM query via the max(w, tau) estimator
    (ext/sampling.priority_sample, Duffield-Lund-Thorup).

    Priority sampling is mergeable exactly like bottom-k: the top-k by
    priority of a union equals the top-k of the concatenated per-split top-k
    sets, so each micro-batch folds in via the sketch's own merge operator
    and the final state equals the batch sample for ANY micro-batch
    partitioning — kill-restart certified in tests/test_streaming.py. The
    weight is floor(weight_col * 100) + 1 (exact integer cents; NULLs
    excluded), the variate is the portable 30-bit md5 hash of ``key_col``
    (must be a UNIQUE row key — replays dedup on id, the
    daily_sample_quantiles contract). State per day is <= k (priority, id,
    weight) triples plus a fold counter. Emissions are the touched day's
    COMPLETE state, so the DailyStateOverwriteSink day-partitioned loop
    applies unchanged."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..ext.sampling import PRIORITY_U_BITS, split_key

    out_schema = T.StructType(
        [
            T.StructField("day", T.DateType()),
            T.StructField("n_seen", T.LongType()),
            T.StructField("tau", T.LongType()),
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("weights", T.ArrayType(T.LongType())),
            T.StructField("priorities", T.ArrayType(T.LongType())),
        ]
    )

    def fold(key, pdfs, state):
        # STATE HOLDS TOP-(k+1): the (k+1)-th element is the tau witness, and
        # it must survive folds — any global top-(k+1) element has <= k
        # elements above it at every fold, so it always ranks within the kept
        # k+1 (the same argument that makes the top-k sample itself mergeable;
        # keeping only k would silently drop the true threshold).
        ids, ws, qs, n_seen = state.get if state.exists else ((), (), (), 0)
        # state triples keyed by id (replay-idempotent)
        cur = {int(i): (int(q), int(w)) for i, w, q in zip(ids, ws, qs)}
        for pdf in pdfs:
            n_seen += len(pdf)
            for i, w, q in zip(pdf["id"], pdf["w"], pdf["q"]):
                cur[int(i)] = (int(q), int(w))
        ordered = sorted(cur.items(), key=lambda t: (-t[1][0], t[0]))[: k + 1]
        tau = ordered[k][1][0] if len(ordered) > k else 0
        state.update(
            (
                [i for i, _ in ordered],
                [w for _, (_, w) in ordered],
                [q for _, (q, _) in ordered],
                n_seen,
            )
        )
        top = ordered[:k]
        yield pd.DataFrame(
            {
                "day": [key[0]],
                "n_seen": [n_seen],
                "tau": [tau],
                "ids": [[i for i, _ in top]],
                "weights": [[w for _, (_, w) in top]],
                "priorities": [[q for _, (q, _) in top]],
            }
        )

    u = (
        F.pmod(
            F.conv(
                F.substring(split_key(F.col(key_col).cast("string"), salt), 1, 8),
                16,
                10,
            ).cast("long"),
            F.lit(1 << PRIORITY_U_BITS),
        )
        + 1
    )
    w = (F.floor(F.col(weight_col) * 100) + 1).cast("long")
    hashed = (
        events.where(
            F.col(weight_col).isNotNull() & F.col(key_col).isNotNull()
        )
        .select(
            F.to_date(ts_col).alias("day"),
            F.col(key_col).cast("long").alias("id"),
            w.alias("w"),
            u.alias("_u"),
        )
        # in-plan guard (ADVICE r11 #2): a negative weight would make Spark's
        # truncating `div` and the batch oracle's flooring `//` diverge — the
        # derivation must fail loudly, not drift silently
        .withColumn(
            "_guard",
            F.assert_true(
                F.col("w") >= 1,
                F.lit("daily_priority_samples: derived weight must be >= 1"),
            ),
        )
        .filter(F.col("_guard").isNull())
        .drop("_guard")
        .withColumn("q", F.expr(f"(w * {1 << PRIORITY_U_BITS}) div _u").cast("long"))
        .drop("_u")
    )
    return hashed.groupBy("day").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=(
            "ids array<long>, weights array<long>, priorities array<long>, "
            "n_seen long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
