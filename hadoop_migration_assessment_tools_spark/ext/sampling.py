"""[EXT] Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB corpus is never split by `rand()`: re-runs must land every document in the
same split (reproducible train/val/test), and adding documents must not reshuffle
existing assignments. The standard trick is content-addressed bucketing — hash a
stable id, map the hash to [0,1), cut at the cumulative split weights. Everything
here is a narrow, shuffle-free `Column` expression (one md5 per row, no joins, no
window over the full corpus), so a split at scale is exactly a scan.

Stratified sampling (`stratified_sample`) takes a deterministic per-stratum top-k
by hash order — one shuffle on the stratum key, skew-bounded because k caps each
group's output. Hash order is uniform, so the sample is unbiased per stratum.

md5 is used (not xxhash64) deliberately: it is bit-identical across engines
(Spark, DuckDB, Python hashlib), which makes every operator here oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "split_key",
    "split_expr",
    "hash_split",
    "stratified_sample",
    "SPLIT_BOUNDS_HEX",
    "domain_rates",
    "temperature_sample",
    "MIX_HEX_DIGITS",
    "interleave_schedule",
    "pps_systematic_sample",
    "priority_sample",
    "PRIORITY_U_BITS",
]


def split_key(id_col: Column, salt: str = "") -> Column:
    """Stable per-row key in hex: md5(salt || id). Lowercase hex in every engine."""
    return F.md5(F.concat(F.lit(salt), id_col.cast("string")))


def _bounds_hex(weights: dict[str, float], digits: int = 4) -> list[tuple[str, str]]:
    """Cumulative weight boundaries as fixed-width hex strings; comparisons against
    the md5 prefix are lexicographic and engine-agnostic."""
    total = sum(weights.values())
    space = 16**digits
    out, cum = [], 0.0
    for name, w in weights.items():
        cum += w / total
        bound = format(min(space, int(round(cum * space))), f"0{digits}x")
        out.append((name, bound))
    return out


SPLIT_BOUNDS_HEX = _bounds_hex  # exported for oracle construction


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed-id bucket. Deterministic,
    re-run-stable, and append-stable (new ids never move old ones). Pure map."""
    return df.withColumn(out_col, split_expr(F.col(id_col), weights, salt))


def split_expr(
    id_col: Column, weights: dict[str, float] | None = None, salt: str = ""
) -> Column:
    """The split assignment as a bare Column — a pure function of the id, usable
    anywhere a join against hash_split output would be wasteful (e.g. deriving
    the split of BOTH ids of a pair without touching the corpus again)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    prefix = F.substring(split_key(id_col, salt), 1, 4)
    expr: Column | None = None
    for name, bound in _bounds_hex(weights):
        cond = prefix < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # md5 prefix == 'ffff' edge: fold into the last split
    last = list(weights)[-1]
    return expr.otherwise(F.lit(last))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum by
    (md5 key, id) and keep the first k. Unbiased (hash order is uniform),
    reproducible, and one bounded shuffle."""
    key = split_key(F.col(id_col), salt)
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_sk", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_sk", "_rn")
    )


# --- temperature-based domain mixture ----------------------------------------------
# Training mixtures up-weight small domains: sample domain d with probability
# proportional to n_d^alpha (alpha<1 flattens the natural distribution — the
# Pile / multilingual-LM temperature-sampling recipe). alpha is FIXED at 0.5 here:
# sqrt is IEEE-754 correctly rounded in every engine (pow is not), which keeps the
# per-domain rates — and therefore the exact sampled set — bit-reproducible across
# Spark, DuckDB, and any future backend. The per-domain weights are rounded to 6
# decimals and summed as exact decimals, so the normalizing constant is
# order-independent.
#
# Scale shape: one tiny groupBy(domain) count (#domains rows, map-side partials),
# a broadcast join of the rate table back onto the corpus, and a narrow md5-prefix
# filter — the corpus itself never shuffles.

MIX_HEX_DIGITS = 6
_MIX_SPACE = 16**MIX_HEX_DIGITS


def domain_rates(
    df: DataFrame, domain_col: str, target_total: float, id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain sampling rates for a sqrt-temperature mixture.

    rate_d = min(1, target_total * sqrt(n_d) / (sum_d sqrt(n_d) * n_d)); expected
    sample size ~= target_total (less where a domain saturates at rate 1).
    Returns (domain_col, n_docs, rate, rate_bound_hex).
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = F.round(F.sqrt(F.col("n_docs").cast("double")), 6).cast("decimal(18,6)")
    counts = counts.withColumn("_w", w)
    total_w = counts.agg(F.sum("_w").alias("_tw"))  # exact decimal: order-independent
    rate = F.least(
        F.lit(1.0),
        (F.col("_w").cast("double") * F.lit(float(target_total)))
        / (F.col("_tw").cast("double") * F.col("n_docs").cast("double")),
    )
    # Saturated domains (rate >= 1) use the sentinel 'g': every hex prefix sorts
    # below it, so the whole domain is kept. A numeric bound of 16^digits would
    # render as a digits+1-char string that sorts BELOW 'f...f' lexicographically
    # and silently drop the entire domain (caught by
    # test_temperature_sample_rate_capped_at_one).
    bound = F.when(F.round(rate, 6) >= 1.0, F.lit("g")).otherwise(
        F.format_string(
            f"%0{MIX_HEX_DIGITS}x",
            F.round(F.round(rate, 6) * F.lit(_MIX_SPACE), 0).cast("long"),
        )
    )
    return (
        counts.join(F.broadcast(total_w))
        .withColumn("rate", F.round(rate, 6))
        .withColumn("rate_bound_hex", bound)
        .drop("_w", "_tw")
    )


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    target_total: float,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic sqrt-temperature mixture sample: keep a row iff its md5 prefix
    falls under its domain's rate bound. Re-run-stable and append-stable, same
    contract as hash_split."""
    rates = domain_rates(df, domain_col, target_total, id_col)
    prefix = F.substring(split_key(F.col(id_col), salt), 1, MIX_HEX_DIGITS)
    return (
        df.join(F.broadcast(rates.select(domain_col, "rate_bound_hex")), domain_col)
        .filter(prefix < F.col("rate_bound_hex"))
        .drop("rate_bound_hex")
    )


def interleave_schedule(
    df: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    salt: str = "epoch0",
) -> DataFrame:
    """Deterministic epoch schedule: shuffle WITHIN each domain by md5 hash order,
    then round-robin across domains — position = intra_rank * n_domains +
    domain_index. The standard training-order construction: every domain's
    documents are spread evenly across the epoch (no domain-burst curriculum
    accidents), the order is reproducible, and changing the salt re-shuffles
    epochs independently.

    Scale shape: one partitioned window per domain (hash-ordered row_number —
    partition-parallel, never a global window) plus a broadcast of the tiny
    (domain -> index) table. Consumers sort by `position` lazily (range partition
    on write), so no global sort happens here."""
    domains = (
        df.select(domain_col).distinct().orderBy(domain_col)
        .withColumn("_didx", F.row_number().over(Window.orderBy(domain_col)) - 1)
        .localCheckpoint()  # tiny; one distinct scan feeds both the count and the join
    )
    n_domains = F.lit(domains.count())  # bounded: #domains
    w = Window.partitionBy(domain_col).orderBy(
        split_key(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(domains), domain_col)
        .withColumn("_rank", F.row_number().over(w) - 1)
        .withColumn("position", F.col("_rank") * n_domains + F.col("_didx"))
        .drop("_rank", "_didx")
    )


# --- weight-proportional systematic sampling (PPS) -----------------------------------
# Madow's systematic probability-proportional-to-size design: lay every row's
# weight end to end along [0, W) in a deterministic hash-random order, then take
# the k rows whose weight interval contains a multiple of W/k. Inclusion
# probability is exactly k*w/W for w <= W/k (larger rows are hit multiple times
# -> n_hits > 1, surfaced as a column), the sample size is exactly k, and the
# whole construction is INTEGER arithmetic — no ln/pow (their libm rounding
# differs across engines), so the sampled SET is bit-reproducible in any engine
# and certifiable against a SQL replay.
#
# Scale shape — the naive form needs a global running sum (a single-task window
# at 100 TB). This is the classic distributed two-phase prefix sum instead:
#   1. ONE range shuffle on the hash key (global order across partitions);
#   2. a NARROW per-partition running sum (mapInPandas, Arrow batches, carrying
#      the running total across batches — no second shuffle);
#   3. per-partition totals (#partitions rows) -> exclusive prefix offsets via
#      one tiny single-task window over #partitions rows — bounded, not data;
#   4. broadcast the offsets back; global cum = local cum + partition offset.
# The corpus is shuffled once and scanned twice (weights projection only).


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "pps",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic PPS systematic sample of ``k`` rows: returns
    (id_col, weight, cum_weight, n_hits) for every selected row.

    Weights must be positive integers (cast to long). Requires W * k < 2^63
    (asserted in-plan): at 100 TB with byte weights and k=1000 that is
    1e14 * 1e3 = 1e17 < 9.2e18 — headroom, but the guard fails loudly rather
    than wrap. ``num_partitions`` exists as a test seam to prove the result is
    partitioning-invariant."""
    spark = df.sparkSession
    parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(weight_col).cast("long").alias("_w"),
    ).withColumn("_k", split_key(F.col("_id"), salt))

    # phase 1+2: range-shuffle to global hash order, then a narrow in-partition
    # running sum (sortWithinPartitions is a local sort; mapInPandas carries the
    # running total across Arrow batches without any further exchange)
    ordered = base.repartitionByRange(parts, F.col("_k"), F.col("_id")).sortWithinPartitions(
        "_k", "_id"
    )

    def _local_cumsum(batches):
        import numpy as np
        import pandas as pd  # noqa: F401

        total = 0
        for pdf in batches:
            c = pdf["_w"].to_numpy(dtype="int64").cumsum() + total
            total = int(c[-1]) if len(c) else total
            pdf = pdf.assign(_cum_local=c)
            yield pdf

    local = ordered.mapInPandas(
        _local_cumsum, "_id long, _w long, _k string, _cum_local long"
    ).withColumn("_pid", F.spark_partition_id())

    # phase 3: exclusive prefix of the per-partition totals. #partitions rows —
    # the single-task window is over a BOUNDED tiny frame, never the data.
    totals = local.groupBy("_pid").agg(F.max("_cum_local").alias("_tot"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn("_off", F.coalesce(F.sum("_tot").over(off_w), F.lit(0)))

    # phase 4: broadcast offsets back; select rows whose interval covers a
    # multiple of W/k (counted exactly with integer floor division). The in-plan
    # assert_true turns a would-be 63-bit wraparound into a loud failure.
    w_total = totals.agg(F.sum("_tot").cast("long").alias("_wt"))
    k = int(k)
    hits = (
        F.expr(f"_cum * {k} div _wt") - F.expr(f"(_cum - _w) * {k} div _wt")
    ).cast("long")
    return (
        local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
        .join(F.broadcast(w_total))
        .withColumn("_cum", F.col("_cum_local") + F.col("_off"))
        .withColumn(
            "_guard",
            F.assert_true(
                (F.col("_wt") > 0) & (F.col("_wt") <= F.lit((1 << 62) // max(k, 1))),
                F.lit("pps_systematic_sample: W * k would overflow 63-bit range"),
            ),
        )
        .filter(F.col("_guard").isNull())  # keeps the assert in the live plan
        .withColumn("n_hits", hits)
        .filter(F.col("n_hits") > 0)
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("weight"),
            F.col("_cum").alias("cum_weight"),
            F.col("n_hits"),
        )
    )


PRIORITY_U_BITS = 30  # u in [1, 2^30]: keeps w * 2^30 exact in int64 for w < 2^33


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup, JACM 2007): ONE k-row weighted
    sample that answers ANY downstream subset-sum query over the weights with
    an unbiased estimator — the canonical '100 TB corpus, bounded sample,
    arbitrary later questions' primitive (e.g. estimate total tokens per
    source/language/quality-band from one stored sample).

    Mechanics, all exact integers so the DuckDB oracle replays them to the
    bit: u_i = (md5-hash of the id) % 2^30 + 1 plays the uniform variate;
    priority q_i = (w_i << 30) DIV u_i; the sample is the top-k rows by
    (q desc, id asc) and tau is the (k+1)-th priority (0 when n <= k). Each
    sampled row carries the estimator weight w_hat = max(w, tau): for any
    predicate P, sum of w_hat over sampled rows satisfying P estimates the
    true subset-sum (exactly when n <= k, since tau = 0). The deterministic
    hash freezes one draw of the randomness — re-runs and engines agree, and
    the certified output is the OBSERVED relative error per subset, not a
    probabilistic claim.

    Weights must be INTEGER-VALUED, >= 1 and < 2^33 (guarded in-plan; a
    fractional weight is rejected loudly rather than silently truncated —
    2.7 -> 2 would change the estimator with no signal).
    Plan shape: one narrow scan computes priorities; the top-(k+1) is
    TakeOrderedAndProject (map-side partial top-k — k+1 rows in motion, the
    corpus never shuffles); tau re-enters as a broadcast 1-row relation.

    Returns (id_col, weight, priority, tau, w_hat) — exactly min(k, n) rows.
    """
    key = split_key(F.col("_id").cast("string"), salt)
    u = (
        F.pmod(
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
            F.lit(1 << PRIORITY_U_BITS),
        )
        + 1
    )
    base = (
        df.where(F.col(id_col).isNotNull() & F.col(weight_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            # try_cast + the equality conjunct below: a fractional weight
            # (2.7 -> 2) would silently change the estimator if cast first
            # and guarded after (ADVICE r11 #2) — the guard now rejects any
            # weight that is not exactly its own long value (fractional,
            # overflowing, or unparseable all fail loudly in-plan)
            F.col(weight_col).try_cast("long").alias("_w"),
            F.col(weight_col).alias("_w_raw"),
        )
        .withColumn(
            "_guard",
            F.assert_true(
                F.col("_w").isNotNull()
                & (F.col("_w_raw").cast("double") == F.col("_w").cast("double"))
                & (F.col("_w") >= 1)
                & (F.col("_w") < F.lit(1 << 33)),
                F.lit(
                    "priority_sample: weights must be integer-valued in [1, 2^33)"
                ),
            ),
        )
        .filter(F.col("_guard").isNull())  # keeps the assert in the live plan
        .drop("_w_raw")
        .withColumn("_u", u)
        .withColumn(
            "_q", F.expr(f"(_w * {1 << PRIORITY_U_BITS}) div _u").cast("long")
        )
    )
    topk1 = base.orderBy(F.desc("_q"), F.asc("_id")).limit(k + 1)
    ranked = topk1.withColumn(
        "_rn", F.row_number().over(Window.orderBy(F.desc("_q"), F.asc("_id")))
    )
    tau = ranked.where(F.col("_rn") == k + 1).agg(
        F.coalesce(F.max("_q"), F.lit(0)).cast("long").alias("tau")
    )
    return (
        ranked.where(F.col("_rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            F.col("_id").alias(id_col),
            F.col("_w").alias("weight"),
            F.col("_q").alias("priority"),
            "tau",
            F.greatest(F.col("_w"), F.col("tau")).cast("long").alias("w_hat"),
        )
    )
