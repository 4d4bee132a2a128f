"""Pre-commit join strategy advisor — the sketches composed into a decision.

At 100 TB you cannot afford to DISCOVER a join's shape by running it: the
straggler task or the spilled shuffle shows up an hour in. The repo already
has the three bounded-pass measurement primitives; this module composes them
into the standard decision tree an engine's CBO walks, as ONE inspectable
relation:

- volume:  `ext/sketch.cms_inner_product` — Cormode-Muthukrishnan inner
  product of two d*w Count-Min counter tables; an upper bound on the inner
  equi-join's output cardinality (collisions only ever ADD mass).
- skew:    `ext/sketch._mg_summaries` via `plans/skew.diagnose_join_skew` —
  Misra-Gries heavy-hitter share of each side's key, with the exact row count
  folded into the same single scan.
- remedies: broadcast (plans rely on Spark's own BHJ), salting
  (`plans/skew.salted_join_left`), or a plain shuffle.

Each side pays two bounded single-COLUMN scans (one per sketch — both prune to
the key column, so the parquet reads are narrow); everything downstream
operates on sketch-sized artifacts. The output is data, not a side effect — a
100 TB pipeline materializes this row next to the job plan as an audit record
of WHY a strategy was chosen.

No reference citation: the reference has no join surface ([EXT] scope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["advise_join", "apply_join_advice", "strategy_expr"]


def strategy_expr(broadcast_row_limit: int, skew_share: float) -> Column:
    """The decision tree as a column expression over (left_rows, right_rows,
    left_top_share, right_top_share) — shared by the MG-based production
    advisor below and the exact-share certified twin (events_join_advice),
    so both walk literally the same branches."""
    return (
        F.when(
            (F.col("right_rows") <= broadcast_row_limit)
            & (F.col("right_rows") <= F.col("left_rows")),
            F.lit("broadcast_right"),
        )
        .when(F.col("left_rows") <= broadcast_row_limit, F.lit("broadcast_left"))
        .when(
            (F.col("left_top_share") > skew_share)
            & (F.col("left_top_share") >= F.col("right_top_share")),
            F.lit("salt_left_key"),
        )
        .when(F.col("right_top_share") > skew_share, F.lit("salt_right_key"))
        .otherwise(F.lit("shuffle_ok"))
    )


def advise_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    broadcast_row_limit: int = 10_000_000,
    skew_share: float = 0.2,
    cms_w: int = 8192,
) -> DataFrame:
    """One-row decision relation for ``left JOIN right ON key``:

    (left_rows, right_rows, est_join_size, left_top_share, right_top_share,
    strategy) where strategy is the first match of the standard tree:

    - ``broadcast_right`` / ``broadcast_left`` — a side fits the row limit;
      shuffle avoided entirely (ties broadcast the smaller side).
    - ``salt_left_key`` / ``salt_right_key`` — one key holds > ``skew_share``
      of a side's rows; AQE's skew join MAY split it at runtime, pre-salting
      (plans/skew.py) is the guaranteed fix. The hotter side salts.
    - ``shuffle_ok`` — no broadcast candidate, no pathological key.

    ``est_join_size`` rides along regardless of branch — it is the number that
    decides whether the DOWNSTREAM of the join is viable at all (a join that
    explodes 100x is a modeling bug, not a strategy problem).

    Estimate direction near the thresholds (ADVICE r9): row counts are EXACT
    (the MG scan folds the count in via a sentinel row; NULL keys are excluded
    on both the stat and join sides, so they cannot shift a branch), but the
    Misra-Gries top-share UNDERCOUNTS — ``est >= true - total/cap`` with
    cap=64, i.e. by at most ~1.6% of rows. So skew can be MISSED when the true
    share sits within total/cap above ``skew_share`` (the decision degrades to
    ``shuffle_ok`` — a performance miss, never a correctness one) but can
    never be INVENTED. Callers pinning a branch in tests should keep the
    planted share at least ~2 x total/cap away from ``skew_share``."""
    from ..ext.sketch import _mg_summaries, cms_counters, cms_inner_product

    def side_stats(df: DataFrame, tag: str) -> DataFrame:
        keyed = df.select(F.col(key).cast("string").alias("k")).where(
            F.col("k").isNotNull()
        )
        hh = (
            _mg_summaries(keyed, "k", cap=64)
            .orderBy(F.desc("est_count"), F.asc("item"))
            .limit(1)
            .select(
                F.col("total_rows").alias(f"{tag}_rows"),
                F.round(
                    F.col("est_count") / F.greatest(F.col("total_rows"), F.lit(1)), 6
                ).alias(f"{tag}_top_share"),
            )
        )
        # an EMPTY side still yields a row (rows 0, share 0) so the decision
        # tree sees numbers, not NULL-propagated branches: 0 rows -> broadcast
        return hh.unionByName(
            keyed.sparkSession.createDataFrame(
                [(0, 0.0)], f"{tag}_rows long, {tag}_top_share double"
            )
        ).orderBy(F.desc(f"{tag}_rows")).limit(1)

    lk = left.select(F.col(key).cast("string").alias("k")).where(F.col("k").isNotNull())
    rk = right.select(F.col(key).cast("string").alias("k")).where(F.col("k").isNotNull())
    est = cms_inner_product(
        cms_counters(lk, "k", w=cms_w), cms_counters(rk, "k", w=cms_w)
    )
    row = (
        side_stats(left, "left")
        .crossJoin(side_stats(right, "right"))
        .crossJoin(est)
    )
    strategy = strategy_expr(broadcast_row_limit, skew_share)
    return row.select(
        "left_rows",
        "right_rows",
        "est_join_size",
        "left_top_share",
        "right_top_share",
        strategy.alias("strategy"),
    )


def apply_join_advice(
    left: DataFrame,
    right: DataFrame,
    key: str,
    broadcast_row_limit: int = 10_000_000,
    skew_share: float = 0.2,
    cms_w: int = 8192,
    salt_buckets: int = 16,
) -> tuple[str, DataFrame]:
    """Walk the SAME decision tree as ``advise_join`` and EXECUTE the chosen
    plan (VERDICT r9 #3 — the advisor actuated). Returns ``(strategy, df)``
    where ``df`` is the INNER equi-join of ``left`` and ``right`` on ``key``
    with columns ordered ``key, left-minus-key, right-minus-key`` — the same
    rows under every branch (certified branch-by-branch in
    tests/test_plans.py::test_apply_join_advice_*):

    - ``broadcast_right`` / ``broadcast_left`` — ``F.broadcast`` hint on the
      fitting side; the big side never shuffles.
    - ``salt_left_key`` / ``salt_right_key`` — ``plans/skew.salted_join_left``
      with the HOT side salted and the other side replicated across
      ``salt_buckets`` (the guaranteed fix where AQE's runtime skew split is
      only an option).
    - ``shuffle_ok`` — plain shuffled equi-join.

    The one-row advice is a bounded driver materialization (the
    plans/median.py class: one row, collected once, re-entering only as the
    branch choice). Inner joins only — the salted rewrite replicates the
    non-salted side, so outer-join unmatched rows would be emitted once per
    replica (the ADVICE r9 interval-join caveat; same restriction there).
    Cost: two bounded single-COLUMN scans per side for the sketches — at
    100 TB that is the insurance premium against discovering a spilled
    shuffle or a straggler task an hour into the real join."""
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; "
            "alias them apart before the join"
        )
    from .skew import salted_join_left

    advice = advise_join(
        left, right, key, broadcast_row_limit, skew_share, cms_w
    ).collect()[0]
    strategy = advice["strategy"]
    if strategy == "broadcast_right":
        out = left.join(F.broadcast(right), key, "inner")
    elif strategy == "broadcast_left":
        out = F.broadcast(left).join(right, key, "inner")
    elif strategy == "salt_left_key":
        out = salted_join_left(left, right, key, salt_buckets, "inner")
    elif strategy == "salt_right_key":
        out = salted_join_left(right, left, key, salt_buckets, "inner")
    else:
        out = left.join(right, key, "inner")
    cols = (
        [key]
        + [c for c in left.columns if c != key]
        + [c for c in right.columns if c != key]
    )
    return strategy, out.select(*cols)
