"""Physical-plan strategy: Bloom-filter semi-join reduction (join pruning).

The classic 100 TB move when a huge fact table joins a selective dimension key
set: instead of shuffling the fact table into the join, broadcast a Bloom
filter of the key set and drop non-members DURING THE SCAN — the surviving
sliver (true matches + a tunable false-positive tail) is what reaches the
exact join. Spark's own runtime bloom pushdown
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this opportunistically
with engine-internal hashes; this operator is the EXPLICIT, engine-portable
form, built so an external SQL engine replays the exact bitmap and therefore
the exact admitted set, false positives included — which is what lets the
whole reduction be certified by one oracle hash instead of trusted.

Construction (all exact integer arithmetic, ANSI-safe):
- k = 3 positions per key by Kirsch-Mitzenmacher double hashing
  pos_i = (h1 + i*h2) mod m, where h1/h2 are the first/second 32 md5-hex bits
  of the key (the repo-wide portable hash idiom — ext/dedup.py
  portable_token_hash_halves). Intermediates stay < 2^34.
- m = 2^19 bits stored as 16384 32-bit words: word = pos >> 5,
  bits |= 1 << (pos & 31) via bit_or aggregation. Word values < 2^32 — no
  engine's checked BIGINT can overflow. (r7: m raised 2^16 -> 2^19 — at sf0.1
  the ~30k-key build filled 75% of a 64 Kbit array, a 41% false-positive rate
  that made the "reduction" admit 1.6x the true matches. ~17 bits/key keeps
  the demonstrated FP rate ~0.4%, and 16k words is still a trivial broadcast.)
- Membership = for each of the k positions, an equi-join against the word
  relation plus a bit test. The word relation is at most 2048 rows — always a
  broadcast; Catalyst reuses one BroadcastExchange for all k probes
  (ReusedExchange), so the probe side is scanned ONCE with k map-side lookups
  and ZERO shuffles before the final exact join. A key absent from the filter
  simply finds no word row (inner join) — absent word == all-zero bits.

False-positive rate is the standard (1 - e^{-kn/m})^k; the certifying query
reports it as an output (n_false_positive) next to the exact-join control.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

BLOOM_M_BITS = 1 << 19  # 524288 bits -> 16384 words of 32 bits
BLOOM_K = 3


def _md5_halves(col: Column) -> tuple[Column, Column]:
    """First/second 32 md5 bits of the (stringified) key as bigints — identical
    in Spark (conv hex parse) and DuckDB ('0x' cast); see ext/dedup.py.

    Wrapped in coalesce(..., 0) to make the halves NON-NULLABLE: the Bloom
    membership joins are inner equi-joins, so Catalyst infers isnotnull() on
    every join key and pushes those filters below the projection — SUBSTITUTING
    the md5+conv expression into each, which made the probe scan evaluate md5
    ~8x per row (measured: the whole 3-probe chain cost ~4x the single-md5
    scan at sf0.1). Non-nullable keys generate no isnotnull constraints, so the
    hash is computed exactly once per row. Callers drop NULL keys explicitly
    first (a NULL key can never pass a Bloom filter), so the coalesce sentinel
    is unreachable — it exists only to change the declared nullability."""
    digest = F.md5(col.cast("string"))
    return (
        F.coalesce(F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"), F.lit(0)),
        F.coalesce(F.conv(F.substring(digest, 9, 8), 16, 10).cast("long"), F.lit(0)),
    )


def bloom_position(col: Column, i: int) -> Column:
    """Bloom bit position i of a key: (h1 + i*h2) mod m (double hashing)."""
    h1, h2 = _md5_halves(col)
    # coalesce: Spark's % is always nullable (x % 0 -> null) even with a
    # non-zero literal divisor, and a nullable join key re-triggers the
    # isnotnull-constraint inlining documented in _md5_halves
    return F.coalesce((h1 + F.lit(i) * h2) % F.lit(BLOOM_M_BITS), F.lit(0))


def bloom_words(keys: DataFrame, col: str) -> DataFrame:
    """(word, bits) Bloom bitmap of the key set — at most m/32 = 2048 rows.

    One pass over the (already small) key side: explode the k positions,
    bit_or the per-word masks. Mergeable across key batches by bit_or, the
    same way HLL registers merge by MAX.
    """
    h1, h2 = _md5_halves(F.col(col))
    hashed = keys.where(F.col(col).isNotNull()).select(
        h1.alias("_h1"), h2.alias("_h2")
    )
    positions = F.array(
        *[
            F.coalesce(
                (F.col("_h1") + F.lit(i) * F.col("_h2")) % F.lit(BLOOM_M_BITS),
                F.lit(0),
            )
            for i in range(BLOOM_K)
        ]
    )
    return (
        hashed.select(F.explode(positions).alias("pos"))
        .select(
            F.shiftright(F.col("pos"), 5).cast("int").alias("word"),
            (F.col("pos") % 32).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
            .cast("long")
            .alias("bits")
        )
    )


def bloom_prefilter(probe: DataFrame, col: str, words: DataFrame) -> DataFrame:
    """Keep probe rows whose key passes the Bloom filter (all k bits set).

    k broadcast equi-joins on the word index plus a bit test each; the probe
    relation never shuffles. Guarantees no false negatives (every true key
    passes); false positives are bounded by the standard Bloom rate and are
    eliminated by the exact join that follows in any correct pipeline.

    The md5 halves are projected ONCE before the probe chain (r7): deriving
    each position from the key column directly would re-evaluate md5+conv per
    probe (2k evaluations per row — separate joins, so no cross-projection
    subexpression elimination), exactly the cost the oracle's one-shot ph CTE
    avoids.
    """
    h1, h2 = _md5_halves(F.col(col))
    out = (
        probe.where(F.col(col).isNotNull())
        .withColumn("_bh1", h1)
        .withColumn("_bh2", h2)
    )
    for i in range(BLOOM_K):
        # DataFrame alias, NOT column renames: renaming would change the
        # broadcast side's canonical plan and defeat ReusedExchange — the words
        # aggregation would then build (and shuffle) once per probe instead of
        # once total.
        w = words.alias(f"_bw{i}")
        pos = F.coalesce(
            (F.col("_bh1") + F.lit(i) * F.col("_bh2")) % F.lit(BLOOM_M_BITS),
            F.lit(0),
        )
        out = (
            out.withColumn(f"_bp{i}", pos)
            .join(
                F.broadcast(w),
                F.shiftright(F.col(f"_bp{i}"), 5).cast("int")
                == F.col(f"_bw{i}.word"),
            )
            .filter(
                F.expr(f"(shiftright(_bw{i}.bits, CAST(_bp{i} % 32 AS INT)) & 1) = 1")
            )
            .drop(F.col(f"_bw{i}.word"))
            .drop(F.col(f"_bw{i}.bits"))
            .drop(f"_bp{i}")
        )
    return out.drop("_bh1", "_bh2")
