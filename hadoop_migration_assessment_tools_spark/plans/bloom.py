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
- m = 2^16 bits stored as 2048 32-bit words: word = pos >> 5,
  bits |= 1 << (pos & 31) via bit_or aggregation. Word values < 2^32 — no
  engine's checked BIGINT can overflow.
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

BLOOM_M_BITS = 1 << 16  # 65536 bits -> 2048 words of 32 bits
BLOOM_K = 3


def _md5_halves(col: Column) -> tuple[Column, Column]:
    """First/second 32 md5 bits of the (stringified) key as bigints — identical
    in Spark (conv hex parse) and DuckDB ('0x' cast); see ext/dedup.py."""
    digest = F.md5(col.cast("string"))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(digest, 9, 8), 16, 10).cast("long"),
    )


def bloom_position(col: Column, i: int) -> Column:
    """Bloom bit position i of a key: (h1 + i*h2) mod m (double hashing)."""
    h1, h2 = _md5_halves(col)
    return (h1 + F.lit(i) * h2) % F.lit(BLOOM_M_BITS)


def bloom_words(keys: DataFrame, col: str) -> DataFrame:
    """(word, bits) Bloom bitmap of the key set — at most m/32 = 2048 rows.

    One pass over the (already small) key side: explode the k positions,
    bit_or the per-word masks. Mergeable across key batches by bit_or, the
    same way HLL registers merge by MAX.
    """
    positions = F.array(*[bloom_position(F.col(col), i) for i in range(BLOOM_K)])
    return (
        keys.select(F.explode(positions).alias("pos"))
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
    """
    out = probe
    for i in range(BLOOM_K):
        # DataFrame alias, NOT column renames: renaming would change the
        # broadcast side's canonical plan and defeat ReusedExchange — the words
        # aggregation would then build (and shuffle) once per probe instead of
        # once total.
        w = words.alias(f"_bw{i}")
        pos = bloom_position(F.col(col), i)
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
    return out
