"""[EXT] Sequence packing: bin docs into fixed token budgets for training batches.

Training pipelines pack variable-length documents into fixed context windows to avoid
padding waste. Exact global bin packing is NP-hard and inherently serial; the
distributed shape is partition-local first-fit-decreasing (FFD): hash-partition the
docs, pack greedily within each partition, and make bin ids globally unique by
offsetting with the partition id. Waste stays within a few percent of global FFD
because every partition sees the same length distribution at corpus scale, while the
work is embarrassingly parallel — no shuffle beyond the one hash repartition.

Python-side packing runs in ``applyInPandas`` (Arrow-batched); the per-row work is a
few comparisons, so the boundary cost, not the algorithm, dominates — exactly the
trade documented for pandas-UDF paths in SCALE.md.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

_PART = "__pack_part"

#: bins-per-partition headroom for globally unique ids (partition p owns ids
#: [p * _BIN_STRIDE, (p+1) * _BIN_STRIDE)); 10**12 bins per partition is unreachable.
_BIN_STRIDE = 10**12


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    num_partitions: int = 32,
    partition_expr: Column | None = None,
) -> DataFrame:
    """Assign each doc to a bin such that per-bin token sums stay within ``budget``.

    Docs longer than the budget get a dedicated overflow bin (flagged
    ``overflow=true``) — the caller decides whether to chunk them first
    (``ext.text.chunk_documents``) or drop them.

    Deterministic: partition by ``hash(id) % num_partitions``, pack in
    (tokens desc, id asc) order — replays produce identical assignments.

    ``partition_expr`` overrides the group key (must produce ints in
    [0, num_partitions)): the default xxhash64 balances adversarial id
    distributions, but is engine-internal; a certifying query passes a PORTABLE
    key (e.g. ``pmod(id, n)``) so an external SQL engine can replay the exact
    per-group FFD fold (docs_pack_sequences' oracle does, via recursive CTE).

    Returns (id_col, n_tokens, bin_id, overflow).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    out_schema = f"{id_col} long, n_tokens long, bin_id long, overflow boolean"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf[_PART].iloc[0])
        # reset_index: the frame below is built from a mix of ordered columns and
        # fresh lists — pandas aligns Series by index, so the sorted index must be
        # dropped or rows silently re-scramble to pre-sort order
        ordered = pdf.sort_values(
            ["_n", id_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        base = part * _BIN_STRIDE
        bins: list[int] = []  # remaining capacity per open bin
        out_bin, out_over = [], []
        for n in ordered["_n"]:
            n = int(n)
            if n > budget:
                out_bin.append(base + len(bins))
                out_over.append(True)
                bins.append(0)  # dedicated, already full
                continue
            for i, rem in enumerate(bins):
                if rem >= n:
                    bins[i] = rem - n
                    out_bin.append(base + i)
                    break
            else:
                out_bin.append(base + len(bins))
                bins.append(budget - n)
            out_over.append(False)
        return pd.DataFrame(
            {
                id_col: ordered[id_col].astype("int64"),
                "n_tokens": ordered["_n"].astype("int64"),
                "bin_id": pd.Series(out_bin, dtype="int64"),
                "overflow": pd.Series(out_over, dtype="bool"),
            }
        )

    part_key = (
        partition_expr
        if partition_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_partitions))
    )
    prepped = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("_n"),
        part_key.cast("int").alias(_PART),
    )
    return prepped.groupBy(_PART).applyInPandas(pack, schema=out_schema)
