"""Storage hygiene for iterative localCheckpoint chains.

``Dataset.localCheckpoint`` persists an INTERNAL RDD (the Dataset's physical
rows), not the Dataset itself, so ``DataFrame.unpersist()`` cannot release it —
the blocks stay in executor storage until the session dies. Harmless for a
one-shot checkpoint; a leak for iterative algorithms (BPE training, connected
components) that checkpoint every round: N rounds accumulate N copies of the
working table. This helper reaches the checkpointed RDD through the plan's
``LogicalRDD`` node and unpersists it explicitly.

Best-effort by design: the py4j path depends on the logical plan being exactly a
LogicalRDD (true for any DataFrame returned by ``localCheckpoint()``); if a
Spark upgrade changes the plan shape we degrade to the old keep-until-session-end
behavior rather than failing the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["free_local_checkpoint"]


def free_local_checkpoint(df: DataFrame) -> bool:
    """Release the block-manager storage behind a localCheckpoint'ed DataFrame.

    Call only once no downstream plan will read ``df`` again. Returns True if
    the underlying RDD was found and unpersisted (non-blocking), False if the
    plan shape did not expose it (storage then lives until session end)."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
        return True
    except Exception:
        return False
