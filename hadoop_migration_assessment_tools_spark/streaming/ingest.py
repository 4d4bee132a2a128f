"""[EXT] Streaming corpus ingestion: sequential admission over micro-batches.

The streaming form of ext/ingest.py with the semantics a live corpus needs:
each micro-batch is admitted against the STATIC corpus PLUS everything already
admitted by earlier batches — so a document admitted at batch 3 rejects its
re-arrival at batch 7 (exact or near-dup), which the one-shot batch API cannot
express. This "growing reference set" is the defining property of streaming
ingestion; batch-by-batch independence would silently re-admit dups.

Implementation: ``foreachBatch`` (the admission pipeline needs joins/groupBys and
localCheckpoints that are not stream-legal as a continuous plan — the standard
pattern for batch-only operators, same as streaming/packing.py). Admitted rows
and the per-id audit are written to ``<path>/batch_id=<n>`` with OVERWRITE (the
IdempotentBatchSink discipline, streaming/foreach.py): a crashed-and-replayed
batch rewrites exactly its own location, so recovery from the checkpoint is
exactly-once across restarts (pinned by the kill-restart test in
tests/test_streaming.py). batch_id surfaces as a partition column on read-back.

Scale: per batch, the corpus side costs one 8-byte-hash anti join plus one
shingle-index build over corpus + admitted-so-far. Production deployments
materialize those two corpus artifacts incrementally instead of rebuilding; the
per-batch rebuild here keeps the module self-contained and correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..ext.ingest import incremental_ingest

__all__ = ["ingest_stream"]


def ingest_stream(
    corpus: DataFrame,
    incoming_stream: DataFrame,
    admitted_path: str,
    audit_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.7,
    shingle_k: int = 4,
    available_now: bool = True,
) -> StreamingQuery:
    """Admit a document stream batch-by-batch against corpus + prior admissions."""
    spark = corpus.sparkSession
    base_cols = [id_col, text_col]

    def _admitted_before(batch_id: int) -> DataFrame | None:
        """Admissions from batches STRICTLY before ``batch_id``, or None when the
        path does not exist yet (first batch). Two correctness properties:

        - The ``batch_id < current`` filter (a partition-pruned scan) excludes the
          current batch's own possibly-partially-committed output: a batch that
          crashed AFTER its admitted write but BEFORE the checkpoint commit is
          replayed, and without the bound it would see its own first attempt in
          the reference set and reject its rows as duplicates of themselves
          (caught by the kill-restart test — admitted ids actually flipped).
        - Any read failure other than path-not-found (permissions, corrupt files,
          transient FS errors) must FAIL the batch: treating it as 'nothing
          admitted yet' would silently drop the growing-reference-set guarantee
          and re-admit cross-batch duplicates."""
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        jpath = sc._jvm.org.apache.hadoop.fs.Path(admitted_path)
        if not jpath.getFileSystem(hconf).exists(jpath):
            return None
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(admitted_path)
            .filter(F.col("batch_id") < batch_id)
            .select(*base_cols)
        )

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        prior = _admitted_before(batch_id)
        reference = corpus.select(*base_cols)
        if prior is not None:
            reference = reference.unionByName(prior)
        admitted, audit = incremental_ingest(
            reference,
            batch_df.select(*base_cols),
            text_col=text_col,
            id_col=id_col,
            jaccard_threshold=jaccard_threshold,
            shingle_k=shingle_k,
        )
        # Materialize BOTH results before EITHER write: audit's lazy plan scans
        # `reference`, which includes admitted_path — if admitted committed its
        # write first and audit's plan re-listed the directory, audit would
        # observe this batch's own output (it happened to work only because
        # Spark's InMemoryFileIndex caches the pre-write listing). The cuts also
        # stop the stage-3 shingle pipeline being recomputed once per write.
        admitted = admitted.select(*base_cols).localCheckpoint()
        audit = audit.localCheckpoint()
        admitted.write.mode("overwrite").parquet(f"{admitted_path}/batch_id={batch_id}")
        audit.write.mode("overwrite").parquet(f"{audit_path}/batch_id={batch_id}")

    writer = incoming_stream.writeStream.foreachBatch(admit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
