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
and the per-id audit append to parquet; the audit carries the batch id for
lineage. Replay caveat: a crashed-and-replayed batch re-appends its output; at
production scale the append target is a transactional table (Delta/Iceberg) or
the IdempotentBatchSink pattern from streaming/foreach.py.

Scale: per batch, the corpus side costs one 8-byte-hash anti join plus one
shingle-index build over corpus + admitted-so-far. Production deployments
materialize those two corpus artifacts incrementally instead of rebuilding; the
per-batch rebuild here keeps the module self-contained and correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
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

    def _admitted_so_far() -> DataFrame | None:
        """Prior admissions, or None ONLY when the path genuinely does not exist
        yet (first batch). Any other read failure — permissions, corrupt files
        from a crashed batch, transient FS errors — must fail the batch: treating
        it as 'nothing admitted yet' would silently drop the growing-reference-set
        guarantee and re-admit cross-batch duplicates."""
        sc = spark.sparkContext
        hconf = sc._jsc.hadoopConfiguration()
        jpath = sc._jvm.org.apache.hadoop.fs.Path(admitted_path)
        if not jpath.getFileSystem(hconf).exists(jpath):
            return None
        return spark.read.parquet(admitted_path).select(*base_cols)

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        prior = _admitted_so_far()
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
        # append first and audit's plan re-listed the directory, audit would
        # observe this batch's own output (it happened to work only because
        # Spark's InMemoryFileIndex caches the pre-write listing). The cuts also
        # stop the stage-3 shingle pipeline being recomputed once per write.
        admitted = admitted.select(*base_cols).localCheckpoint()
        audit = audit.withColumn("batch_id", F.lit(batch_id)).localCheckpoint()
        admitted.write.mode("append").parquet(admitted_path)
        audit.write.mode("append").parquet(audit_path)

    writer = incoming_stream.writeStream.foreachBatch(admit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
