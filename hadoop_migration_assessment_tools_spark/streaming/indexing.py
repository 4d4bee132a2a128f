"""Incremental inverted-index ingest — the streaming producer for the BM25
retrieval stack (ext/retrieval.py).

[EXT] — the production search-index shape: documents arrive as a stream, each
micro-batch is tokenized ONCE and its posting slice appended to a
batch-id-addressed index tree; scoring later reads the materialized index
(bm25_topk_from_index), never the raw text. Because a document's tokens live
wholly inside its arrival batch, per-batch tokenize+count is EXACT — no
cross-batch state is needed, so the maintainer is a stateless foreachBatch and
replay idempotence comes from the batch-id-addressed overwrite (STR3's
exactly-once-by-idempotence discipline, streaming/foreach.py).

100 TB shape: ingest cost per trigger is the batch's own tokens (one narrow
map + one map-side-combined groupBy); the index tree grows append-only and
scoring prunes it with a broadcast query-term semi join — a full-corpus
re-tokenize never happens again after ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..ext.retrieval import build_bm25_index


class BM25IndexIngestSink:
    """foreachBatch target: tokenize the micro-batch's documents into the
    build_bm25_index layout (doc_id, dl, term, tf — with the empty-doc
    sentinel row) and write it to ``<base>/batch_id=<n>`` with overwrite.
    A replayed batch (checkpoint recovery) holds the same files, tokenizes to
    the same rows, and rewrites the same location — duplicates impossible.
    Read the whole index back with ``spark.read.parquet(base)``."""

    def __init__(self, base_dir: str, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.base_dir = base_dir
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            build_bm25_index(batch_df, text_col=self.text_col, id_col=self.id_col)
            .write.mode("overwrite")
            .parquet(f"{self.base_dir}/batch_id={batch_id}")
        )

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()


class HierIVFIndexIngestSink:
    """Streaming ANN index maintenance — the BM25IndexIngestSink discipline
    applied to vectors (r13): each micro-batch's vectors are routed through
    the TWO-LEVEL assigner (ext/similarity.assign_centroids_hier_quantized,
    exact-integer coarse->fine argmins against FIXED pre-trained centroids)
    and written as (id, vector, centroid_id) to ``<base>/batch_id=<n>`` with
    overwrite. Assignment is per-row deterministic and stateless, so a
    replayed batch rewrites identical content — duplicates impossible (STR3
    exactly-once-by-idempotence). Queries later probe the MATERIALIZED
    cell-assigned index (broadcast probe lists joined on centroid_id) and
    never touch raw unrouted vectors again.

    100 TB shape: ingest cost per trigger is the batch's own rows through one
    Arrow kernel (n_coarse + n_fine distances per row — the hierarchical
    assignment cut); the index tree grows append-only, partitioned by arrival
    batch, and a probe prunes it to nprobe_fine cells per query."""

    def __init__(
        self,
        base_dir: str,
        coarse_int,
        fine_int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        import numpy as np

        self.base_dir = base_dir
        self.coarse = np.asarray(coarse_int, dtype="int64")
        self.fine = np.asarray(fine_int, dtype="int64")
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..ext.similarity import assign_centroids_hier_quantized

        (
            assign_centroids_hier_quantized(
                batch_df.select(self.id_col, self.vec_col),
                self.coarse,
                self.fine,
                self.vec_col,
            )
            .write.mode("overwrite")
            .parquet(f"{self.base_dir}/batch_id={batch_id}")
        )

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        writer = stream_df.writeStream.foreachBatch(self).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
