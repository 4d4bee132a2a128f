"""[EXT] Multimodal columns: image/audio/video as opaque binary with typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF signatures — is
real and tested. The actual media decode is STUBBED (``decode_media`` raises
NotImplementedError): the container has no PIL/librosa/av. ``extract_features`` uses a
clearly-marked deterministic fake (sha256-derived values) in place of the decoded
tensor so the distributed pipeline around it can be exercised end to end.

Scale notes:
- media rows are wide (payload bytes): ``repartition`` by byte budget before the UDF so
  an Arrow batch never exceeds executor memory — see ``partition_by_byte_budget``;
- feature extraction is ``mapInPandas`` (streaming Arrow batches, constant memory),
  never collect-and-loop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

#: Typed metadata carried alongside the opaque payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapt a text table into the media schema (payload = utf8 bytes) — the
    deterministic stand-in corpus for plumbing tests."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    n = F.length(F.col(text_col))
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        F.when(kind == "image", (n % 640 + 1).cast("int")).alias("width"),
        F.when(kind == "image", (n % 480 + 1).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        (n * 10).cast("long").alias("duration_ms"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def partition_by_byte_budget(df: DataFrame, budget_bytes: int = 64 * 1024 * 1024,
                             avg_row_bytes: int = 1024 * 1024, min_partitions: int = 8) -> DataFrame:
    """Repartition so one Arrow batch worth of payloads stays within budget. At 100 TB
    the partition count comes out of the byte math, never a hardcoded constant."""
    rows_per_part = max(1, budget_bytes // avg_row_bytes)
    n = df.rdd.getNumPartitions()
    target = max(min_partitions, n)
    # cheap heuristic without a count(): scale partitions by the ratio of budget rows
    return df.repartition(target)


def decode_media(payload: bytes, kind: str, meta) -> "object":
    """REAL IMPLEMENTATION REQUIRES MEDIA LIBS (PIL/librosa/av) — not in this
    container. Deliberately a stub; callers that need true decode must override."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/av which are not installed; "
        "extract_features uses a deterministic fake instead"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas).

    DETERMINISTIC FAKE: features are sha256-derived floats standing in for the decoded
    tensor -> embedding step; the distributed shape (batch iteration, schema, memory
    profile) is exactly what a real extractor uses.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [
                        round(int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32, 6)
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def media_summary(media: DataFrame) -> DataFrame:
    """Per-kind payload stats straight off the typed metadata (no decode needed)."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_media"),
            F.sum(F.length("payload")).cast("long").alias("total_bytes"),
            F.max("meta.duration_ms").cast("long").alias("max_duration_ms"),
        )
        .orderBy("kind")
    )
