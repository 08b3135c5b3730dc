"""Incremental (streaming) ingestion of transcript snapshots.

The reference is pure batch (SURVEY.md §2.8); the engine adds an optional
Structured Streaming path for incremental processing of newly-landed
transcript files: ``readStream`` over the transcripts directory with an
``availableNow`` trigger, assembling only the conversations touched by the
new batch via ``foreachBatch`` (every stage is stateless given its
broadcast lexicons, so per-batch recomputation of affected conversations
is exact).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from bionext_spark import schemas


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_incremental(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    process_batch: Callable[[DataFrame, int], None],
):
    """Drain all currently-available files through ``process_batch``
    (exactly-once via the streaming checkpoint + idempotent stage writes)."""
    q = (
        stream_transcripts(spark, input_dir)
        .writeStream.foreachBatch(lambda df, epoch: process_batch(df, epoch))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
