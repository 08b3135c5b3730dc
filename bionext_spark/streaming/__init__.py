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


def windowed_turn_counts(
    transcripts_stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the turn stream:
    turns + distinct-ish conversation activity per (window, role), with
    late rows beyond ``watermark_delay`` dropped by the engine's state
    eviction — the standard late-data pattern for transcript ingestion at
    cluster scale (state is bounded by active windows, not stream
    history)."""
    from pyspark.sql import functions as F

    return (
        transcripts_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_conversations"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "n_conversations",
        )
    )


SESSION_STATE_SCHEMA = "conv_id string, n_turns long, last_ts timestamp"
SESSION_OUT_SCHEMA = (
    "conv_id string, n_turns long, first_turn_idx int, last_turn_idx int, closed boolean"
)


def stateful_conversation_progress(
    transcripts_stream: DataFrame,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-conversation
    running turn counts with optional idle-timeout session closure — the
    streaming analog of ``entry_queries.sessionize``. State per key is
    O(1) (count + last timestamp), so executor state stores stay bounded
    at 10^12-turn scale; a timed-out conversation emits a final ``closed``
    row and clears its state.

    ``idle_timeout_ms`` only makes sense for CONTINUOUS deployments: with
    an availableNow drain, processing-time timeouts keep the query
    triggering empty batches after the data is exhausted (measured: the
    drain never terminates), so the default is NoTimeout."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n, _last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n],
                    "first_turn_idx": [None],
                    "last_turn_idx": [None],
                    "closed": [True],
                }
            )
            return
        n_new = 0
        lo, hi = None, None
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                mn, mx = int(pdf["turn_idx"].min()), int(pdf["turn_idx"].max())
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
        n = (state.get[0] if state.exists else 0) + n_new
        state.update((n, None))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n],
                "first_turn_idx": [lo],
                "last_turn_idx": [hi],
                "closed": [False],
            }
        )

    return transcripts_stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType="n_turns long, last_ts timestamp",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
