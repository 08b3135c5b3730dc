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


def conversation_progress_tws(
    transcripts_stream: DataFrame,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """The same per-conversation progress operator on Spark 4's arbitrary
    stateful API v2 (``transformWithStateInPandas`` + ``StatefulProcessor``)
    — the engine's forward path for custom streaming state:

    * typed, named state variables (here one ValueState of ``n long``)
      instead of applyInPandasWithState's single struct blob;
    * per-state TTL (``state_ttl_ms``) — the state store itself evicts
      idle conversations, no processing-time timer loop needed, which is
      what actually bounds state at 10^12-turn scale AND stays compatible
      with availableNow drains (the PTT-based timeout in the v1 operator
      spins on empty batches there — see stateful_conversation_progress);
    * RocksDB-backed state with changelog checkpointing on a cluster.

    Output rows match stateful_conversation_progress's non-closed rows
    (drained-vs-batch equality tested)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Progress(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n_turns", "n long", state_ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            (conv_id,) = key
            n_new, lo, hi = 0, None, None
            for pdf in rows:
                n_new += len(pdf)
                if len(pdf):
                    mn, mx = int(pdf["turn_idx"].min()), int(pdf["turn_idx"].max())
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
            n = (self._n.get()[0] if self._n.exists() else 0) + n_new
            self._n.update((n,))
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n],
                    "first_turn_idx": [lo],
                    "last_turn_idx": [hi],
                    "closed": [False],
                }
            )

        def close(self) -> None:
            pass

    return transcripts_stream.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=Progress(),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Append",
        # state TTL requires a clock: Spark rejects TTL under
        # timeMode=None (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL)
        timeMode="ProcessingTime" if state_ttl_ms is not None else "None",
    )
