"""Structured Streaming smoke: incremental transcript ingestion drains
available files exactly once and feeds the assembly stage."""

from __future__ import annotations

import os

import pytest

from bionext_spark.operators.assemble import assemble_conversations
from bionext_spark.sources.fixtures import transcripts_df
from bionext_spark.streaming import run_incremental


def test_incremental_ingest(spark, transcripts_rows, tmp_path):
    in_dir = str(tmp_path / "in")
    transcripts_df(spark, transcripts_rows).repartition(4).write.parquet(in_dir)

    seen: list[int] = []
    out_dir = str(tmp_path / "out")

    def process(df, epoch):
        seen.append(df.count())
        assemble_conversations(df).write.mode("append").parquet(out_dir)

    run_incremental(spark, in_dir, str(tmp_path / "ckpt"), process)
    assert sum(seen) == len(transcripts_rows)
    assert os.path.exists(out_dir)
    # re-running with the same checkpoint ingests nothing new (exactly-once)
    before = sum(seen)
    run_incremental(spark, in_dir, str(tmp_path / "ckpt"), process)
    assert sum(seen) == before


def test_windowed_turn_counts_with_watermark(spark, transcripts_rows, tmp_path):
    """Watermarked tumbling windows: streaming totals equal the batch
    computation of the same windows once the availableNow drain finishes."""
    from pyspark.sql import functions as F

    from bionext_spark.sources.fixtures import transcripts_df
    from bionext_spark.streaming import stream_transcripts, windowed_turn_counts

    in_dir = str(tmp_path / "in_w")
    transcripts_df(spark, transcripts_rows).repartition(4).write.parquet(in_dir)
    q = (
        windowed_turn_counts(stream_transcripts(spark, in_dir))
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["role"]): (r["n_turns"])
        for r in spark.table("win_counts").collect()
    }
    exp_rows = (
        transcripts_df(spark, transcripts_rows)
        .groupBy(F.window("ts", "10 minutes").alias("win"), "role")
        .agg(F.count("*").alias("n_turns"))
        .collect()
    )
    exp = {(r["win"]["start"], r["role"]): r["n_turns"] for r in exp_rows}
    # append mode emits only watermark-closed windows; every emitted row
    # must match the batch value, and most windows close on drain
    assert got
    for k, v in got.items():
        assert exp[k] == v


def test_stateful_conversation_progress(spark, transcripts_rows, tmp_path):
    """applyInPandasWithState: running per-conversation turn counts; the
    final emitted count per conversation equals the batch turn count."""
    from collections import defaultdict

    from bionext_spark.sources.fixtures import transcripts_df
    from bionext_spark.streaming import stateful_conversation_progress, stream_transcripts

    in_dir = str(tmp_path / "in_s")
    transcripts_df(spark, transcripts_rows).repartition(4).write.parquet(in_dir)
    q = (
        stateful_conversation_progress(stream_transcripts(spark, in_dir))
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("conv_progress").collect()
    last: dict[str, int] = {}
    for r in rows:
        if not r["closed"]:
            last[r["conv_id"]] = max(last.get(r["conv_id"], 0), r["n_turns"])
    exp = defaultdict(int)
    for t in transcripts_rows:
        exp[t["conv_id"]] += 1
    assert last == dict(exp)


def test_watermark_drops_late_rows_across_drains(spark, tmp_path):
    """Late-data semantics: the watermark persisted in the streaming
    checkpoint carries across availableNow drains, so rows arriving a
    drain later but older than the watermark are dropped from the
    windowed aggregation (no 11:00 window ever materializes)."""
    import datetime as dt

    from bionext_spark import schemas
    from bionext_spark.streaming import stream_transcripts, windowed_turn_counts

    in_dir = str(tmp_path / "in_late")
    ck = str(tmp_path / "ckpt_late")

    def rows(ts_list):
        return [
            ("c1", i, "user", "hello", None, ts) for i, ts in enumerate(ts_list)
        ]

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    out_dir = str(tmp_path / "out_late")

    def drain(_name):
        # file sink: the only append sink that supports checkpoint recovery
        q = (
            windowed_turn_counts(stream_transcripts(spark, in_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []

    # drain 1: on-time rows 12:00-13:00 → watermark ≈ 12:55
    spark.createDataFrame(
        rows([base + dt.timedelta(minutes=m) for m in (0, 20, 40, 60)]),
        schemas.TRANSCRIPTS,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    drain("late_a")

    # drain 2: one LATE row at 11:00 (an hour behind the watermark) plus
    # an on-time row at 13:10 that advances the clock
    spark.createDataFrame(
        rows([base - dt.timedelta(minutes=60), base + dt.timedelta(minutes=70)]),
        schemas.TRANSCRIPTS,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    out = drain("late_b")

    eleven = base - dt.timedelta(minutes=60)
    assert all(r["window_start"] != eleven for r in out), out
    # the on-time windows that closed carry the correct on-time counts
    for r in out:
        assert r["n_turns"] >= 1 and r["window_start"] >= base


def test_conversation_progress_tws_matches_v1(spark, transcripts_rows, tmp_path):
    """transformWithStateInPandas (stateful API v2, RocksDB state store):
    drained per-conversation counts equal the batch truth — same contract
    as the applyInPandasWithState operator.

    Needs protobuf (the python<->JVM state-server protocol) — absent in
    this image, so the test gates on it like the Iceberg-jar test; the
    operator itself is import-clean without it."""
    pytest.importorskip("google.protobuf")
    from collections import defaultdict

    from bionext_spark.sources.fixtures import transcripts_df
    from bionext_spark.streaming import conversation_progress_tws, stream_transcripts

    in_dir = str(tmp_path / "in_tws")
    transcripts_df(spark, transcripts_rows).repartition(4).write.parquet(in_dir)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            conversation_progress_tws(stream_transcripts(spark, in_dir))
            .writeStream.format("memory")
            .queryName("conv_progress_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    rows = spark.table("conv_progress_tws").collect()
    last: dict[str, int] = {}
    for r in rows:
        last[r["conv_id"]] = max(last.get(r["conv_id"], 0), r["n_turns"])
    exp = defaultdict(int)
    for t in transcripts_rows:
        exp[t["conv_id"]] += 1
    assert last == dict(exp)
