"""Structured Streaming smoke: incremental transcript ingestion drains
available files exactly once and feeds the assembly stage."""

from __future__ import annotations

import os

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
