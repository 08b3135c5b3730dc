"""Flagship query: full KG pipeline over transcripts derived from the
driver's events table, ending in top co-mentioned entity pairs.

``derive_transcripts`` maps events deterministically into the
input_hint transcript shape (conv = user, turn order = (ts, event_id),
turn text templated from event_type with planted lexicon mentions), so
the whole tagger→linker→extractor engine runs on driver-provided data
with zero randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bionext_spark import synth
from bionext_spark.adapters import StubEncoder, StubLexiconTagger
from bionext_spark.config import DEFAULT_CONFIG
from bionext_spark.operators.assemble import assemble_conversations
from bionext_spark.operators.extraction import (
    aggregate_triples,
    classify_pair_spans,
    estimate_pair_weights,
)
from bionext_spark.operators.linking import run_cleaner, run_linker
from bionext_spark.operators.pairs import generate_pairs, pair_spans
from bionext_spark.operators.tagging import run_tagger
from bionext_spark.sources import fixtures

_TURN_TEXT = {
    "click": "the patient took aspirin for diabetes today",
    "view": "human tp53 expression was studied in hela cells",
    "purchase": "mouse brca1 carried the rs12345 variant",
    "error": "caffeine worsened migraine in zebrafish",
    "signup": "salt and nacl combo drug helped neuropathy",
}


def derive_transcripts(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """events → transcripts. ``replicate`` clones the event stream into k
    disjoint user universes (deterministic) — used by the scaling bench to
    make compute dominate the fixed per-job planning cost."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    if replicate > 1:
        # scan parallelism = file count; a single small parquet file would
        # make the replicate expansion + the window's shuffle WRITE side
        # run in ONE task (measured: a 7s single-task job at replicate 96
        # — the map side of the first shuffle was serial). Spread the base
        # rows first; the shuffle is tiny (pre-expansion).
        e = e.repartition(spark.sparkContext.defaultParallelism)
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        e = e.crossJoin(F.broadcast(reps)).withColumn(
            "user_id", F.col("user_id") + F.col("rep") * 10_000_000
        ).drop("rep")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    text = F.element_at(
        F.create_map(*[F.lit(x) for kv in _TURN_TEXT.items() for x in kv]), F.col("event_type")
    )
    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    return e.select(
        F.concat(F.lit("u"), F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "ts",
        F.coalesce(text, F.lit("no entities here")).alias("text"),
        F.col("event_type").alias("tool"),
    ).withColumn("role", roles[F.col("turn_idx") % 3]).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


def run_kg_pipeline(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """events-derived transcripts → triples (full engine, stub adapters)."""
    cfg = DEFAULT_CONFIG
    transcripts = derive_transcripts(spark, sf_dir, replicate)
    # Stage boundaries materialize with localCheckpoint: it both caches the
    # rows AND truncates the logical plan. Without truncation the chained
    # plan grows to hundreds of operators and Catalyst's per-query analysis
    # dominates wall time (in pipeline.run the parquet stage tables provide
    # the same cut durably).
    # Arrow batch size for the kernel stages = the model batch size
    # (reference uses 8/128 on GPU; CPU stubs take larger batches)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.kernel_batch_size))
    # salted two-phase assembly engages from config: conversations longer
    # than skew_turns_threshold spread over many reducers in phase 1
    # (north-rule skew handling; output proven identical in tests)
    seg = cfg.skew_turns_threshold if cfg.salt_buckets > 0 else 0
    convs = assemble_conversations(transcripts, segment_size=seg).localCheckpoint()
    mentions = run_tagger(convs, StubLexiconTagger(synth.tag_lexicon_entries()), cfg).localCheckpoint()
    links = run_linker(
        spark,
        mentions,
        encoder=StubEncoder(cfg.embedding_dim),
        cfg=cfg,
        side=fixtures.linker_side_data(spark),
    )
    # localCheckpoint (not cache): cache kept the cleaner's hash(conv_id)
    # partitioning visible so the pair chain planned shuffle-free — but it
    # also re-embedded the ENTIRE linker plan at every cached reference
    # (measured: the pair-chain plan text was 1.4 MB with cache vs 8 KB
    # checkpointed), and Catalyst + per-stage AQE re-optimization over
    # that monster was a ~7 s SERIAL driver gap per run — the dominant
    # non-scaling term in the N→4N bench. The checkpoint trades that for
    # a few small re-shuffles of the (narrow) link rows, which scale with
    # cores instead of burning fixed driver time.
    cleaned = run_cleaner(links).localCheckpoint()
    spans = pair_spans(generate_pairs(cleaned, cfg), cleaned)
    # weight-aware classify bucketing: the estimate reads only the two
    # checkpointed stage outputs above (never the pairs subtree)
    weights = estimate_pair_weights(cleaned, convs, cfg)
    preds = classify_pair_spans(spans, convs, None, cfg, pair_weights=weights)
    return aggregate_triples(preds)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-mentioned (subj, pred, obj) triples by conversation count."""
    triples = run_kg_pipeline(spark, sf_dir)
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(F.countDistinct("conv_id").alias("n_conversations"))
        .orderBy(F.desc("n_conversations"), "subj", "pred", "obj")
        .limit(50)
    )
