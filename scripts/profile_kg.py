#!/usr/bin/env python
"""Per-stage wall-time breakdown of the KG pipeline at a given core count.

Usage: python scripts/profile_kg.py --cores 4 --replicate 8 [--sf-dir ...]

Prints one JSON line with per-stage seconds so N-vs-4N runs can be diffed
stage by stage (the north-rule scaling gate needs the top NON-scaling
stage identified by measurement, not guesses). Stage boundaries here are
explicit localCheckpoints — slightly more materialization than the
production chain, but identical per-stage work.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from bionext_spark import synth
    from bionext_spark.adapters import StubEncoder, StubLexiconTagger
    from bionext_spark.config import DEFAULT_CONFIG
    from bionext_spark.flagship import derive_transcripts
    from bionext_spark.operators.assemble import assemble_conversations
    from bionext_spark.operators.extraction import aggregate_triples, classify_pair_spans
    from bionext_spark.operators.linking import run_cleaner, run_linker
    from bionext_spark.operators.pairs import generate_pairs, pair_spans
    from bionext_spark.operators.tagging import run_tagger
    from bionext_spark.session import get_spark
    from bionext_spark.sources import fixtures

    cfg = DEFAULT_CONFIG
    t_all = time.time()
    spark = get_spark(f"profile-kg-{args.cores}", cores=args.cores,
                      shuffle_partitions=max(args.cores, 8))
    timings: dict[str, float] = {"spark_init": time.time() - t_all}

    def stage(name, fn):
        t0 = time.time()
        out = fn().localCheckpoint()
        timings[name] = round(time.time() - t0, 2)
        return out

    transcripts = derive_transcripts(spark, args.sf_dir, args.replicate)
    convs = stage("assemble", lambda: assemble_conversations(transcripts))
    mentions = stage("tagger", lambda: run_tagger(convs, StubLexiconTagger(synth.tag_lexicon_entries()), cfg))
    links = stage("linker", lambda: run_linker(
        spark, mentions,
        fixtures.train_direct_df(spark), fixtures.lexicon_concepts_df(spark),
        fixtures.lexicon_genes_df(spark), fixtures.lexicon_variants_df(spark),
        StubEncoder(cfg.embedding_dim), cfg,
    ))
    cleaned = stage("cleaner", lambda: run_cleaner(links))
    spans = stage("pairs", lambda: pair_spans(generate_pairs(cleaned, cfg), cleaned))
    t0 = time.time()
    triples = aggregate_triples(classify_pair_spans(spans, convs, None, cfg))
    try:
        triples.write.format("noop").mode("overwrite").save()
    except Exception:
        triples.count()
    timings["extract"] = round(time.time() - t0, 2)
    timings["total"] = round(time.time() - t_all, 2)
    timings["cores"] = args.cores
    timings["replicate"] = args.replicate
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
