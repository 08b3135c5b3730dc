#!/usr/bin/env python
"""Per-section N-vs-4N scaling decomposition of the KG pipeline.

Times each stage of run_kg_pipeline separately (materializing at every
boundary with localCheckpoint, exactly like the flagship plan does) at
two core counts in back-to-back fresh subprocess JVMs, and prints a
per-section table: seconds at N, seconds at 4N, the section's own
N→4N efficiency, and its share of the 4N wall. This names WHERE the
remaining non-scaling seconds live (the serial constant the local
N→4N gate pays; a real 4N-executor cluster amortizes per-job driver
constants across machines).

Usage: python scripts/profile_sections.py --n 2 --replicate 12
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_sections(cores: int, replicate: int, sf_dir: str, warmup: bool,
                 reps: int = 1) -> dict:
    from bionext_spark import synth
    from bionext_spark.adapters import StubEncoder, StubLexiconTagger
    from bionext_spark.config import DEFAULT_CONFIG
    from bionext_spark.flagship import derive_transcripts, run_kg_pipeline
    from bionext_spark.operators.assemble import assemble_conversations
    from bionext_spark.operators.extraction import (
        aggregate_triples,
        classify_pair_spans,
        estimate_pair_weights,
    )
    from bionext_spark.operators.linking import run_cleaner, run_linker
    from bionext_spark.operators.pairs import generate_pairs, pair_spans
    from bionext_spark.operators.tagging import run_tagger
    from bionext_spark.session import get_spark
    from bionext_spark.sources import fixtures

    cfg = DEFAULT_CONFIG
    mem = os.environ.get("SPARK_DRIVER_MEM") or f"{max(8, (cores * 3) // 2)}g"
    spark = get_spark(
        f"sections-{cores}", cores=cores, shuffle_partitions=max(cores, 8),
        extra_conf={"spark.driver.memory": mem},
    )
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(cfg.kernel_batch_size)
    )
    if warmup:
        warm = sf_dir.replace("sf0.1", "sf0.01")
        run_kg_pipeline(spark, warm if os.path.isdir(warm) else sf_dir, 1).write.format(
            "noop"
        ).mode("overwrite").save()

    out: dict = {"cores": cores, "sections": {}}

    # reps > 1: run the identical section chain that many times in this
    # one warm JVM and keep the LAST pass — the bench's min-of-reps
    # protocol showed rep 1 carries 20-25% of one-time JIT/heap-growth
    # cost that rep 2+ (the steady state the gate measures) does not.
    for _ in range(max(1, reps)):
        out["sections"] = {}
        t_all = time.time()

        def timed(name, fn):
            t0 = time.time()
            r = fn()
            out["sections"][name] = round(time.time() - t0, 2)
            return r

        seg = cfg.skew_turns_threshold if cfg.salt_buckets > 0 else 0
        convs = timed(
            "assemble",
            lambda: assemble_conversations(
                derive_transcripts(spark, sf_dir, replicate), segment_size=seg
            ).localCheckpoint(),
        )
        mentions = timed(
            "tagger",
            lambda: run_tagger(
                convs, StubLexiconTagger(synth.tag_lexicon_entries()), cfg
            ).localCheckpoint(),
        )
        cleaned = timed(
            "linker+cleaner",
            lambda: run_cleaner(
                run_linker(
                    spark, mentions, encoder=StubEncoder(cfg.embedding_dim), cfg=cfg,
                    side=fixtures.linker_side_data(spark),
                )
            ).localCheckpoint(),
        )
        spans = timed(
            "pairs+spans",
            lambda: pair_spans(generate_pairs(cleaned, cfg), cleaned).localCheckpoint(),
        )

        def _classify():
            w = estimate_pair_weights(cleaned, convs, cfg)
            df = aggregate_triples(
                classify_pair_spans(spans, convs, None, cfg, pair_weights=w)
            )
            df.write.format("noop").mode("overwrite").save()

        timed("classify+agg", _classify)
        out["total"] = round(time.time() - t_all, 2)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--replicate", type=int, default=12)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=0, help="child mode: run one point")
    ap.add_argument("--cold", action="store_true")
    ap.add_argument("--reps", type=int, default=1, help="passes in one JVM; last reported")
    args = ap.parse_args()

    if args.cores:
        print(json.dumps(run_sections(args.cores, args.replicate, args.sf_dir,
                                      not args.cold, args.reps)))
        return

    def one(cores: int) -> dict:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores),
             "--replicate", str(args.replicate), "--sf-dir", args.sf_dir,
             "--reps", str(args.reps)],
            capture_output=True, text=True,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    rn, r4 = one(args.n), one(4 * args.n)
    print(f"{'section':16} {'N='+str(args.n):>8} {'4N='+str(4*args.n):>8} "
          f"{'eff':>6} {'4N share':>9}")
    for k in rn["sections"]:
        a, b = rn["sections"][k], r4["sections"][k]
        eff = a / (4 * b) if b else float("nan")
        print(f"{k:16} {a:8.1f} {b:8.1f} {eff:6.2f} {b / r4['total']:9.1%}")
    print(f"{'TOTAL':16} {rn['total']:8.1f} {r4['total']:8.1f} "
          f"{rn['total'] / (4 * r4['total']):6.2f}")


if __name__ == "__main__":
    main()
