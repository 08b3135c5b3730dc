"""Parity against the reference's OWN published outputs
(/root/reference/outputs/{tagger,linker,extractor}/ — read-only goldens).

These are the only reference-anchored correctness fixtures available
without torch: the linker predicts.json (100 BioRED test docs, 7,040
cleaned+linked annotations) and the extractor predicts.json (same docs +
1,247 emitted relations). The model-free mid-pipeline — BioC ingestion,
doc reassembly offsets, cleaner renumbering (P2), candidate-pair
generation (J5 + type mask) — must reproduce / cover them exactly.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bionext_spark.config import RELATION_LABELS
from bionext_spark.operators.assemble import assemble_conversations
from bionext_spark.operators.linking import run_cleaner
from bionext_spark.operators.pairs import generate_pairs
from bionext_spark.sources.bioc import (
    read_bioc_annotations,
    read_bioc_as_transcripts,
    read_bioc_relations,
)

GOLDEN = "/root/reference/outputs"
LINKER = os.path.join(GOLDEN, "linker", "predicts.json")
EXTRACTOR = os.path.join(GOLDEN, "extractor", "predicts.json")
TAGGER = os.path.join(GOLDEN, "tagger", "predicts.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LINKER), reason="reference goldens not mounted"
)


@pytest.fixture(scope="module")
def golden_links(spark):
    return read_bioc_annotations(spark, LINKER).cache()


def test_golden_span_text_equality(spark, golden_links):
    """Per-row invariant vs the reference: BioC offsets are document-global
    over title + ' ' + abstract (reference src/data.py:34); the engine's
    transcript ingestion + single-space reassembly must put every golden
    annotation's text at exactly its golden [start, end) slice — all
    7,040 annotations across the 100 BioRED test docs."""
    docs = assemble_conversations(read_bioc_as_transcripts(spark, LINKER))
    joined = golden_links.join(docs.select("conv_id", "doc_text"), "conv_id")
    mism = joined.filter(
        F.expr("substring(doc_text, start + 1, end - start)") != F.col("text")
    )
    total = golden_links.count()
    assert total == 7040
    assert mism.count() == 0


def test_cleaner_renumber_matches_golden_sequence(spark, golden_links):
    """P2 parity: the golden linker output IS the cleaner's output
    (reference runs run_cleaner last in the linker chain, cleaner.py:5-30
    — appearance-order renumber after dropping '-'). Re-running the
    engine's cleaner over the golden annotations must reproduce the exact
    id sequence the extractor consumed."""
    renum = run_cleaner(
        golden_links.withColumnRenamed("mention_id", "golden_id"),
        order_cols=("turn_idx", "ann_idx"),
    )
    mism = renum.filter(F.col("mention_id").cast("string") != F.col("golden_id"))
    assert renum.count() == 7040  # nothing dropped: goldens carry no '-'
    assert mism.count() == 0


def test_pair_universe_covers_golden_relations(spark, golden_links):
    """J5 parity: candidate pairs generated from the golden linked
    entities must cover every (entity1, entity2) the golden extractor
    emitted — including composite-id mentions, where a relation's atomic
    id must appear among the comma-parts of the pair's entity
    (reference extractor/__init__.py:92-97 splits composites)."""
    pairs = generate_pairs(golden_links).collect()
    by_conv: dict[str, list] = {}
    for p in pairs:
        by_conv.setdefault(p["conv_id"], []).append(p)

    rels = read_bioc_relations(spark, EXTRACTOR).collect()
    assert len(rels) == 1247
    missing = []
    for r in rels:
        cands = by_conv.get(r["conv_id"], [])
        found = False
        for p in cands:
            s1, s2 = set(p["e1_id"].split(",")), set(p["e2_id"].split(","))
            if (r["entity1"] in s1 and r["entity2"] in s2) or (
                r["entity1"] in s2 and r["entity2"] in s1
            ):
                found = True
                break
        if not found:
            missing.append((r["conv_id"], r["entity1"], r["entity2"], r["pred"]))
    assert missing == [], f"{len(missing)} golden relations not covered: {missing[:10]}"


def test_golden_relation_labels_match_config(spark):
    """The golden relations' label/novelty vocabulary is exactly the
    engine's config (RELATION_LABELS minus Negative_Class — the reference
    never emits class 8, extractor/__init__.py:79)."""
    rels = read_bioc_relations(spark, EXTRACTOR)
    labels = {r["pred"] for r in rels.select("pred").distinct().collect()}
    assert labels <= set(RELATION_LABELS) - {"Negative_Class"}
    novs = {r["novel"] for r in rels.select("novel").distinct().collect()}
    assert novs <= {True, False}


def test_tagger_golden_reads_as_pre_linker_state(spark):
    """The tagger golden (pre-linker) ingests through the same reader:
    string ids, all identifiers '-' (nothing linked yet) — the cleaner
    over it drops everything, matching the reference's staging."""
    anns = read_bioc_annotations(spark, TAGGER)
    n = anns.count()
    assert n > 0
    assert anns.filter(F.col("linked_id") != "-").count() == 0
    assert run_cleaner(anns, order_cols=("turn_idx", "ann_idx")).count() == 0


def test_golden_relations_are_type_maskable(spark, golden_links):
    """Every golden relation's (entity1, entity2) types fall inside the
    engine's VALID_TYPE_PAIRS mask (data.py:40-61) — i.e. the mask never
    filters away a pair the reference actually emitted. Types are looked
    up from the golden annotations' atomic id parts."""
    # an atomic id can carry SEVERAL labels in one doc (e.g. a MeSH id
    # annotated both Disease and OrganismTaxon in the goldens) — keep the
    # full type set and require SOME assignment inside the mask, exactly
    # what pair generation does (it pairs distinct (label, id) tuples)
    id2types: dict[tuple[str, str], set[str]] = {}
    for row in golden_links.select("conv_id", "linked_id", "label").distinct().collect():
        for part in row["linked_id"].split(","):
            id2types.setdefault((row["conv_id"], part), set()).add(row["label"])
    from bionext_spark.config import VALID_TYPE_PAIRS

    rels = read_bioc_relations(spark, EXTRACTOR).collect()
    bad = []
    for r in rels:
        t1s = id2types.get((r["conv_id"], r["entity1"]), set())
        t2s = id2types.get((r["conv_id"], r["entity2"]), set())
        if not any(
            tuple(sorted((t1, t2))) in VALID_TYPE_PAIRS for t1 in t1s for t2 in t2s
        ):
            bad.append((r["conv_id"], r["entity1"], t1s, r["entity2"], t2s))
    assert bad == [], f"{len(bad)} relations outside the mask: {bad[:10]}"


def test_golden_triple_aggregation_parity(spark, golden_links):
    """The LAST hop (round-3 verdict ask #4): per-pair one-hot logits
    derived from the golden extractor output, fed through
    `aggregate_triples` (P3 + J7 + A2 + F13), must emit EXACTLY the golden
    1,247 (conv, entity1, pred, entity2, novel) relations.

    Pair provenance is reconstructed faithfully: a composite candidate
    pair (A, B) is used (exercising the J7 explode×explode on real
    composite ids) wherever every part-combo (a∈A, b∈B) is golden with one
    identical (type, novel) — the reference's own aggregation guarantees
    that invariant for pairs it actually classified non-negative
    (extractor/__init__.py:88-108). Relations not covered that way enter
    as atomic pairs. A2's softmax-SUM is exercised by emitting each pair's
    one-hot twice plus a disagreeing minority chunk (2-vs-1 argmax), P3 by
    negative-class chunk rows on non-golden candidate pairs that must
    vanish."""
    import itertools

    from bionext_spark.config import NEGATIVE_CLASS, RELATION_LABELS
    from bionext_spark.operators.extraction import aggregate_triples

    label2id = {lab: i for i, lab in enumerate(RELATION_LABELS)}
    rels = read_bioc_relations(spark, EXTRACTOR).collect()
    golden = {}
    for r in rels:
        golden[(r["conv_id"], r["entity1"], r["entity2"])] = (r["pred"], r["novel"])
    ents: dict[str, set] = {}
    for row in golden_links.select("conv_id", "linked_id").distinct().collect():
        ents.setdefault(row["conv_id"], set()).add(row["linked_id"])

    # consistent directed composite covering pairs
    comp_rows, covered = [], set()
    for conv, ids in ents.items():
        for A, B in itertools.permutations(ids, 2):
            pa, pb = A.split(","), B.split(",")
            if len(pa) == 1 and len(pb) == 1:
                continue
            combos = [(conv, x, y) for x in pa for y in pb]
            tvs = {golden.get(c) for c in combos}
            if len(tvs) == 1 and None not in tvs:
                comp_rows.append((conv, A, B, tvs.pop()))
                covered.update(combos)
    assert len(comp_rows) >= 50 and len(covered) >= 100  # J7 really exercised

    def onehot(n, i):
        v = [0.0] * n
        v[i] = 1.0
        return v

    def chunk_rows(conv, e1, e2, pred, novel):
        li, ni = label2id[pred], int(bool(novel))
        rows = [(conv, e1, e2, onehot(9, li), onehot(2, ni), li)] * 2
        # disagreeing minority chunk: a different non-negative label — the
        # 2-vs-1 softmax sum must still argmax to the golden label
        alt = (li + 1) % NEGATIVE_CLASS
        rows.append((conv, e1, e2, onehot(9, alt), onehot(2, ni), alt))
        return rows

    pred_rows = []
    for conv, A, B, (pred, novel) in comp_rows:
        pred_rows += chunk_rows(conv, A, B, pred, novel)
    for (conv, e1, e2), (pred, novel) in golden.items():
        if (conv, e1, e2) not in covered:
            pred_rows += chunk_rows(conv, e1, e2, pred, novel)

    # P3: negative-class chunks on candidate pairs covering no golden
    # relation must not survive
    n_neg = 0
    for p in generate_pairs(golden_links).limit(2000).collect():
        combos = {
            (p["conv_id"], x, y)
            for x in p["e1_id"].split(",")
            for y in p["e2_id"].split(",")
        } | {
            (p["conv_id"], y, x)
            for x in p["e1_id"].split(",")
            for y in p["e2_id"].split(",")
        }
        if not (combos & set(golden)) and n_neg < 50:
            pred_rows.append(
                (p["conv_id"], p["e1_id"], p["e2_id"],
                 onehot(9, NEGATIVE_CLASS), onehot(2, 0), NEGATIVE_CLASS)
            )
            n_neg += 1
    assert n_neg == 50

    preds = spark.createDataFrame(
        pred_rows,
        "conv_id string, e1_id string, e2_id string, "
        "rel_softmax array<double>, novel_raw array<double>, pred_class int",
    )
    got = {
        (t["conv_id"], t["subj"], t["obj"]): (t["pred"], t["novel"])
        for t in aggregate_triples(preds).collect()
    }
    assert got == golden
