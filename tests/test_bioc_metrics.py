"""BioC source/sink round-trip + A6 evaluation metrics tests."""

from __future__ import annotations

import json

from bionext_spark.metrics import ner_span_metrics, relation_metrics
from bionext_spark.sources.bioc import read_bioc_as_transcripts, triples_to_bioc


def test_bioc_read(spark, tmp_path):
    doc = {
        "documents": [
            {
                "id": "36516090",
                "passages": [
                    {"infons": {"type": "title"}, "offset": 0, "text": "A title."},
                    {"infons": {"type": "abstract"}, "offset": 9, "text": "An abstract."},
                ],
            }
        ]
    }
    p = tmp_path / "doc.json"
    p.write_text(json.dumps(doc))
    rows = read_bioc_as_transcripts(spark, str(p)).collect()
    assert [(r["conv_id"], r["turn_idx"], r["role"], r["text"]) for r in rows] == [
        ("36516090", 0, "title", "A title."),
        ("36516090", 1, "abstract", "An abstract."),
    ]


def test_triples_to_bioc_shape(spark):
    triples = spark.createDataFrame(
        [("d1", "A", "Association", "B", True), ("d1", "A", "Bind", "C", False)],
        "conv_id string, subj string, pred string, obj string, novel boolean",
    )
    out = {r["id"]: r["relations"] for r in triples_to_bioc(triples).collect()}
    rels = out["d1"]
    assert [r["id"] for r in rels] == ["R0", "R1"]
    assert rels[0]["infons"]["entity1"] == "A" and rels[0]["infons"]["novel"] in ("Novel", "No")


def test_relation_metrics(spark):
    gold = spark.createDataFrame(
        [("c", "a", "Association", "b", False), ("c", "a", "Bind", "d", True)],
        "conv_id string, subj string, pred string, obj string, novel boolean",
    )
    pred = spark.createDataFrame(
        [("c", "a", "Association", "b", False), ("c", "x", "Bind", "y", False)],
        "conv_id string, subj string, pred string, obj string, novel boolean",
    )
    m = relation_metrics(pred, gold)
    assert abs(m["micro"]["precision"] - 0.5) < 1e-9
    assert abs(m["micro"]["recall"] - 0.5) < 1e-9
    assert m["novelty_accuracy"] == 1.0


def test_ner_metrics(spark):
    gold = spark.createDataFrame(
        [("c", 0, 5, "ChemicalEntity"), ("c", 10, 15, "CellLine")],
        "conv_id string, start int, end int, label string",
    )
    pred = spark.createDataFrame(
        [("c", 0, 5, "ChemicalEntity")], "conv_id string, start int, end int, label string"
    )
    m = ner_span_metrics(pred, gold)
    assert m["micro"]["precision"] == 1.0
    assert abs(m["micro"]["recall"] - 0.5) < 1e-9
    assert m["per_label"]["CellLine"]["f1"] == 0.0
