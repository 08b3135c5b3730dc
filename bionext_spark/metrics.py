"""Evaluation metrics (SURVEY.md A6) + stage metric helpers.

Span-level NER P/R/F1 per label (reference src/tagger/metrics.py:80-153:
TP = |true ∩ pred| on exact (start, end, label) triples per document) and
relation micro/macro P/R/F1 (reference src/extractor/hf_training.py:24-43),
expressed as joins + counts so they run distributed at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prf(tp: float, n_pred: float, n_true: float) -> dict[str, float]:
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_true if n_true else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"precision": p, "recall": r, "f1": f1}


def ner_span_metrics(pred: DataFrame, gold: DataFrame) -> dict:
    """Exact-span micro + per-label metrics over
    (conv_id, start, end, label)."""
    key = ["conv_id", "start", "end", "label"]
    p = pred.select(*key).distinct().cache()
    g = gold.select(*key).distinct().cache()
    tp_by_label = {r["label"]: r["tp"] for r in p.join(g, key).groupBy("label").agg(F.count("*").alias("tp")).collect()}
    np_by_label = {r["label"]: r["n"] for r in p.groupBy("label").agg(F.count("*").alias("n")).collect()}
    ng_by_label = {r["label"]: r["n"] for r in g.groupBy("label").agg(F.count("*").alias("n")).collect()}
    labels = sorted(set(np_by_label) | set(ng_by_label))
    per_label = {
        lbl: _prf(tp_by_label.get(lbl, 0), np_by_label.get(lbl, 0), ng_by_label.get(lbl, 0))
        for lbl in labels
    }
    micro = _prf(sum(tp_by_label.values()), sum(np_by_label.values()), sum(ng_by_label.values()))
    macro_f1 = sum(m["f1"] for m in per_label.values()) / len(per_label) if per_label else 0.0
    return {"micro": micro, "macro_f1": macro_f1, "per_label": per_label}


def relation_metrics(pred: DataFrame, gold: DataFrame) -> dict:
    """Micro/macro P/R/F1 over exact (conv_id, subj, pred, obj) matches;
    novelty accuracy over the true positives (FIXTURES.md §6 contract)."""
    key = ["conv_id", "subj", "pred", "obj"]
    p = pred.select(*key, "novel").distinct().cache()
    g = gold.select(*key, F.col("novel").alias("novel_gold")).distinct().cache()
    joined = p.join(g, key).cache()
    tp_by = {r["pred"]: r["tp"] for r in joined.groupBy("pred").agg(F.count("*").alias("tp")).collect()}
    np_by = {r["pred"]: r["n"] for r in p.groupBy("pred").agg(F.count("*").alias("n")).collect()}
    ng_by = {r["pred"]: r["n"] for r in g.groupBy("pred").agg(F.count("*").alias("n")).collect()}
    labels = sorted(set(np_by) | set(ng_by))
    per_label = {
        lbl: _prf(tp_by.get(lbl, 0), np_by.get(lbl, 0), ng_by.get(lbl, 0)) for lbl in labels
    }
    micro = _prf(sum(tp_by.values()), sum(np_by.values()), sum(ng_by.values()))
    macro_f1 = sum(m["f1"] for m in per_label.values()) / len(per_label) if per_label else 0.0
    tp_total = joined.count()
    novel_ok = joined.filter(F.col("novel") == F.col("novel_gold")).count()
    return {
        "micro": micro,
        "macro_f1": macro_f1,
        "per_label": per_label,
        "novelty_accuracy": novel_ok / tp_total if tp_total else 0.0,
    }
