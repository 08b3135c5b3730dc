"""BioC-JSON source/sink (SURVEY.md S1/S10).

The reference's native interchange format is BioC JSON
(``{"documents": [{id, passages: [title, abstract], ...}]}``, loaded at
reference src/utils.py:27-43 and written back by every stage). The engine
reads that shape into the transcript model (each passage becomes a turn)
and can emit its final triples in the reference's output shape
(outputs/extractor/pubmed_36516090.json) for side-by-side evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_bioc_as_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """BioC JSON file(s) → transcripts: doc id → conv_id, passage i →
    turn i (title, abstract, ...), preserving passage order by offset."""
    raw = spark.read.option("multiLine", "true").json(path)
    docs = raw.select(F.explode("documents").alias("d"))
    passages = docs.select(
        F.col("d.id").cast("string").alias("conv_id"),
        F.posexplode("d.passages").alias("pidx", "p"),
    )
    return passages.select(
        "conv_id",
        F.col("pidx").cast("int").alias("turn_idx"),
        F.coalesce(F.col("p.infons.type"), F.lit("passage")).alias("role"),
        F.coalesce(F.col("p.text"), F.lit("")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def read_bioc_annotations(spark: SparkSession, path: str) -> DataFrame:
    """BioC annotated documents → the engine's links schema
    (conv_id, mention_id, label, start, end, text, linked_id) plus the
    appearance-order keys (turn_idx, ann_idx).

    Offsets in BioC are document-global over title + ' ' + abstract
    (reference src/data.py:34) — identical to assemble_conversations'
    single-space join, so golden spans index straight into the engine's
    doc_text. ``mention_id`` carries the file's own annotation id
    (stringly in tagger outputs, int after the cleaner); ``ann_idx`` is
    the within-passage position, the order the reference's cleaner
    renumbers by (cleaner.py:14-22)."""
    raw = spark.read.option("multiLine", "true").json(path)
    docs = raw.select(F.explode("documents").alias("d"))
    anns = docs.select(
        F.col("d.id").cast("string").alias("conv_id"),
        F.posexplode("d.passages").alias("pidx", "p"),
    ).select(
        "conv_id",
        F.col("pidx").cast("int").alias("turn_idx"),
        F.posexplode("p.annotations").alias("aidx", "a"),
    )
    loc = F.element_at(F.col("a.locations"), 1)
    return anns.select(
        "conv_id",
        "turn_idx",
        F.col("aidx").cast("int").alias("ann_idx"),
        F.col("a.id").cast("string").alias("mention_id"),
        F.col("a.infons.type").alias("label"),
        loc.getField("offset").cast("int").alias("start"),
        (loc.getField("offset") + loc.getField("length")).cast("int").alias("end"),
        F.col("a.text").alias("text"),
        F.col("a.infons.identifier").alias("linked_id"),
    )


def read_bioc_relations(spark: SparkSession, path: str) -> DataFrame:
    """BioC doc-level relations → (conv_id, entity1, entity2, pred, novel)
    (the reference extractor's output shape, outputs/extractor/
    predicts.json: relations[].infons.{entity1,entity2,type,novel})."""
    raw = spark.read.option("multiLine", "true").json(path)
    docs = raw.select(F.explode("documents").alias("d"))
    rels = docs.select(
        F.col("d.id").cast("string").alias("conv_id"),
        F.explode("d.relations").alias("r"),
    )
    return rels.select(
        "conv_id",
        F.col("r.infons.entity1").alias("entity1"),
        F.col("r.infons.entity2").alias("entity2"),
        F.col("r.infons.type").alias("pred"),
        (F.col("r.infons.novel") == "Novel").alias("novel"),
    )


def triples_to_bioc(triples: DataFrame) -> DataFrame:
    """triples → one row per document in the reference's relations shape:
    {id, relations: [{id: R{n}, infons: {entity1, entity2, type, novel}}]}.
    Relation ids are numbered in the deterministic (subj, obj) order the
    engine fixes (the reference's ids follow dict insertion order,
    extractor/__init__.py:126-129 — sets are compared, not ids)."""
    rel = triples.select(
        "conv_id",
        F.struct(
            F.col("subj").alias("entity1"),
            F.col("obj").alias("entity2"),
            F.col("pred").alias("type"),
            F.when(F.col("novel"), "Novel").otherwise("No").alias("novel"),
        ).alias("infons"),
    )
    per_doc = rel.groupBy("conv_id").agg(
        F.array_sort(F.collect_list("infons")).alias("infons_sorted")
    )
    return per_doc.select(
        F.col("conv_id").alias("id"),
        F.expr(
            "transform(infons_sorted, (x, i) -> struct(concat('R', i) as id, x as infons))"
        ).alias("relations"),
    )


def write_bioc(triples: DataFrame, path: str) -> None:
    triples_to_bioc(triples).coalesce(1).write.mode("overwrite").json(path)
