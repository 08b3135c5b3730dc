"""Stage 2 — entity linking (SURVEY.md J1-J4, A1, P2, O3/O4).

Re-expresses the reference's seven sequential linker passes
(src/linker/__init__.py:29-40) as one DataFrame dataflow:

* J1/J2 dictionary hops → **broadcast hash joins** against lexicon tables
  (the lexicons are side data, MBs — never shuffled).
* O3 cascade ("first non-empty lookup wins", chemicals.py:96-111) →
  union of per-hop candidate sets tagged with a priority, keep each
  mention's minimum-priority hop (a window min, no extra shuffle since the
  vote groups by the same key).
* O4 distinct-encode-join (replaces the reference's lru_cache,
  chemicals.py:71): only *distinct unmatched lowercased texts* ever reach
  the encoder kernel; results join back. This is the main throughput lever
  — mention texts are heavy-tailed.
* J3 embedding similarity → encoder kernel in mapInPandas + numpy matmul
  against the broadcast KB matrices; per-KB-file argmax, > threshold,
  best across files (chemicals.py:71-94).
* J4 nearest-anchor → per-conversation equi-join genes×linked-organisms +
  ``min_by`` on (|Δstart|, org_start) (genes.py:107-130; strict ``<``
  keeps the earliest organism on ties), default '9606'.
* A1 majority vote → count support per (conv, candidate), pick per
  mention ``max_by(candidate, (count, -rank))`` — Python ``max`` first-of-
  max tie-break reproduced via lexicon rank order.
* P2 cleaner → filter '-' + row_number re-numbering (cleaner.py:5-30).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bionext_spark.adapters import EncoderAdapter, StubEncoder
from bionext_spark.config import (
    DEFAULT_CONFIG,
    DEFAULT_TAX_ID,
    TAXONOMY_ID_CORRECTIONS,
    PipelineConfig,
)

CAND_COLS = ("conv_id", "mention_id", "cand", "rank", "priority")


def _cands(df: DataFrame, cand, rank, priority: int) -> DataFrame:
    return df.select(
        "conv_id",
        "mention_id",
        cand.alias("cand"),
        rank.cast("long").alias("rank"),
        F.lit(priority).alias("priority"),
    )


def _first_nonempty_hop(cands: DataFrame) -> DataFrame:
    """O3 — keep each mention's lowest-priority (cheapest) non-empty hop."""
    w = F.min("priority").over(Window.partitionBy("conv_id", "mention_id"))
    return cands.withColumn("min_p", w).filter(F.col("priority") == F.col("min_p")).drop("min_p")


def majority_vote(
    cands: DataFrame,
    corrections: dict[str, str] | None = None,
    per_label: bool = False,
) -> DataFrame:
    """A1 — per-conversation support counts over candidate lists, each
    mention takes its max-count candidate, ties → first in list (rank).

    ``per_label=True`` votes several entity types in one pass (counts
    keyed by (conv, label, cand)), equivalent to the reference's separate
    per-pass votes since every mention has exactly one label — this halves
    the engine's shuffle count vs six sequential vote pipelines."""
    keys = ["conv_id", "label", "cand"] if per_label else ["conv_id", "cand"]
    counts = cands.groupBy(*keys).agg(F.count("*").alias("cnt"))
    scored = cands.join(counts, keys)
    win = scored.groupBy("conv_id", "mention_id").agg(
        F.max_by("cand", F.struct(F.col("cnt"), (-F.col("rank")).alias("nr"))).alias("linked_id"),
        F.min("priority").alias("priority"),
    )
    if corrections:
        mapping = F.create_map(*[F.lit(x) for kv in corrections.items() for x in kv])
        win = win.withColumn("linked_id", F.coalesce(mapping[F.col("linked_id")], F.col("linked_id")))
    return win


# ---------------------------------------------------------------------------
# J3 — distinct-encode embedding lookup.
# ---------------------------------------------------------------------------


def _collect_kb_matrices(concepts: DataFrame, kbs: list[str]) -> dict[str, tuple[list[str], np.ndarray]]:
    """Driver-side load of the (small) KB embedding matrices, rank-ordered
    so argmax first-max == lowest rank (reference pre-loads .npy matrices,
    chemicals.py:59-62). Rows are already unit-norm."""
    rows = (
        concepts.filter(F.col("kb").isin(kbs) & F.col("embedding").isNotNull())
        .select("kb", "id", "embedding", "rank")
        .orderBy("rank")
        .collect()
    )
    out: dict[str, tuple[list[str], np.ndarray]] = {}
    for kb in sorted(set(r["kb"] for r in rows)):
        sub = [r for r in rows if r["kb"] == kb]
        out[kb] = ([r["id"] for r in sub], np.array([r["embedding"] for r in sub], dtype=np.float64))
    return out


def embedding_lookup(
    spark: SparkSession,
    texts: DataFrame,  # (text_key [, tax_id])
    concepts: DataFrame,
    kbs: list[str],
    encoder: EncoderAdapter,
    threshold: float,
    per_tax: bool = False,
) -> DataFrame:
    """Encode each distinct text once, match against broadcast KB matrices.

    Returns (text_key[, tax_id], cand) — ``cand`` is NULL when no KB entry
    clears the threshold, except in per-tax (gene) mode where it is '-'
    (the reference's gene hop *always* answers when the taxon has an
    embedding file, genes.py:146-151)."""
    matrices = _collect_kb_matrices(concepts, kbs)
    bc = spark.sparkContext.broadcast(matrices)
    key_cols = ["text_key", "tax_id"] if per_tax else ["text_key"]
    out_schema = ("text_key string, tax_id string, cand string" if per_tax else "text_key string, cand string")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mats = bc.value
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(cand=pd.Series(dtype=object))[key_cols + ["cand"]]
                continue
            embs = np.array(encoder.encode_batch(list(pdf["text_key"])), dtype=np.float64)
            cands: list[str | None] = []
            for i in range(len(pdf)):
                wanted = [f"gene_{pdf['tax_id'].iloc[i]}"] if per_tax else sorted(mats.keys())
                best: tuple[float, str] | None = None
                for kb in wanted:
                    if kb not in mats:
                        continue
                    ids, M = mats[kb]
                    scores = M @ embs[i]
                    j = int(np.argmax(scores))
                    if scores[j] > threshold and (best is None or scores[j] > best[0]):
                        best = (float(scores[j]), ids[j])
                cands.append(best[1] if best else ("-" if per_tax else None))
            yield pdf[key_cols].assign(cand=cands)

    return texts.select(*key_cols).distinct().mapInPandas(score, out_schema)


# ---------------------------------------------------------------------------
# Per-label cascades.
# ---------------------------------------------------------------------------


def _taxonomy_cands(mentions: DataFrame, train: DataFrame, concepts: DataFrame) -> DataFrame:
    m = mentions.filter(F.col("label") == "OrganismTaxon").select("conv_id", "mention_id", "text")
    tr = train.filter(F.col("label") == "OrganismTaxon")
    # raw-text train match (taxonomy.py:53), lowercased KB match (taxonomy.py:56-58)
    c0 = _cands(m.join(F.broadcast(tr), m.text == tr.text_key), F.col("linked_id"), F.col("rank"), 0)
    kb = concepts.filter(F.col("kb") == "taxonomy")
    c1 = _cands(
        m.join(F.broadcast(kb), F.lower(m.text) == kb.text), F.col("id"), F.col("rank"), 1
    )
    return c0.unionByName(c1)


def _flat_cascade_cands(
    spark: SparkSession,
    mentions: DataFrame,
    train: DataFrame,
    concepts: DataFrame,
    label: str,
    kbs: list[str],
    encoder: EncoderAdapter,
    cfg: PipelineConfig,
) -> DataFrame:
    """Chemicals / diseases / cells: train memory → embedding similarity
    (chemicals.py:96-111; same shape diseases.py, cells.py)."""
    m = (
        mentions.filter(F.col("label") == label)
        .select("conv_id", "mention_id", F.lower("text").alias("text_key"))
    )
    tr = train.filter(F.col("label") == label)
    c0 = _cands(m.join(F.broadcast(tr), "text_key"), F.col("linked_id"), F.col("rank"), 0)
    # O3+O4: only mentions the train hop missed reach the encoder, each
    # distinct lowercased text encoded once.
    unmatched = m.join(tr.select("text_key").distinct(), "text_key", "left_anti")
    emb = embedding_lookup(
        spark, unmatched, concepts, kbs, encoder, cfg.similarity_threshold
    ).filter(F.col("cand").isNotNull())
    c1 = _cands(unmatched.join(emb, "text_key"), F.col("cand"), F.lit(0), 1)
    return c0.unionByName(c1)


def _gene_cands(
    spark: SparkSession,
    mentions: DataFrame,
    linked_orgs: DataFrame,  # (conv_id, org_tax, org_start)
    train: DataFrame,
    genes_kb: DataFrame,
    concepts: DataFrame,
    encoder: EncoderAdapter,
    cfg: PipelineConfig,
) -> DataFrame:
    m = mentions.filter(F.col("label") == "GeneOrGeneProduct").select(
        "conv_id", "mention_id", "start", F.lower("text").alias("text_key")
    )
    # J4 nearest organism anchor: only organisms whose taxon exists in the
    # gene KB count (genes.py:127 `org[0] in genes.keys()`).
    known_taxa = genes_kb.select(F.col("tax_id").alias("org_tax")).distinct()
    anchors = linked_orgs.join(F.broadcast(known_taxa), "org_tax")
    nearest = (
        m.join(anchors, "conv_id")
        .groupBy("conv_id", "mention_id")
        .agg(
            F.min_by(
                "org_tax", F.struct(F.abs(F.col("start") - F.col("org_start")).alias("d"), F.col("org_start"))
            ).alias("tax_id")
        )
    )
    m = m.join(nearest, ["conv_id", "mention_id"], "left").withColumn(
        "tax_id", F.coalesce("tax_id", F.lit(DEFAULT_TAX_ID))
    )

    tr = train.filter(F.col("label") == "GeneOrGeneProduct").select(
        "tax_id", "text_key", "linked_id", "rank"
    )
    c0 = _cands(m.join(F.broadcast(tr), ["tax_id", "text_key"]), F.col("linked_id"), F.col("rank"), 0)

    kb = genes_kb.groupBy("tax_id", F.col("alias").alias("text_key"), "gene_id").agg(
        F.min("rank").alias("rank")
    )
    c1 = _cands(m.join(F.broadcast(kb), ["tax_id", "text_key"]), F.col("gene_id"), F.col("rank"), 1)

    # Embedding hop: only for taxa that have an embedding KB; always
    # answers ('-' below threshold), short-circuiting the backup hop.
    emb_taxa = [
        r["kb"].removeprefix("gene_")
        for r in concepts.filter(F.col("kb").startswith("gene_") & F.col("embedding").isNotNull())
        .select("kb").distinct().collect()
    ]
    m_emb = m.filter(F.col("tax_id").isin(emb_taxa))
    emb = embedding_lookup(
        spark,
        m_emb,
        concepts,
        [f"gene_{t}" for t in emb_taxa],
        encoder,
        cfg.similarity_threshold,
        per_tax=True,
    )
    c2 = _cands(m_emb.join(emb, ["text_key", "tax_id"]), F.col("cand"), F.lit(0), 2)

    backup = genes_kb.groupBy(F.col("alias").alias("text_key"), "gene_id").agg(F.min("rank").alias("rank"))
    c3 = _cands(m.join(F.broadcast(backup), "text_key"), F.col("gene_id"), F.col("rank"), 3)

    return c0.unionByName(c1).unionByName(c2).unionByName(c3)


def _variant_cands(mentions: DataFrame, train: DataFrame, variants: DataFrame) -> DataFrame:
    """Simplified seq-variant cascade: train memory → ``rs`` self-id
    (seq_variant.py:414-416) → variant lexicon (stand-in for the tmVar
    TSV + LitVar/LLM adapters, off by default)."""
    m = mentions.filter(F.col("label") == "SequenceVariant").select(
        "conv_id", "mention_id", F.lower("text").alias("text_key")
    )
    tr = train.filter(F.col("label") == "SequenceVariant")
    c0 = _cands(m.join(F.broadcast(tr), "text_key"), F.col("linked_id"), F.col("rank"), 0)
    c1 = _cands(m.filter(F.col("text_key").startswith("rs")), F.col("text_key"), F.lit(0), 1)
    c2 = _cands(
        m.join(F.broadcast(variants), m.text_key == variants.mention), F.col("identifier"), F.lit(0), 2
    )
    return c0.unionByName(c1).unionByName(c2)


# ---------------------------------------------------------------------------
# Full linker + cleaner.
# ---------------------------------------------------------------------------

_METHODS = {
    ("OrganismTaxon", 0): "train",
    ("OrganismTaxon", 1): "kb",
    ("ChemicalEntity", 0): "train",
    ("ChemicalEntity", 1): "embedding",
    ("DiseaseOrPhenotypicFeature", 0): "train",
    ("DiseaseOrPhenotypicFeature", 1): "embedding",
    ("CellLine", 0): "train",
    ("CellLine", 1): "embedding",
    ("GeneOrGeneProduct", 0): "train",
    ("GeneOrGeneProduct", 1): "kb",
    ("GeneOrGeneProduct", 2): "embedding",
    ("GeneOrGeneProduct", 3): "backup",
    ("SequenceVariant", 0): "train",
    ("SequenceVariant", 1): "rsid",
    ("SequenceVariant", 2): "lexicon",
}


def run_linker(
    spark: SparkSession,
    mentions: DataFrame,
    train_direct: DataFrame,
    lexicon_concepts: DataFrame,
    lexicon_genes: DataFrame,
    lexicon_variants: DataFrame,
    encoder: EncoderAdapter | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """mentions → LINKS (same rows + linked_id/method; '-' = unlinked)."""
    encoder = encoder or StubEncoder(cfg.embedding_dim)

    # The mention table fans out into six cascade branches; materialize it
    # once (on a cluster this is the checkpointed `mentions` stage table).
    mentions = mentions.cache()

    tax = majority_vote(
        _first_nonempty_hop(_taxonomy_cands(mentions, train_direct, lexicon_concepts)),
        TAXONOMY_ID_CORRECTIONS,
    ).cache()  # reused as gene-linking anchors and in the winner union
    linked_orgs = (
        mentions.filter(F.col("label") == "OrganismTaxon")
        .select("conv_id", "mention_id", F.col("start").alias("org_start"))
        .join(tax.select("conv_id", "mention_id", F.col("linked_id").alias("org_tax")),
              ["conv_id", "mention_id"])
        .select("conv_id", "org_tax", "org_start")
    )

    flat_kbs = {
        "ChemicalEntity": ["mesh"],
        "DiseaseOrPhenotypicFeature": ["ctd"],
        "CellLine": ["cellosaurus"],
    }
    # All non-taxonomy cascades vote together in ONE pass (counts keyed by
    # label, so the semantics equal the reference's per-pass votes); only
    # taxonomy runs first because gene linking anchors on its winners.
    branches: list[DataFrame] = []
    for label, kbs in flat_kbs.items():
        branches.append(
            _flat_cascade_cands(
                spark, mentions, train_direct, lexicon_concepts, label, kbs, encoder, cfg
            ).withColumn("label", F.lit(label))
        )
    branches.append(
        _gene_cands(
            spark, mentions, linked_orgs, train_direct, lexicon_genes,
            lexicon_concepts, encoder, cfg,
        ).withColumn("label", F.lit("GeneOrGeneProduct"))
    )
    branches.append(
        _variant_cands(mentions, train_direct, lexicon_variants).withColumn(
            "label", F.lit("SequenceVariant")
        )
    )
    combined = branches[0]
    for b in branches[1:]:
        combined = combined.unionByName(b)
    # one hop-selection window + one vote for all five labels
    rest = majority_vote(_first_nonempty_hop(combined), per_label=True)

    all_winners = tax.unionByName(rest)

    method_map = F.create_map(
        *[F.lit(x) for (lbl, p), name in _METHODS.items() for x in (f"{lbl}\x00{p}", name)]
    )
    return (
        mentions.join(all_winners, ["conv_id", "mention_id"], "left")
        .withColumn("linked_id", F.coalesce("linked_id", F.lit("-")))
        .withColumn(
            "method",
            F.when(
                F.col("linked_id") != "-",
                method_map[F.concat_ws("\x00", F.col("label"), F.col("priority"))],
            ),
        )
        .drop("priority")
    )


def run_cleaner(links: DataFrame) -> DataFrame:
    """P2 — drop unlinked mentions and renumber 0..n-1 per conversation in
    span order (cleaner.py:5-30)."""
    w = Window.partitionBy("conv_id").orderBy("start", "end")
    return (
        links.filter(F.col("linked_id") != "-")
        .withColumn("mention_id", (F.row_number().over(w) - F.lit(1)).cast("int"))
    )
