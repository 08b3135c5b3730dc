"""Real knowledge-base loaders (the reference's on-disk formats → the
engine's lexicon schemas).

The synthetic fixtures (sources/fixtures.py) carry the same SCHEMAS but
deterministic toy content; this module reads the reference BioNExt's
actual KB layout so the GPU parity harness (scripts/parity_harness.py)
can run the engine against the real dictionaries:

    {kb_folder}/MeSH/*.jsonl + *.npy            chemicals.py:53-62
    {kb_folder}/CTD-diseases/*.jsonl + *.npy    diseases.py:52-61
    {kb_folder}/Cellosaurus/*.jsonl + *.npy     cells.py:55-63
    {kb_folder}/NCBI-Gene/embeddings/*          genes.py:64-77   (per-taxon)
    {kb_folder}/NCBI-Taxonomy/names.jsonl       taxonomy.py:32-35
    {kb_folder}/NCBI-Gene/genes_with_tax.pickle genes.py:32-33
    {kb_folder}/NCBI-Gene/gene_lookup.json      seq_variant.py:312-313
    {kb_folder}/dbSNP/tmVar3/seqvariants*.tsv   seq_variant.py:135-178
    {dataset_folder}/bc8_biored_task1_*.json    genes.py:25-54 etc.

Each aligned ``X.jsonl`` carries one ``{"id": ...}`` row per embedding
row of its sibling ``X*.npy`` matrix (row i ↔ line i), so those files are
read driver-side, sequentially — which is also how the engine consumes
them: LinkerSideData broadcasts the KB matrices as numpy exactly like the
reference pre-loads them (linking.py:230-246). At cluster scale the
loaders are a ONE-TIME conversion: ``materialize_kb_tables`` writes every
table as parquet so the recurring job reads columnar (predicate pushdown,
column pruning) instead of re-parsing pickles on the driver.

Everything here is torch-free (json/numpy/pandas/pickle), so the loaders
are unit-tested in this image against tiny synthetic files written in the
reference's exact formats (tests/test_kb_sources.py).
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from bionext_spark.sources.fixtures import (
    GENE_SYMBOLS,
    LEXICON_CONCEPTS_RANKED,
    LEXICON_GENES_RANKED,
    LEXICON_VARIANTS,
    TRAIN_DIRECT_RANKED,
)

# reference KB folder → the engine's kb name (linking.FLAT_EMB_KBS values)
CONCEPT_DIRS = {
    "MeSH": "mesh",
    "CTD-diseases": "ctd",
    "Cellosaurus": "cellosaurus",
}
DEFAULT_TAX = "9606"  # reference's human default (genes.py:43)


def _aligned_pairs(path: str) -> list[tuple[str, str]]:
    """(jsonl, npy) file pairs in one KB folder, matched on stem prefix:
    ``X.jsonl`` pairs with ``X*.npy`` (the reference keys both by the stem
    before the first '_', cells.py:58/63). Sorted for determinism — the
    reference iterates os.listdir order, which is filesystem-dependent;
    argmax over the sorted concatenation equals its max-over-files."""
    names = sorted(os.listdir(path))
    jsonls = [n for n in names if n.endswith(".jsonl")]
    npys = [n for n in names if n.endswith(".npy")]
    pairs = []
    for j in jsonls:
        stem = j.rsplit(".", 1)[0].split("_")[0]
        match = [n for n in npys if n.split("_")[0] == stem]
        if not match:
            raise FileNotFoundError(f"{path}: no .npy matching {j}")
        if len(match) > 1:
            # fail loudly instead of silently pairing with match[0] and
            # dropping/double-loading embedding matrices (ADVICE r5)
            raise ValueError(f"{path}: ambiguous .npy matches for {j}: {match}")
        pairs.append((j, match[0]))
    return pairs


def _concept_pair_specs(kb_folder: str) -> list[tuple[str, str, str | None, int]]:
    """(kb, jsonl_path, npy_path|None, rank0) in rank order — the driver's
    METADATA-ONLY pass: row counts come from the jsonl line count and the
    npy header (mmap, no data pages), so the misalignment check keeps its
    driver-side semantics while no embedding matrix is ever materialized
    on the driver. Concatenating a folder's several (jsonl, npy) pairs
    under ONE kb is semantically exact: the reference takes the
    max-scoring id across its per-file argmaxes (cells.py:84-95), which
    equals the argmax over the concatenation."""

    def n_lines(p: str) -> int:
        with open(p) as f:
            return sum(1 for line in f if line.strip())

    specs: list[tuple[str, str, str | None, int]] = []
    rank = 0

    def add(kb: str, path: str, jname: str, nname: str) -> None:
        nonlocal rank
        jp, npp = os.path.join(path, jname), os.path.join(path, nname)
        n_ids = n_lines(jp)
        n_mat = int(np.load(npp, mmap_mode="r").shape[0])
        if n_ids != n_mat:
            raise ValueError(
                f"{path}: {jname} has {n_ids} rows but {nname} has "
                f"{n_mat} embedding rows — misaligned KB"
            )
        specs.append((kb, jp, npp, rank))
        rank += n_ids

    for folder, kb in CONCEPT_DIRS.items():
        path = os.path.join(kb_folder, folder)
        if os.path.isdir(path):
            for jname, nname in _aligned_pairs(path):
                add(kb, path, jname, nname)
    gene_dir = os.path.join(kb_folder, "NCBI-Gene", "embeddings")
    if os.path.isdir(gene_dir):
        # one (jsonl, npy) pair per taxon: '<tax>_*.jsonl' / '<tax>__*.npy'
        # (genes.py:64-72 keys both by the stem before the first '_')
        all_pairs = _aligned_pairs(gene_dir)
        for tax in sorted({p[0].split("_")[0] for p in all_pairs}):
            for jname, nname in [p for p in all_pairs if p[0].split("_")[0] == tax]:
                add(f"gene_{tax}", gene_dir, jname, nname)
    tax_path = os.path.join(kb_folder, "NCBI-Taxonomy", "names.jsonl")
    if os.path.exists(tax_path):
        specs.append(("taxonomy", tax_path, None, rank))
    return specs


def load_concept_lexicon(spark: SparkSession, kb_folder: str) -> DataFrame:
    """All embedding KBs + the taxonomy name dictionary as ONE concepts
    table (schema LEXICON_CONCEPTS_RANKED). kb names: 'mesh', 'ctd',
    'cellosaurus', 'gene_<tax_id>' (genes.py keys its matrices per
    taxon), 'taxonomy' (names only, no embeddings — the J2 dictionary
    hop).

    DISTRIBUTED (round-5 verdict #5): the driver enumerates file pairs and
    header-level row counts only; each (jsonl, npy) pair is parsed,
    unit-normalized (reference cells.py:61-62 — the engine's hop assumes
    unit rows) and Arrow-shipped by a WORKER task, so a multi-million-
    concept KB no longer pins the driver boxing floats row by row. The KB
    folder must be on storage every executor can read — true locally and
    for the shared-KB cluster layout the parity harness mirrors."""
    specs = _concept_pair_specs(kb_folder)
    if not specs:
        return spark.createDataFrame([], LEXICON_CONCEPTS_RANKED)
    spec_df = spark.createDataFrame(
        [(kb, jp, npp, r0) for kb, jp, npp, r0 in specs],
        "kb string, jsonl string, npy string, rank0 long",
    ).repartition(len(specs))

    def read_pairs(batches):
        import pandas as pd

        for pdf in batches:
            for kb, jp, npp, rank0 in pdf.itertuples(index=False):
                with open(jp) as f:
                    recs = [json.loads(line) for line in f if line.strip()]
                if not recs:
                    continue
                ranks = np.arange(rank0, rank0 + len(recs), dtype="int32")
                if npp is not None:
                    mat = np.load(npp)
                    norms = np.linalg.norm(mat, ord=2, axis=-1, keepdims=True)
                    # astype(float32) after the float64 normalization is the
                    # same rounding the old createDataFrame float-cast did
                    mat = (mat / np.where(norms == 0, 1.0, norms)).astype(np.float32)
                    yield pd.DataFrame(
                        {
                            "kb": kb,
                            "id": [str(r["id"]) for r in recs],
                            # embedding KBs carry no surface form on disk
                            # (the jsonl is ids aligned to npy rows); schema
                            # wants a non-null text, and no hop reads it
                            "text": "",
                            "class": None,
                            "embedding": list(mat),
                            "rank": ranks,
                        }
                    )
                else:
                    yield pd.DataFrame(
                        {
                            "kb": kb,
                            "id": [str(r["id"]) for r in recs],
                            "text": [r["text"] for r in recs],
                            "class": [r.get("class") for r in recs],
                            "embedding": None,
                            "rank": ranks,
                        }
                    )

    return spec_df.mapInPandas(read_pairs, LEXICON_CONCEPTS_RANKED)


def load_gene_lexicon(spark: SparkSession, kb_folder: str) -> DataFrame:
    """genes_with_tax.pickle — dict[tax_id → dict[alias → gene_ids]] —
    exploded to (tax_id, alias, gene_id, rank). The reference stores the
    gene_ids as SETS whose iteration order is hash-randomized per process;
    the loader sorts them so rank (the engine's tie-break) is
    reproducible."""
    with open(os.path.join(kb_folder, "NCBI-Gene", "genes_with_tax.pickle"), "rb") as f:
        genes = pickle.load(f)
    rows = []
    rank = 0
    for tax in sorted(genes):
        alias_map = genes[tax]
        for alias in alias_map:  # dicts preserve the pickled insert order
            for gid in sorted(alias_map[alias]):
                rows.append(
                    {"tax_id": str(tax), "alias": alias, "gene_id": str(gid), "rank": rank}
                )
                rank += 1
    return spark.createDataFrame(rows, LEXICON_GENES_RANKED)


def load_gene_symbols(spark: SparkSession, kb_folder: str) -> DataFrame:
    """gene_lookup.json — gene_id → symbol (the J8 broadcast side,
    seq_variant.py:312-330)."""
    with open(os.path.join(kb_folder, "NCBI-Gene", "gene_lookup.json")) as f:
        lookup = json.load(f)
    rows = [{"gene_id": str(k), "symbol": str(v)} for k, v in sorted(lookup.items())]
    return spark.createDataFrame(rows, GENE_SYMBOLS)


def _parse_tmvar(kb_folder: str, use_val: bool) -> list[dict]:
    import pandas as pd

    name = "seqvariants.tsv" if use_val else "seqvariants_without_bc8_biored.tsv"
    df = pd.read_csv(os.path.join(kb_folder, "dbSNP", "tmVar3", name), sep="\t")
    out = []
    for _, r in df.iterrows():
        ident = str(r["identifier"])
        candidate = ident.split(";")[0]
        gene = None
        if "CorrespondingGene" in ident:
            gene = ident.split(";")[1].split(":")[1]
        out.append({"mention": str(r["mention"]), "identifier": candidate, "gene_id": gene})
    return out


def load_variant_lexicon(spark: SparkSession, kb_folder: str, use_val: bool = True) -> DataFrame:
    """tmVar3 seqvariants TSV → (mention, identifier, gene_id) — the
    engine's SequenceVariant dictionary hop rows (identifier = the first
    ';'-part; CorrespondingGene parsed when present,
    seq_variant.py:168-178)."""
    return spark.createDataFrame(_parse_tmvar(kb_folder, use_val), LEXICON_VARIANTS)


def load_variant_examples(
    spark: SparkSession, kb_folder: str, dataset_folder: str, use_val: bool = True
) -> DataFrame:
    """The K5 few-shot example memory (mention, code, gene): tmVar rows
    whose identifier carries '|' plus the train(/val) SequenceVariant
    annotations with their nearest-gene symbol, amino-acids converted —
    reference seq_variant.py:140-205 + 324-346. ``gene`` is the SYMBOL via
    gene_lookup (rows whose nearest gene has no symbol are dropped, as the
    reference does)."""
    from bionext_spark.functions.text import convert_amino_acids

    with open(os.path.join(kb_folder, "NCBI-Gene", "gene_lookup.json")) as f:
        gene_lookup = json.load(f)

    triples: set[tuple[str, str, str]] = set()
    for r in _parse_tmvar(kb_folder, use_val):
        if "|" in r["identifier"]:
            g = (r["gene_id"] or "?").split(",")[0]
            if g in gene_lookup:
                triples.add((convert_amino_acids(r["mention"]), r["identifier"], gene_lookup[g]))
    files = ["bc8_biored_task1_train.json"]
    if use_val:
        files.append("bc8_biored_task1_val_revealed.json")
    for fname in files:
        path = os.path.join(dataset_folder, fname)
        if not os.path.exists(path):
            continue
        for doc in _bioc_docs(path):
            gene_anchors = [
                (a["linked_id"], a["start"])
                for a in doc
                if a["label"] in ("GeneOrGeneProduct", "Gene")
            ]
            for a in doc:
                if a["label"] != "SequenceVariant" or "|" not in (a["linked_id"] or ""):
                    continue
                nearest = _nearest(gene_anchors, a["start"])
                if nearest is None:
                    continue
                g = nearest.split(",")[0]
                if g in gene_lookup:
                    triples.add(
                        (convert_amino_acids(a["text"]), a["linked_id"], gene_lookup[g])
                    )
    rows = [
        {"mention": m, "code": c, "gene": g} for m, c, g in sorted(triples)
    ]
    return spark.createDataFrame(rows, "mention string, code string, gene string")


def _bioc_docs(path: str) -> list[list[dict]]:
    """Driver-side BioC parse → per-doc annotation lists with document-
    global offsets (title + ' ' + abstract, reference src/data.py:34).
    Used only for the small train/val side-table builds; the engine's
    distributed BioC path is sources/bioc.py."""
    with open(path) as f:
        data = json.load(f)
    docs = []
    for d in data.get("documents", []):
        anns = []
        for p in d.get("passages", []):
            for a in p.get("annotations", []):
                loc = a["locations"][0]
                anns.append(
                    {
                        "label": a["infons"].get("type"),
                        "text": a.get("text"),
                        "linked_id": a["infons"].get("identifier"),
                        "start": int(loc["offset"]),
                    }
                )
        docs.append(anns)
    return docs


def _nearest(anchors: list[tuple[str, int]], start: int):
    """Reference nearest-anchor scan (genes.py:46-52): min |start - anchor|,
    first-seen wins ties (strict <)."""
    best, dist = None, 10_000_000
    for _id, s in anchors:
        if abs(start - s) < dist:
            dist = abs(start - s)
            best = _id
    return best


def train_direct_from_bioc(
    spark: SparkSession,
    dataset_folder: str,
    known_taxa: set[str] | None = None,
    use_val: bool = True,
) -> DataFrame:
    """The J1 train-memory table (TRAIN_DIRECT schema) from the BioRED
    train(+val) BioC files, reproducing each reference module's build:

    - flat labels (tax_id NULL): OrganismTaxon keys RAW text
      (taxonomy.py:53), ChemicalEntity / DiseaseOrPhenotypicFeature /
      CellLine key lowercased text (chemicals.py:35-45 etc.);
    - GeneOrGeneProduct keys (nearest-organism tax, lower(text)) with
      human '9606' as the no-organism default, nearest restricted to
      organisms present in the gene KB (genes.py:35-54). Pass
      ``known_taxa`` (e.g. from load_gene_lexicon's tax_ids) to apply
      that restriction; None admits every annotated organism.

    Rank is per-label appearance order (train file before val, doc order,
    annotation order) — the engine's first-of-max tie-break. One
    reference divergence, deliberate: when a doc's every organism is
    unknown to the KB, the reference's ``nearest_org`` silently carries
    over from the PREVIOUS doc (an unbound-variable latency in
    genes.py:46-52); here such mentions fall back to '9606'."""
    flat_labels = {
        "OrganismTaxon": False,  # label → lower?
        "Organism": False,
        "ChemicalEntity": True,
        "Chemical": True,
        "DiseaseOrPhenotypicFeature": True,
        "Disease": True,
        "CellLine": True,
    }
    canonical = {
        "Organism": "OrganismTaxon",
        "Chemical": "ChemicalEntity",
        "Disease": "DiseaseOrPhenotypicFeature",
    }
    rows: list[dict] = []
    per_label_rank: dict[str, int] = {}

    def add(label: str, key: str, lid: str, tax: str | None) -> None:
        r = per_label_rank.get(label, 0)
        rows.append(
            {"label": label, "text_key": key, "linked_id": lid, "tax_id": tax, "rank": r}
        )
        per_label_rank[label] = r + 1

    files = ["bc8_biored_task1_train.json"]
    if use_val:
        files.append("bc8_biored_task1_val_revealed.json")
    for fname in files:
        path = os.path.join(dataset_folder, fname)
        if not os.path.exists(path):
            continue
        for doc in _bioc_docs(path):
            orgs = [
                (a["linked_id"], a["start"])
                for a in doc
                if a["label"] in ("OrganismTaxon", "Organism") and a["linked_id"]
            ]
            if known_taxa is not None:
                orgs = [(i, s) for i, s in orgs if i in known_taxa]
            if not orgs:
                orgs = [(DEFAULT_TAX, 0)]
            for a in doc:
                label, text, lid = a["label"], a["text"], a["linked_id"]
                if not (text and lid):
                    continue
                if label in flat_labels:
                    lab = canonical.get(label, label)
                    add(lab, text.lower() if flat_labels[label] else text, lid, None)
                elif label in ("GeneOrGeneProduct", "Gene"):
                    add("GeneOrGeneProduct", text.lower(), lid, _nearest(orgs, a["start"]))
    return spark.createDataFrame(rows, TRAIN_DIRECT_RANKED)


def materialize_kb_tables(
    spark: SparkSession, kb_folder: str, dataset_folder: str, out_dir: str
) -> dict[str, str]:
    """One-time conversion of every KB side table to parquet under
    ``out_dir`` — the cluster-scale path: the recurring 10^12-turn job
    reads columnar tables (pruned, pushed-down scans) instead of
    re-parsing pickles/jsonl on a driver. Returns table → path."""
    gene_lex = load_gene_lexicon(spark, kb_folder)
    taxa = {r["tax_id"] for r in gene_lex.select("tax_id").distinct().collect()}
    tables = {
        "lexicon_concepts": load_concept_lexicon(spark, kb_folder),
        "lexicon_genes": gene_lex,
        "gene_symbols": load_gene_symbols(spark, kb_folder),
        "lexicon_variants": load_variant_lexicon(spark, kb_folder),
        "variant_examples": load_variant_examples(spark, kb_folder, dataset_folder),
        "train_direct": train_direct_from_bioc(spark, dataset_folder, known_taxa=taxa),
    }
    paths = {}
    for name, df in tables.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
