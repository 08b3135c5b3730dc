"""sources/kb.py — real-KB loaders tested against tiny synthetic files
written in the reference's EXACT on-disk formats (aligned jsonl+npy,
genes_with_tax.pickle, gene_lookup.json, tmVar3 TSV, BioC train files),
so the GPU parity harness's data plumbing is verified in this image
without torch or the real (multi-GB) knowledge bases.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
import pytest

from bionext_spark.sources.kb import (
    load_concept_lexicon,
    load_gene_lexicon,
    load_gene_symbols,
    load_variant_examples,
    load_variant_lexicon,
    materialize_kb_tables,
    train_direct_from_bioc,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _bioc_doc(doc_id, annotations):
    return {
        "id": doc_id,
        "passages": [
            {
                "offset": 0,
                "annotations": [
                    {
                        "id": str(i),
                        "text": text,
                        "infons": {"type": label, "identifier": lid},
                        "locations": [{"offset": start, "length": len(text)}],
                    }
                    for i, (label, text, lid, start) in enumerate(annotations)
                ],
            }
        ],
    }


@pytest.fixture(scope="module")
def kb_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("kb")
    kb = root / "knowledge-bases"
    ds = root / "dataset"
    for d in ("MeSH", "Cellosaurus", "NCBI-Gene/embeddings", "NCBI-Taxonomy", "dbSNP/tmVar3"):
        (kb / d).mkdir(parents=True)
    ds.mkdir()

    # MeSH: two aligned (jsonl, npy) pairs — concatenated under kb 'mesh'
    _write_jsonl(kb / "MeSH" / "names.jsonl", [{"id": "D001"}, {"id": "D002"}])
    np.save(kb / "MeSH" / "names_sapbert.npy", np.array([[3.0, 4.0], [0.0, 2.0]]))
    _write_jsonl(kb / "MeSH" / "synonyms.jsonl", [{"id": "D003"}])
    np.save(kb / "MeSH" / "synonyms_sapbert.npy", np.array([[1.0, 0.0]]))
    # Cellosaurus: one pair
    _write_jsonl(kb / "Cellosaurus" / "names.jsonl", [{"id": "CVCL_1"}])
    np.save(kb / "Cellosaurus" / "names_sapbert.npy", np.array([[0.0, 1.0]]))
    # per-taxon gene embeddings: '<tax>_names.jsonl' / '<tax>__model.npy'
    _write_jsonl(kb / "NCBI-Gene" / "embeddings" / "9606_names.jsonl", [{"id": "672"}])
    np.save(kb / "NCBI-Gene" / "embeddings" / "9606__sap.npy", np.array([[1.0, 1.0]]))
    _write_jsonl(kb / "NCBI-Gene" / "embeddings" / "10090_names.jsonl", [{"id": "12189"}])
    np.save(kb / "NCBI-Gene" / "embeddings" / "10090__sap.npy", np.array([[2.0, 0.0]]))
    # taxonomy names (dictionary only, no embeddings)
    _write_jsonl(
        kb / "NCBI-Taxonomy" / "names.jsonl",
        [{"id": "9606", "text": "human", "class": "common name"}],
    )
    # gene pickle: dict[tax → dict[alias → set(gene_ids)]]
    with open(kb / "NCBI-Gene" / "genes_with_tax.pickle", "wb") as f:
        pickle.dump({"9606": {"brca1": {"672"}, "tp53": {"7157", "1234"}}}, f)
    with open(kb / "NCBI-Gene" / "gene_lookup.json", "w") as f:
        json.dump({"672": "BRCA1", "7157": "TP53"}, f)
    # tmVar TSV: identifier = '<norm>;CorrespondingGene:<gid>'
    with open(kb / "dbSNP" / "tmVar3" / "seqvariants.tsv", "w") as f:
        f.write("mention\tidentifier\n")
        f.write("V600E\tp|SUB|V|600|E;CorrespondingGene:672\n")
        f.write("c.123A>G\tc|SUB|A|123|G\n")  # no gene → dropped from examples
        f.write("rs12345\trs12345;CorrespondingGene:7157\n")  # no '|' → lexicon only
    # BioRED-format train file: one doc with organisms + a gene + a variant
    train = {
        "documents": [
            _bioc_doc(
                "d1",
                [
                    ("OrganismTaxon", "human", "9606", 0),
                    ("OrganismTaxon", "mouse", "10090", 100),
                    ("GeneOrGeneProduct", "BRCA1", "672", 90),  # nearest org: mouse
                    ("ChemicalEntity", "Aspirin", "D001", 10),
                    ("SequenceVariant", "Val600Glu", "p|SUB|V|600|E", 95),
                ],
            ),
            _bioc_doc(
                "d2",  # no organism at all → gene memory defaults to 9606
                [("GeneOrGeneProduct", "tp53", "7157", 5)],
            ),
        ]
    }
    with open(ds / "bc8_biored_task1_train.json", "w") as f:
        json.dump(train, f)
    return str(kb), str(ds)


def test_concept_lexicon_alignment_and_normalization(spark, kb_dirs):
    kb, _ = kb_dirs
    df = load_concept_lexicon(spark, kb)
    rows = {r["kb"]: [] for r in df.collect()}
    for r in df.collect():
        rows[r["kb"]].append(r)
    # two MeSH files concatenate under one kb, ranks in file order
    mesh = sorted(rows["mesh"], key=lambda r: r["rank"])
    assert [r["id"] for r in mesh] == ["D001", "D002", "D003"]
    # rows are unit-normalized at load (reference cells.py:61-62)
    assert mesh[0]["embedding"] == pytest.approx([0.6, 0.8])
    # per-taxon gene KBs get their own kb names
    assert [r["id"] for r in rows["gene_9606"]] == ["672"]
    assert [r["id"] for r in rows["gene_10090"]] == ["12189"]
    # taxonomy rows are dictionary-only
    tax = rows["taxonomy"][0]
    assert (tax["id"], tax["text"], tax["embedding"]) == ("9606", "human", None)


def test_concept_lexicon_misalignment_raises(spark, tmp_path):
    kb = tmp_path / "knowledge-bases"
    (kb / "MeSH").mkdir(parents=True)
    _write_jsonl(kb / "MeSH" / "names.jsonl", [{"id": "D1"}, {"id": "D2"}])
    np.save(kb / "MeSH" / "names_sapbert.npy", np.array([[1.0, 0.0]]))  # 1 row for 2 ids
    with pytest.raises(ValueError, match="misaligned"):
        load_concept_lexicon(spark, str(kb))


def test_gene_lexicon_explodes_pickle_sorted(spark, kb_dirs):
    kb, _ = kb_dirs
    rows = load_gene_lexicon(spark, kb).collect()
    got = {(r["tax_id"], r["alias"], r["gene_id"]) for r in rows}
    assert got == {
        ("9606", "brca1", "672"),
        ("9606", "tp53", "1234"),
        ("9606", "tp53", "7157"),
    }
    # set-valued gene ids are sorted for reproducible rank
    tp53 = sorted((r for r in rows if r["alias"] == "tp53"), key=lambda r: r["rank"])
    assert [r["gene_id"] for r in tp53] == ["1234", "7157"]


def test_gene_symbols(spark, kb_dirs):
    kb, _ = kb_dirs
    rows = {r["gene_id"]: r["symbol"] for r in load_gene_symbols(spark, kb).collect()}
    assert rows == {"672": "BRCA1", "7157": "TP53"}


def test_variant_lexicon_parses_identifier_and_gene(spark, kb_dirs):
    kb, _ = kb_dirs
    rows = {r["mention"]: r for r in load_variant_lexicon(spark, kb).collect()}
    assert rows["V600E"]["identifier"] == "p|SUB|V|600|E"
    assert rows["V600E"]["gene_id"] == "672"
    assert rows["c.123A>G"]["gene_id"] is None
    assert rows["rs12345"]["identifier"] == "rs12345"


def test_variant_examples_fewshot_memory(spark, kb_dirs):
    kb, ds = kb_dirs
    # use_val=True: the val BioC file is absent (skipped); the full
    # seqvariants.tsv is the fixture's TSV
    rows = {(r["mention"], r["code"], r["gene"]) for r in
            load_variant_examples(spark, kb, ds, use_val=True).collect()}
    # tmVar row with '|' + known gene → example with SYMBOL; rs row (no '|')
    # and the gene-less c. row are excluded
    assert ("V600E", "p|SUB|V|600|E", "BRCA1") in rows
    # train-doc variant: amino acids converted (Val600Glu → V600E), nearest
    # gene is BRCA1 (start 90 vs variant 95)
    assert ("V600E", "p|SUB|V|600|E", "BRCA1") in rows
    assert all("rs12345" not in m for m, _, _ in rows)


def test_train_direct_mixed_normalization_and_nearest_org(spark, kb_dirs):
    kb, ds = kb_dirs
    taxa = {"9606", "10090"}
    rows = train_direct_from_bioc(spark, ds, known_taxa=taxa).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    # taxonomy keys RAW text, others lowercased
    org_keys = {r["text_key"] for r in by_label["OrganismTaxon"]}
    assert org_keys == {"human", "mouse"}
    chem = by_label["ChemicalEntity"][0]
    assert (chem["text_key"], chem["linked_id"], chem["tax_id"]) == ("aspirin", "D001", None)
    # gene memory: BRCA1 at start 90 is nearest to mouse (100) not human (0)
    genes = {(r["text_key"], r["tax_id"], r["linked_id"]) for r in by_label["GeneOrGeneProduct"]}
    assert ("brca1", "10090", "672") in genes
    # doc without organisms defaults to human 9606 (genes.py:43)
    assert ("tp53", "9606", "7157") in genes
    # known_taxa restriction: unknown organisms are excluded from anchors
    rows2 = train_direct_from_bioc(spark, ds, known_taxa={"9606"}).collect()
    genes2 = {(r["text_key"], r["tax_id"]) for r in rows2 if r["label"] == "GeneOrGeneProduct"}
    assert ("brca1", "9606") in genes2  # mouse filtered → human is nearest


def test_materialize_kb_tables_roundtrip(spark, kb_dirs, tmp_path):
    kb, ds = kb_dirs
    out = str(tmp_path / "kb_parquet")
    paths = materialize_kb_tables(spark, kb, ds, out)
    assert set(paths) == {
        "lexicon_concepts", "lexicon_genes", "gene_symbols",
        "lexicon_variants", "variant_examples", "train_direct",
    }
    for name, path in paths.items():
        assert spark.read.parquet(path).count() > 0, name


def test_side_data_builds_from_real_kb_tables(spark, kb_dirs):
    """The loaded tables must feed LinkerSideData.build — the exact
    consumption path the parity harness uses."""
    from bionext_spark.operators.linking import LinkerSideData

    kb, ds = kb_dirs
    gene_lex = load_gene_lexicon(spark, kb)
    taxa = {r["tax_id"] for r in gene_lex.select("tax_id").distinct().collect()}
    side = LinkerSideData.build(
        spark,
        train_direct_from_bioc(spark, ds, known_taxa=taxa),
        load_concept_lexicon(spark, kb),
        gene_lex,
        load_variant_lexicon(spark, kb),
    )
    assert set(side.kb_matrices) == {"mesh", "cellosaurus", "gene_9606", "gene_10090"}
    ids, mat = side.kb_matrices["mesh"]
    assert ids == ["D001", "D002", "D003"] and mat.shape == (3, 2)
    assert side.emb_taxa == ["10090", "9606"]
    assert side.known_taxa == ["9606"]


def test_aligned_pairs_ambiguous_npy_raises(tmp_path):
    """Two .npy files sharing one jsonl's stem must fail loudly instead of
    silently pairing with the first match (ADVICE r5)."""
    from bionext_spark.sources.kb import _aligned_pairs

    kb = tmp_path / "AmbKB"
    kb.mkdir()
    _write_jsonl(kb / "names.jsonl", [{"id": "D1"}])
    np.save(kb / "names_sapbert.npy", np.array([[1.0, 0.0]]))
    np.save(kb / "names_other.npy", np.array([[0.0, 1.0]]))
    with pytest.raises(ValueError, match="ambiguous"):
        _aligned_pairs(str(kb))
