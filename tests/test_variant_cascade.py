"""Seq-variant cascade tail parity: engine vs pure-Python oracle across ALL
hop priorities (train → rs-prefix → tmVar lexicon → LitVar → LLM), with the
deterministic S8/K5 fakes injected through the memo table.

Reference run order: src/linker/__init__.py:29-40 (genes before
seq_variant); deep hops: src/linker/seq_variant.py:376-505."""

from __future__ import annotations

import pytest

from bionext_spark import kernels as K
from bionext_spark import oracle, synth
from bionext_spark.adapters import StubEncoder, StubLexiconTagger, StubLitVarAdapter, StubLLMAdapter
from bionext_spark.operators.assemble import assemble_conversations
from bionext_spark.operators.linking import run_linker
from bionext_spark.operators.tagging import run_tagger
from bionext_spark.sources import fixtures
from bionext_spark.sources.external import MemoizedLookup


@pytest.fixture(scope="module")
def oracle_links(transcripts_rows):
    lex = oracle.Lexicons(
        synth.lexicon_concepts_rows(),
        [{**r, "rank": i} for i, r in enumerate(synth.lexicon_genes_rows())],
        synth.train_direct_rows(),
        synth.lexicon_variants_rows(),
        gene_symbols=synth.gene_symbols_rows(),
    )
    out = oracle.run_pipeline(
        transcripts_rows,
        lex,
        K.build_tag_lexicon(synth.tag_lexicon_entries()),
        litvar_fn=synth.fake_litvar_response,
        llm_fn=synth.fake_llm_response,
    )
    return out["links"]


def _engine_links(spark, transcripts, tmp_path, litvar_adapter, llm_adapter):
    convs = assemble_conversations(transcripts).cache()
    mentions = run_tagger(convs, StubLexiconTagger(synth.tag_lexicon_entries()))
    return run_linker(
        spark,
        mentions,
        fixtures.train_direct_df(spark),
        fixtures.lexicon_concepts_df(spark),
        fixtures.lexicon_genes_df(spark),
        fixtures.lexicon_variants_df(spark),
        StubEncoder(),
        gene_symbols=fixtures.gene_symbols_df(spark),
        litvar=MemoizedLookup(spark, str(tmp_path / "litvar_memo"), litvar_adapter),
        llm=MemoizedLookup(spark, str(tmp_path / "llm_memo"), llm_adapter),
    ).collect()


def _by_mention(rows):
    return {
        (r["conv_id"], r["mention_id"]): (r["linked_id"], r["method"])
        for r in rows
    }


def test_variant_cascade_parity(spark, transcripts, transcripts_rows, oracle_links, tmp_path):
    got = _by_mention(
        _engine_links(spark, transcripts, tmp_path, StubLitVarAdapter(), StubLLMAdapter())
    )
    exp = _by_mention(oracle_links)
    assert got == exp


def test_all_variant_hops_exercised(oracle_links):
    """The planted fixtures drive every hop priority at least once
    (conv9998: LitVar + LLM with gene anchors; conv9999: LLM without)."""
    methods = {
        r["method"] for r in oracle_links if r["label"] == "SequenceVariant" and r["method"]
    }
    assert {"rsid", "lexicon", "litvar", "llm"} <= methods
    # the no-anchor LLM path ran: conv9999 has no gene mentions
    v9999 = [r for r in oracle_links if r["conv_id"] == "conv9999" and r["label"] == "SequenceVariant"]
    assert v9999 and all(r["method"] == "llm" for r in v9999 if r["linked_id"] != "-")


def test_unlinked_nearest_gene_still_anchors(oracle_links):
    """conv9997 (reference seq_variant.py:388-404): the variant's nearest
    gene 'orphanol' has NO vote winner (zebrafish taxon: in the gene KB,
    no embedding file, no dict/backup match), but it must still be the
    anchor — id '-', so LitVar's gene_lookup guard fails and the hop is
    'llm', not 'litvar' via the farther linked tp53."""
    v = [
        r
        for r in oracle_links
        if r["conv_id"] == "conv9997" and r["label"] == "SequenceVariant"
    ]
    # the LLM fake answers gene '-' with no-code chatter → scrubs to '-';
    # the OLD winners-only anchor (farther tp53 → gene 30590) would have
    # produced 'p|SUB|V|185|E' here instead
    assert v and all(r["linked_id"] == "-" for r in v)
    assert all(r["linked_id"] != "p|SUB|V|185|E" for r in v)
    orphanol = [
        r
        for r in oracle_links
        if r["conv_id"] == "conv9997" and r["text"] == "orphanol"
    ]
    assert orphanol and all(r["linked_id"] == "-" for r in orphanol)


def test_warm_memo_replays_offline(spark, transcripts, oracle_links, tmp_path):
    """Second run with NO adapters over the warmed memo tables reproduces
    the deep-hop links — the distributed analog of the reference's
    diskcache replay (seq_variant.py:19-21)."""
    first = _by_mention(
        _engine_links(spark, transcripts, tmp_path, StubLitVarAdapter(), StubLLMAdapter())
    )
    second = _by_mention(_engine_links(spark, transcripts, tmp_path, None, None))
    # litvar-linked mentions replay identically from the memo
    deep_first = {k: v for k, v in first.items() if v[1] in ("litvar", "llm")}
    assert deep_first
    for k, v in deep_first.items():
        assert second[k] == v
