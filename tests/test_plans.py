"""Physical-plan assertions: the engine's scale design claims hold in the
plans Catalyst actually produces (broadcast lexicon joins, parquet filter
pushdown, column pruning)."""

from __future__ import annotations

from bionext_spark.entry_queries import (
    j1_broadcast_lookup,
    p2_filter_renumber,
    q1_pricing_summary,
)
from bionext_spark.plans import (
    broadcast_join_count,
    pushed_filters,
    read_schema,
    uses_broadcast_join,
)

SF = "/root/testdata/sf0.001"


def test_lexicon_joins_are_broadcast(spark):
    df = j1_broadcast_lookup(spark, SF)
    assert broadcast_join_count(df) >= 2  # part AND supplier stay broadcast


def test_filter_pushdown_reaches_scan(spark):
    df = p2_filter_renumber(spark, SF)
    pf = pushed_filters(df)
    assert "value" in pf and "GreaterThan" in pf or "50" in pf, pf


def test_column_pruning(spark):
    df = q1_pricing_summary(spark, SF)
    rs = read_schema(df)
    # only the 5 needed lineitem columns are read, not all 11
    assert "l_quantity" in rs and "l_extendedprice" in rs
    assert "l_partkey" not in rs and "l_suppkey" not in rs, rs


def test_linker_dictionary_join_is_broadcast(spark, transcripts):
    from bionext_spark import synth
    from bionext_spark.adapters import StubEncoder, StubLexiconTagger
    from bionext_spark.operators.assemble import assemble_conversations
    from bionext_spark.operators.linking import run_linker
    from bionext_spark.operators.tagging import run_tagger
    from bionext_spark.sources import fixtures

    convs = assemble_conversations(transcripts)
    mentions = run_tagger(convs, StubLexiconTagger(synth.tag_lexicon_entries()))
    links = run_linker(
        spark,
        mentions,
        fixtures.train_direct_df(spark),
        fixtures.lexicon_concepts_df(spark),
        fixtures.lexicon_genes_df(spark),
        fixtures.lexicon_variants_df(spark),
        StubEncoder(),
    )
    assert uses_broadcast_join(links)
