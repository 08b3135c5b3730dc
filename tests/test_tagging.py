"""Stage 1 tests: windowing round-trip, BIO decode quirks, tagger vs oracle."""

from __future__ import annotations

import pytest

from bionext_spark import kernels as K
from bionext_spark import oracle, synth
from bionext_spark.adapters import StubLexiconTagger
from bionext_spark.config import DEFAULT_CONFIG
from bionext_spark.operators.assemble import assemble_conversations
from bionext_spark.operators.tagging import run_tagger


@pytest.mark.parametrize("n_tokens", [0, 1, 100, 384, 385, 512, 513, 2000])
def test_window_roundtrip(n_tokens):
    """Concatenated center slices must reproduce the token stream exactly."""
    wins = K.make_windows(n_tokens, DEFAULT_CONFIG.max_seq_len, DEFAULT_CONFIG.context_size)
    centers = []
    for lo, hi, n_left, n_right in wins:
        centers.extend(range(lo + n_left, hi - n_right))
    assert centers == list(range(n_tokens))


def test_decode_bio_o_to_i_starts_span():
    # Reference decoder.py:29-37 — "since OII is now valid": O→I starts a span.
    # tags: O I I O (label idx 0 → I tag = 2)
    spans = K.decode_bio([0, 2, 2, 0], [0, 2, 4, 6], [1, 3, 5, 7])
    assert spans == [(2, 5, 0)]


def test_decode_bio_adjacent_span_label_quirk():
    # B(label0) I(label0) B(label1): the flushed first span takes the NEW
    # label (curr_label is updated before the flush) — reference quirk.
    spans = K.decode_bio([1, 2, 3], [0, 2, 4], [1, 3, 5])
    assert spans == [(0, 3, 1), (4, 5, 1)]


def test_merge_spans_chain():
    # Overlap chain collapses to [min(start), max(end)] (RangeDict semantics).
    assert K.merge_spans([(0, 5, 0), (4, 9, 1), (20, 25, 2)]) == [(0, 9, 0), (20, 25, 2)]


def test_tagger_matches_oracle(spark, transcripts, transcripts_rows):
    tagger = StubLexiconTagger(synth.tag_lexicon_entries())
    convs = assemble_conversations(transcripts)
    got = sorted(
        (r["conv_id"], r["mention_id"], r["label"], r["start"], r["end"], r["text"], r["turn_idx"])
        for r in run_tagger(convs, tagger).collect()
    )
    exp_oracle = oracle.tag(
        oracle.assemble(transcripts_rows), K.build_tag_lexicon(synth.tag_lexicon_entries())
    )
    exp = sorted(
        (m["conv_id"], m["mention_id"], m["label"], m["start"], m["end"], m["text"], m["turn_idx"])
        for m in exp_oracle
    )
    assert len(exp) > 50  # the generator actually planted mentions
    assert got == exp


def _mention_rows(df):
    return sorted(
        (r["conv_id"], r["mention_id"], r["label"], r["start"], r["end"], r["text"], r["turn_idx"])
        for r in df.collect()
    )


def test_fused_equals_windowed(spark):
    """The fused single-kernel tagger must reproduce the three-stage
    window-parallel path row-for-row, including conversations long enough
    to span several 512-token windows (center-slice reassembly engaged)."""
    import dataclasses

    from bionext_spark.operators.tagging import (
        decode_mentions,
        tag_conversations_fused,
        tag_windows,
        window_conversations,
    )

    rows = synth.generate_transcripts(n_conversations=12, skew_conversation_turns=90)
    from bionext_spark.sources.fixtures import transcripts_df

    convs = assemble_conversations(transcripts_df(spark, rows)).localCheckpoint()
    # sanity: the skew conversation really is multi-window
    max_tokens = max(len(K.tokenize(r["doc_text"])[2]) for r in convs.collect())
    assert max_tokens > DEFAULT_CONFIG.center_size

    tagger = StubLexiconTagger(synth.tag_lexicon_entries())
    fused = tag_conversations_fused(convs, tagger)
    windowed = decode_mentions(tag_windows(window_conversations(convs), tagger), convs)
    got, exp = _mention_rows(fused), _mention_rows(windowed)
    assert len(exp) > 20
    assert got == exp


def test_fused_threshold_routes_giant_conversations(spark, transcripts):
    """run_tagger output is invariant to the fusion threshold: all-fused,
    all-windowed, and the mixed split (the 60-turn skew conversation routed
    through the window-parallel branch) agree exactly."""
    import dataclasses

    tagger = StubLexiconTagger(synth.tag_lexicon_entries())
    convs = assemble_conversations(transcripts).localCheckpoint()
    outs = []
    for thr in (0, 30, 10_000):  # windowed-only / mixed / fused-only
        cfg = dataclasses.replace(DEFAULT_CONFIG, fused_tagger_max_turns=thr)
        outs.append(_mention_rows(run_tagger(convs, tagger, cfg)))
    assert outs[0] == outs[1] == outs[2]
    # the mixed split really split: both sides nonempty
    n_giant = convs.filter("n_turns > 30").count()
    assert 0 < n_giant < convs.count()


def test_fused_empty_input(spark):
    from bionext_spark.sources.fixtures import transcripts_df
    from bionext_spark.operators.tagging import tag_conversations_fused

    convs = assemble_conversations(transcripts_df(spark, synth.generate_transcripts(2)))
    empty = convs.filter("n_turns < 0")
    out = tag_conversations_fused(empty, StubLexiconTagger(synth.tag_lexicon_entries()))
    assert out.count() == 0 and [f.name for f in out.schema.fields] == [
        "conv_id", "mention_id", "label", "start", "end", "text", "turn_idx"]
