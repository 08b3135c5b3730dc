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
