"""Stage 0 tests: conversation assembly + the per-turn text equality
invariant from BASELINE.json:input_hint."""

from __future__ import annotations

from bionext_spark import oracle
from bionext_spark.operators.assemble import assemble_conversations


def test_assembly_matches_oracle(spark, transcripts, transcripts_rows):
    got = {r["conv_id"]: r.asDict() for r in assemble_conversations(transcripts).collect()}
    exp = oracle.assemble(transcripts_rows)
    assert set(got) == set(exp)
    for cid, e in exp.items():
        g = got[cid]
        assert g["doc_text"] == e["doc_text"]
        assert g["n_turns"] == e["n_turns"]
        assert g["turn_offsets"] == e["turn_offsets"]
        assert g["turn_lengths"] == e["turn_lengths"]


def test_two_phase_salted_assembly_equals_one_phase(spark, transcripts):
    """Skew path: salted segment assembly must be output-identical."""
    one = sorted(tuple(r) for r in assemble_conversations(transcripts).collect())
    two = sorted(tuple(r) for r in assemble_conversations(transcripts, segment_size=7).collect())
    assert one == two


def test_per_turn_text_equality(spark, transcripts, transcripts_rows):
    """Slicing the assembled doc back by turn offsets reproduces every
    original turn text exactly (stable turn ordering invariant)."""
    convs = {r["conv_id"]: r.asDict() for r in assemble_conversations(transcripts).collect()}
    for row in transcripts_rows:
        c = convs[row["conv_id"]]
        off = c["turn_offsets"][row["turn_idx"]]
        ln = c["turn_lengths"][row["turn_idx"]]
        assert c["doc_text"][off : off + ln] == row["text"]
