"""Property-based kernel tests (hypothesis) — FIXTURES.md §5 randomized
invariants. Pure-Python (no Spark session) so they run in milliseconds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bionext_spark import kernels as K
from bionext_spark.config import DEFAULT_CONFIG


@given(n=st.integers(0, 5000), max_len=st.integers(8, 512), ctx=st.integers(0, 100))
@settings(max_examples=200, deadline=None)
def test_window_roundtrip_property(n, max_len, ctx):
    if max_len <= 2 * ctx:
        return
    wins = K.make_windows(n, max_len, ctx)
    centers = []
    for lo, hi, n_left, n_right in wins:
        assert hi - lo <= max_len
        centers.extend(range(lo + n_left, hi - n_right))
    assert centers == list(range(n))


@given(tags=st.lists(st.integers(0, 12), max_size=200))
@settings(max_examples=200, deadline=None)
def test_decode_spans_well_formed(tags):
    starts = [2 * i for i in range(len(tags))]
    ends = [2 * i + 1 for i in range(len(tags))]
    spans = K.decode_bio(tags, starts, ends)
    for s, e, lbl in spans:
        assert s < e and 0 <= lbl <= 5
    # merged spans never overlap and are sorted
    merged = K.merge_spans(spans)
    for (s1, e1, _), (s2, e2, _) in zip(merged, merged[1:]):
        assert e1 <= s2


@given(
    spans=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 50), st.integers(0, 5)), max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_merge_spans_covers_input(spans):
    norm = [(s, s + ln, lbl) for s, ln, lbl in spans]
    merged = K.merge_spans(norm)
    # every input position is covered by some merged span
    for s, e, _ in norm:
        assert any(ms <= s and e <= me for ms, me, _ in merged)


@given(
    text=st.text(alphabet="abc d.", max_size=300),
    cuts=st.lists(st.tuples(st.integers(0, 300), st.integers(1, 10)), max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_insert_markers_fast_equals_slow(text, cuts):
    """The single-pass fast path must equal reverse insertion for any
    DISJOINT span set (the post-cleaner guarantee)."""
    spans = []
    pos = 0
    for off, ln in sorted(cuts):
        s = max(pos, min(off, len(text)))
        e = min(s + ln, len(text))
        if e > s:
            spans.append((s, e))
            pos = e
    half = len(spans) // 2
    s1, s2 = spans[:half], spans[half:]
    got = K.insert_markers(text, s1, s2)
    # reference-style reverse insertion
    exp = text
    edits = [(s, e, "[s1]", "[e1]") for s, e in s1] + [(s, e, "[s2]", "[e2]") for s, e in s2]
    for s, e, o, c in sorted(edits, key=lambda x: (x[0], x[1]), reverse=True):
        exp = exp[:s] + o + exp[s:e] + c + exp[e:]
    assert got == exp


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_tokenize_offsets_consistent(text):
    starts, ends, toks = K.tokenize(text)
    for s, e, t in zip(starts, ends, toks):
        assert text[s:e] == t
    # offsets strictly increase
    assert all(a < b for a, b in zip(starts, starts[1:])) or len(starts) <= 1


@given(st.lists(st.floats(-20, 20), min_size=1, max_size=9))
@settings(max_examples=200, deadline=None)
def test_softmax_argmax_props(xs):
    sm = K.softmax(xs)
    assert abs(sum(sm) - 1.0) < 1e-9
    i = K.argmax_first(xs)
    # softmax preserves the argmax whenever the max is unique by a margin
    # (near-ties can collapse to equal floats under exp/normalize)
    if all(xs[i] - x > 1e-9 for j, x in enumerate(xs) if j != i):
        assert i == K.argmax_first(sm)


@given(
    subword_counts=st.lists(st.integers(1, 4), min_size=1, max_size=40),
    trunc=st.integers(0, 10),
)
@settings(max_examples=200, deadline=None)
def test_first_subword_alignment_tokenizer_agnostic(subword_counts, trunc):
    """K4 — word-level emissions are invariant to the checkpoint's subword
    segmentation: however a wordpiece vocab splits each engine token (1-4
    subwords here, with optional tail truncation), each word's emission row
    equals its first subword's logits and truncated words decode to O."""
    import numpy as np

    from bionext_spark import model_math as MM

    n_words = len(subword_counts)
    word_ids: list[int | None] = [None]  # [CLS]-style special token
    for w, c in enumerate(subword_counts):
        word_ids.extend([w] * c)
    word_ids.append(None)  # [SEP]
    if trunc:
        word_ids = word_ids[: max(1, len(word_ids) - trunc)]
    rng = np.random.RandomState(0)
    logits = rng.randn(len(word_ids), 13)
    emis = MM.first_subword_emissions(word_ids, logits, n_words)
    firsts: dict[int, int] = {}
    for pos, wid in enumerate(word_ids):
        if wid is not None and wid not in firsts:
            firsts[wid] = pos
    for w in range(n_words):
        if w in firsts:
            assert (emis[w] == logits[firsts[w]]).all()
        else:
            assert (emis[w] == 0).all()
    # zero rows decode to O under the zero-init constraint-masked CRF
    start, end, trans = MM.default_crf_params()
    tags = MM.crf_viterbi(emis, start, end, trans)
    for w in range(n_words):
        if w not in firsts:
            assert tags[w] == 0


@given(offsets=st.lists(st.tuples(st.integers(0, 50), st.integers(1, 8)), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_span_text_equality_any_tokenizer(offsets):
    """Per-turn text equality is tokenizer-agnostic: for ANY monotonic
    token offset map (not just the regex tokenizer's), BIO-decoded span
    boundaries land on token boundaries of that map, so text slicing
    reproduces the mention surface regardless of the tokenizer used."""
    starts, ends, pos = [], [], 0
    for gap, length in offsets:
        pos += gap
        starts.append(pos)
        pos += length
        ends.append(pos)
    tags = [(1 if i % 3 == 0 else 2 if i % 3 == 1 else 0) for i in range(len(starts))]
    spans = K.decode_bio(tags, starts, ends)
    bounds = set(starts) | set(ends)
    for s, e, _ in spans:
        assert s in bounds and e in bounds and s < e


@given(
    words=st.lists(st.sampled_from(["alpha", "beta9", "x", ",", "tp53", "-"]), min_size=1, max_size=40),
    picks=st.lists(st.tuples(st.integers(0, 39), st.booleans()), max_size=6),
    chunk_len=st.integers(4, 64),
)
@settings(max_examples=300, deadline=None)
def test_marked_tokens_fast_path_equals_string_path(words, picks, chunk_len):
    """Token-splice marker insertion (classifier kernel fast path) produces
    exactly chunk_marked_text(insert_markers(...)) for token-aligned,
    disjoint spans — the only spans the tagger can produce."""
    doc = " ".join(words)
    starts, ends, toks = K.tokenize(doc)
    # build disjoint token-aligned spans from picked token indices
    idx = sorted({i % len(toks) for i, _ in picks})
    spans1, spans2 = [], []
    for (i, side), ti in zip(picks, idx):
        spans1.append((starts[ti], ends[ti])) if side else spans2.append((starts[ti], ends[ti]))
    fast = K.marked_tokens_from_doc(starts, ends, toks, spans1, spans2)
    assert fast is not None
    marked = K.insert_markers(doc, spans1, spans2)
    for br in (True, False):
        assert K.chunk_tokens(fast, chunk_len, br) == K.chunk_marked_text(marked, chunk_len, br)


def test_marked_tokens_fast_path_rejects_unaligned():
    doc = "alpha beta gamma"
    starts, ends, toks = K.tokenize(doc)
    # span boundary strictly inside the token "beta"
    assert K.marked_tokens_from_doc(starts, ends, toks, [(7, 10)], []) is None
    # overlapping spans
    assert K.marked_tokens_from_doc(starts, ends, toks, [(0, 5)], [(2, 10)]) is None
