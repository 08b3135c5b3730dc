"""Pure deterministic kernels shared by the Spark UDFs and the oracle.

These are the non-relational "model boundary" computations of the pipeline
(SURVEY.md §2.9 K1-K5 plus the sequential scans W2/W3/W5/W6). They are
plain functions over plain Python/numpy data so that:

* the Spark engine can call them inside vectorized Arrow UDFs, and
* the pure-Python oracle (bionext_spark.oracle) can call the *same code*
  on the same inputs, making engine-vs-oracle comparisons exact.

The default "stub" model adapters here are deterministic stand-ins for the
reference's HF checkpoints (reference src/tagger/model/*,
src/extractor/model/*, SapBERT encoders): a longest-match lexicon tagger
emitting the same 13-tag BIO scheme, an md5-seeded unit-vector encoder, and
an md5-seeded relation/novelty logit generator. The surrounding *pipeline
math* — windowing, context stripping, BIO decode with the reference's
O→I rule, span merge, softmax-sum aggregation — is reimplemented faithfully
from the reference (citations inline).
"""

from __future__ import annotations

import hashlib
import math
import re
import struct
from typing import Iterable, Sequence

# ---------------------------------------------------------------------------
# Tokenizer (deterministic stand-in for the HF wordpiece tokenizer, K4).
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def tokenize(text: str) -> tuple[list[int], list[int], list[str]]:
    """Regex word/punct tokenizer with character offsets.

    Returns (starts, ends, tokens); ``text[starts[i]:ends[i]] == tokens[i]``.
    """
    starts: list[int] = []
    ends: list[int] = []
    tokens: list[str] = []
    for m in _TOKEN_RE.finditer(text):
        starts.append(m.start())
        ends.append(m.end())
        tokens.append(m.group())
    return starts, ends, tokens


# ---------------------------------------------------------------------------
# W2 — sliding-window chunking (reference src/data.py:169-258: windows of
# [left ctx | center | right ctx], center stride = max_len - 2*ctx).
# ---------------------------------------------------------------------------


def make_windows(n_tokens: int, max_len: int, ctx: int) -> list[tuple[int, int, int, int]]:
    """Window index plan over a token stream.

    Returns a list of ``(lo, hi, n_left, n_right)`` where tokens[lo:hi] is
    the window content, the first ``n_left`` tokens are left context and the
    last ``n_right`` are right context. Invariant: concatenating the center
    slices of all windows reproduces tokens[0:n_tokens] exactly.
    """
    center = max_len - 2 * ctx
    if center <= 0:
        raise ValueError("max_len must exceed 2*ctx")
    windows: list[tuple[int, int, int, int]] = []
    pos = 0
    while pos < n_tokens or (pos == 0 and n_tokens == 0):
        lo = max(0, pos - ctx)
        n_left = pos - lo
        center_hi = min(pos + center, n_tokens)
        hi = min(center_hi + ctx, n_tokens)
        n_right = hi - center_hi
        windows.append((lo, hi, n_left, n_right))
        pos += center
        if n_tokens == 0:
            break
    return windows


# ---------------------------------------------------------------------------
# Stub tagger (K1 stand-in): longest-match lexicon tagging in BIO space.
# ---------------------------------------------------------------------------


def build_tag_lexicon(entries: Iterable[tuple[str, int]]) -> dict[tuple[str, ...], int]:
    """Compile (surface_text, label_index) entries into a token-tuple map.

    label_index is 0-based into config.ENTITY_LABELS; the emitted BIO ids
    are B = 2*label_index+1, I = 2*label_index+2 (tag 0 = O), matching the
    reference scheme (src/tagger/hf_training.py:102-108).
    """
    lex: dict[tuple[str, ...], int] = {}
    for text, label_idx in entries:
        _, _, toks = tokenize(text.lower())
        if toks:
            lex[tuple(toks)] = label_idx
    return lex


def stub_bio_tags(tokens: Sequence[str], lexicon: dict[tuple[str, ...], int], max_ngram: int = 6) -> list[int]:
    """Deterministic BIO tags: greedy longest match against the lexicon."""
    n = len(tokens)
    lower = [t.lower() for t in tokens]
    tags = [0] * n
    i = 0
    while i < n:
        matched = 0
        for k in range(min(max_ngram, n - i), 0, -1):
            label = lexicon.get(tuple(lower[i : i + k]))
            if label is not None:
                tags[i] = 2 * label + 1
                for j in range(i + 1, i + k):
                    tags[j] = 2 * label + 2
                matched = k
                break
        i += matched if matched else 1
    return tags


# ---------------------------------------------------------------------------
# W5 — BIO decode. Faithful port of the reference decoder semantics
# (src/tagger/decoder.py:19-61), including its two quirks:
#   * an O→I transition STARTS a new span ("since OII is now valid"),
#   * on a span-to-span transition without an O in between, the flushed
#     span takes the NEW token's entity label (curr_label is updated
#     before the flush).
# ---------------------------------------------------------------------------


def decode_bio(
    tags: Sequence[int], starts: Sequence[int], ends: Sequence[int]
) -> list[tuple[int, int, int]]:
    """(tag, start, end) stream → [(span_start, span_end, label_index)]."""
    spans: list[tuple[int, int, int]] = []
    prev = 0
    curr_label = 0
    buf: list[tuple[int, int]] = []
    for tag, s, e in zip(tags, starts, ends):
        norm = tag
        if tag != 0:
            curr_label = (tag - 1) // 2
            norm = tag % 2
            if norm == 0:
                norm = 2  # I
        if norm == 1 or (prev == 0 and norm == 2):
            if buf:
                spans.append((buf[0][0], buf[-1][1], curr_label))
            buf = [(s, e)]
        elif norm == 2:
            buf.append((s, e))
        elif prev != 0 and norm == 0:
            if buf:
                spans.append((buf[0][0], buf[-1][1], curr_label))
            buf = []
        prev = norm
    if buf:
        spans.append((buf[0][0], buf[-1][1], curr_label))
    return spans


# ---------------------------------------------------------------------------
# A3 — overlapping-span merge (reference RangeDict.maybe_merge_annotations,
# src/utils.py:79-100): any chain of character-colliding spans collapses to
# one span [min(starts), max(ends)]. The reference leaves the merged label
# unspecified (a placeholder, src/data.py:147-157); we define it as the
# label of the earliest-starting span in the chain (deterministic).
# ---------------------------------------------------------------------------


def merge_spans(spans: Sequence[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    if not spans:
        return []
    ordered = sorted(spans, key=lambda x: (x[0], x[1]))
    merged: list[list[int]] = [list(ordered[0])]
    for s, e, lbl in ordered[1:]:
        if s < merged[-1][1]:  # character collision (end-exclusive spans)
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e, lbl])
    return [(s, e, lbl) for s, e, lbl in merged]


# ---------------------------------------------------------------------------
# Deterministic hashing / stub encoders (K2/K3 stand-ins).
# ---------------------------------------------------------------------------


def stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big", signed=False)


def _hash_floats(key: str, n: int) -> list[float]:
    """n floats in [-1, 1) derived from an md5 counter stream over key.

    The key is hashed ONCE; the counter stream then runs over its 16-byte
    digest (the earlier form re-hashed the full key — a multi-KB chunk
    text in the classifier stub — per 4 floats, which made stub hashing
    ~25% of the classify kernel's python time). Deterministic as before;
    the pure-python oracle calls this same function, so parity is
    structural."""
    seed = hashlib.md5(key.encode("utf-8")).digest()
    out: list[float] = []
    counter = 0
    while len(out) < n:
        d = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        for u in struct.unpack(">4I", d[:16]):
            out.append(u / 2**31 - 1.0)
            if len(out) == n:
                break
        counter += 1
    return out


def stub_embedding(text: str, dim: int = 16) -> list[float]:
    """Deterministic unit-norm embedding of lowercased text (K2 stand-in).

    Replaces the SapBERT mean-pool encoder (reference
    src/linker/chemicals.py:77-80); lowercasing happens *before* encoding,
    matching the reference's cache key (chemicals.py:74).
    """
    v = _hash_floats("emb\x00" + text.lower(), dim)
    norm = math.sqrt(sum(x * x for x in v)) or 1.0
    return [float(x / norm) for x in v]


def stub_relation_logits(e1: str, e2: str, chunk_text: str) -> tuple[list[float], list[float]]:
    """Deterministic (relation_logits[9], novel_logits[2]) per chunk (K3).

    Stand-in for the BioNExt-Extractor forward pass (reference
    src/extractor/model/modeling_bionextextractor.py:158-217). Varies with
    the marked chunk text so multi-chunk aggregation (A2) is exercised.
    """
    rel = [2.0 * x for x in _hash_floats(f"rel\x00{e1}\x00{e2}\x00{chunk_text}", 9)]
    nov = [2.0 * x for x in _hash_floats(f"nov\x00{e1}\x00{e2}\x00{chunk_text}", 2)]
    return rel, nov


def softmax(xs: Sequence[float]) -> list[float]:
    m = max(xs)
    exps = [math.exp(x - m) for x in xs]
    s = sum(exps)
    return [e / s for e in exps]


def argmax_first(xs: Sequence[float]) -> int:
    """First index of the maximum (np.argmax tie semantics)."""
    best, best_i = None, 0
    for i, x in enumerate(xs):
        if best is None or x > best:
            best, best_i = x, i
    return best_i


# ---------------------------------------------------------------------------
# J6/W6 — pair marker insertion (reference src/extractor/data.py:97-126):
# wrap every mention of entity1 in [s1]…[e1] and entity2 in [s2]…[e2],
# inserting from the last span to the first so earlier offsets stay valid.
# ---------------------------------------------------------------------------


def insert_markers(
    text: str,
    spans1: Sequence[tuple[int, int]],
    spans2: Sequence[tuple[int, int]],
) -> str:
    edits: list[tuple[int, int, str, str]] = [(s, e, "[s1]", "[e1]") for s, e in spans1]
    edits += [(s, e, "[s2]", "[e2]") for s, e in spans2]
    edits.sort(key=lambda x: (x[0], x[1]))
    if all(edits[i][1] <= edits[i + 1][0] for i in range(len(edits) - 1)):
        # disjoint spans (always true post-cleaner): single forward pass,
        # output identical to the reference's reverse insertion but O(n)
        # instead of O(len(text) * n_spans)
        parts: list[str] = []
        pos = 0
        for s, e, open_m, close_m in edits:
            parts += (text[pos:s], open_m, text[s:e], close_m)
            pos = e
        parts.append(text[pos:])
        return "".join(parts)
    # overlapping spans: faithful reverse-order insertion
    # (reference src/extractor/data.py:123-126)
    out = text
    for s, e, open_m, close_m in reversed(edits):
        out = out[:s] + open_m + out[s:e] + close_m + out[e:]
    return out


# ---------------------------------------------------------------------------
# W3 — extractor chunking (reference src/extractor/data.py:342-396):
# fixed-size token chunks, last chunk right-aligned
# (start = min(i*L, max(0, len-L))), chunks lacking a required marker are
# dropped by the caller (P4).
# ---------------------------------------------------------------------------


def chunk_ranges(n_tokens: int, chunk_len: int) -> list[tuple[int, int]]:
    if n_tokens <= 0:
        return [(0, 0)]
    ranges: list[tuple[int, int]] = []
    i = 0
    while True:
        start = min(i * chunk_len, max(0, n_tokens - chunk_len))
        ranges.append((start, min(start + chunk_len, n_tokens)))
        if start + chunk_len >= n_tokens:
            break
        i += 1
    return ranges


_MARKER_TOKEN_RE = re.compile(r"\[[se][12]\]|\w+|[^\w\s]")


def chunk_tokens(toks: list[str], chunk_len: int, both_required: bool) -> list[str]:
    """Chunk a marked token stream. When ``both_required`` (distinct entity
    ids) only chunks containing both a [s1] and a [s2] marker are kept
    (P4, reference src/extractor/data.py:369-376); when the pair is a
    same-id cross-type pair (entity1 == entity2) the reference applies NO
    marker filter and classifies every chunk — mirrored here."""
    chunks: list[str] = []
    for lo, hi in chunk_ranges(len(toks), chunk_len):
        piece = toks[lo:hi]
        if not both_required or ("[s1]" in piece and "[s2]" in piece):
            chunks.append(" ".join(piece))
    return chunks


def chunk_marked_text(marked: str, chunk_len: int, both_required: bool) -> list[str]:
    """Token chunks of a marked pair text. Markers tokenize atomically,
    like the reference's added special tokens
    (src/extractor/data.py:346-356)."""
    return chunk_tokens(_MARKER_TOKEN_RE.findall(marked), chunk_len, both_required)


def _straddles(starts: list[int], ends: list[int], p: int) -> bool:
    """True when char position p falls strictly inside some token."""
    import bisect

    k = bisect.bisect_right(starts, p) - 1
    return k >= 0 and starts[k] < p < ends[k]


def resolve_span_tokens(
    starts: list[int], ends: list[int], s: int, e: int
) -> tuple[int, int] | None:
    """(start, end) char span → (i, j) token-index range for marker
    splicing, or None when a boundary falls strictly inside a token (the
    exactness precondition of marked_tokens_from_doc)."""
    import bisect

    if _straddles(starts, ends, s) or _straddles(starts, ends, e):
        return None
    i = bisect.bisect_left(starts, s)
    j = bisect.bisect_right(ends, e)
    return (i, j) if j >= i else None


_MISSING = object()


def marked_tokens_from_doc(
    starts: list[int],
    ends: list[int],
    tokens: list[str],
    spans1: Sequence[tuple[int, int]],
    spans2: Sequence[tuple[int, int]],
    span_cache: dict | None = None,
) -> list[str] | None:
    """Token stream of ``insert_markers(doc, spans1, spans2)`` WITHOUT
    re-tokenizing the marked string — the classifier kernel tokenizes each
    conversation's doc ONCE and splices marker tokens per pair (the
    re-tokenization regex was ~40% of the kernel's python time; docs are
    shared by many pairs).

    ``span_cache`` (dict, one per conversation) memoizes each distinct
    (start, end) → token-range resolution: entity spans repeat across all
    the pairs that mention the entity, and the per-span bisect/boundary
    checks were ~half this function's time when re-done per pair.

    Exact-equality preconditions, returns None (caller falls back to the
    string path) when violated: spans disjoint and every span boundary on
    a token boundary or whitespace — a boundary strictly inside a token
    would make the marker SPLIT that token in the string form."""
    cache = span_cache if span_cache is not None else {}
    edits: list[tuple[int, int, int, int, str, str]] = []
    for group, om, cm in ((spans1, "[s1]", "[e1]"), (spans2, "[s2]", "[e2]")):
        for s, e in group:
            r = cache.get((s, e), _MISSING)
            if r is _MISSING:
                r = resolve_span_tokens(starts, ends, s, e)
                cache[(s, e)] = r
            if r is None:
                return None
            edits.append((s, e, r[0], r[1], om, cm))
    edits.sort(key=lambda x: (x[0], x[1]))
    for a, b in zip(edits, edits[1:]):
        if a[1] > b[0]:
            return None
    out: list[str] = []
    pos = 0
    for _s, _e, i, j, om, cm in edits:
        out += tokens[pos:i]
        out.append(om)
        out += tokens[i:j]
        out.append(cm)
        pos = j
    out += tokens[pos:]
    return out
