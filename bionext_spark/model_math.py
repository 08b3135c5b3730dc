"""Pure-numpy model-head math for the K1/K3 kernels.

The parts of the reference's transformer heads that are plain math — the
CRF transition constraints + Viterbi decode of the tagger
(reference src/tagger/model/modeling_bionexttagger.py:158-176, 375-450)
and the extractor's type-pair relation-logit mask + marker-index gather
(reference src/extractor/data.py:22-61, 119-121, 360-394;
modeling_bionextextractor.py:58-80, 190-198) — reimplemented on numpy so
they are testable in this image (no torch) and shared verbatim by the HF
adapters when torch IS present: the adapter runs BERT for emissions /
embeddings, this module does the decode/mask/gather.
"""

from __future__ import annotations

import numpy as np

from bionext_spark.config import (
    ENTITY_LABELS,
    N_BIO_TAGS,
    RELATION_LABELS,
    VALID_TYPE_PAIRS,
)

# reference modeling_bionexttagger.py:111
LARGE_NEGATIVE = -1e9
# reference extractor/data.py:169 uses -9e9 for never-seen (type-pair, class)
RELATION_MASK_NEGATIVE = -9e9


# ---------------------------------------------------------------------------
# K1 — CRF transition constraints + Viterbi decode.
#
# Tag layout (config.N_BIO_TAGS = 13): 0 = O, B_k = 2k+1, I_k = 2k+2 for
# k over ENTITY_LABELS — identical to the reference's indexing
# (modeling_bionexttagger.py:163-174 iterates ``i*2+1`` / ``i*2+2``).
# ---------------------------------------------------------------------------


def mask_impossible_transitions(
    start: np.ndarray, end: np.ndarray, trans: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply the reference's structural constraints in place
    (modeling_bionexttagger.py:158-176):

    * a sequence cannot START at any I tag;
    * O cannot transition into any I tag;
    * B_i / I_i cannot transition into I_j for j != i
      (B_i → I_i stays allowed; anything → B / O stays allowed).
    """
    n_ent = (len(start) - 1) // 2
    for i in range(n_ent):
        start[i * 2 + 2] = LARGE_NEGATIVE
        trans[0][i * 2 + 2] = LARGE_NEGATIVE
        for j in range(n_ent):
            if j != i:
                trans[i * 2 + 1][j * 2 + 2] = LARGE_NEGATIVE
                trans[i * 2 + 2][j * 2 + 2] = LARGE_NEGATIVE
    return start, end, trans


def default_crf_params(num_tags: int = N_BIO_TAGS) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-initialized (then constraint-masked) CRF parameters — the
    deterministic stand-in when no trained checkpoint supplies them."""
    start = np.zeros(num_tags)
    end = np.zeros(num_tags)
    trans = np.zeros((num_tags, num_tags))
    return mask_impossible_transitions(start, end, trans)


def crf_viterbi(
    emissions: np.ndarray,  # (seq_len, num_tags)
    start: np.ndarray,
    end: np.ndarray,
    trans: np.ndarray,
) -> list[int]:
    """Single-sequence Viterbi decode, exactly the reference recursion
    (modeling_bionexttagger.py:375-450): score[0] = start + emissions[0];
    step max over previous tag of (score + trans + emission); end
    transitions added before the final argmax; backtrace through history.
    Ties resolve to the LOWEST tag index (numpy argmax first-of-max ==
    torch.max's first-of-max on CPU)."""
    seq_len, num_tags = emissions.shape
    if seq_len == 0:
        return []
    score = start + emissions[0]
    history: list[np.ndarray] = []
    for i in range(1, seq_len):
        # (prev_tag, next_tag) score lattice
        next_score = score[:, None] + trans + emissions[i][None, :]
        indices = next_score.argmax(axis=0)
        score = next_score.max(axis=0)
        history.append(indices)
    score = score + end
    best_last = int(score.argmax())
    best = [best_last]
    for hist in reversed(history):
        best_last = int(hist[best_last])
        best.append(best_last)
    best.reverse()
    return best


def crf_viterbi_batch(
    emission_lists: list[np.ndarray],
    start: np.ndarray,
    end: np.ndarray,
    trans: np.ndarray,
) -> list[list[int]]:
    return [crf_viterbi(np.asarray(e, dtype=np.float64), start, end, trans) for e in emission_lists]


# ---------------------------------------------------------------------------
# K3 — type-pair relation-logit mask + marker-index gather.
# ---------------------------------------------------------------------------

# reference extractor/data.py:31 label2idEntity (canonical names only)
LABEL2ID_ENTITY = {
    "GeneOrGeneProduct": 0,
    "DiseaseOrPhenotypicFeature": 1,
    "ChemicalEntity": 2,
    "SequenceVariant": 3,
    "OrganismTaxon": 4,
    "CellLine": 5,
}


def relation_logit_mask() -> np.ndarray:
    """(6, 6, 9) additive logit mask: 0.0 where the (entity1_type,
    entity2_type) pair can carry a non-negative relation, else -9e9 —
    the engine's deterministic analog of the reference's train-derived
    mask (extractor/data.py:119-121, 169-170: classes observed for a
    type pair get 0, everything else a large negative). Negative_Class
    stays unmasked everywhere so an impossible pair still predicts it."""
    n_rel = len(RELATION_LABELS)
    mask = np.full((6, 6, n_rel), RELATION_MASK_NEGATIVE)
    neg = RELATION_LABELS.index("Negative_Class")
    mask[:, :, neg] = 0.0
    for a, b in VALID_TYPE_PAIRS:
        ia, ib = LABEL2ID_ENTITY[a], LABEL2ID_ENTITY[b]
        mask[ia, ib, :] = 0.0
        mask[ib, ia, :] = 0.0
    return mask


def apply_relation_mask(logits: np.ndarray, e1_type: str, e2_type: str, mask: np.ndarray | None = None) -> np.ndarray:
    """logits + mask[e1][e2] (modeling_bionextextractor.py:190-198)."""
    m = relation_logit_mask() if mask is None else mask
    return np.asarray(logits, dtype=np.float64) + m[LABEL2ID_ENTITY[e1_type], LABEL2ID_ENTITY[e2_type]]


def marker_indexes(input_ids: np.ndarray, marker_ids: set[int]) -> np.ndarray:
    """Positions of the [s1]/[s2]/[e1]/[e2] special tokens in a chunk
    (reference extractor/data.py:360-383, index_type='both')."""
    ids = np.asarray(input_ids)
    hit = np.zeros(ids.shape, dtype=bool)
    for m in marker_ids:
        hit |= ids == m
    return np.where(hit)[0]


def first_subword_emissions(
    word_ids: list[int | None], logits: np.ndarray, n_words: int
) -> np.ndarray:
    """K4 alignment — word-level emission matrix from subword logits.

    The HF adapters tokenize with ``is_split_into_words=True`` over the
    engine's OWN word tokens, so window boundaries and char offsets are
    pinned to the engine tokenizer regardless of the checkpoint's
    wordpiece vocab; each word takes its FIRST subword's logits (the
    reference's BIO head convention). Words truncated away get a zero row
    (decodes to O under zero-init CRF params)."""
    out = np.zeros((n_words, logits.shape[1]))
    seen: set[int] = set()
    for pos, wid in enumerate(word_ids):
        if wid is not None and wid < n_words and wid not in seen:
            out[wid] = logits[pos]
            seen.add(wid)
    return out


try:  # pragma: no cover - scipy optional in this image
    from scipy.special import erf as _erf
except Exception:  # pragma: no cover
    import math as _math

    _erf = np.vectorize(_math.erf)  # exact; head arrays are tiny


def gelu(x: np.ndarray) -> np.ndarray:
    """Exact (erf-based) GELU — torch.nn.GELU(approximate='none')."""
    x = np.asarray(x, dtype=np.float64)
    return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))


def attention_pool_single_query(
    query: np.ndarray,  # (hidden,) — the learned 1×1×H query, squeezed
    embeddings: np.ndarray,  # (batch, markers, hidden) zero-padded
    valid: np.ndarray,  # (batch, markers) bool — False = padding
    in_proj_weight: np.ndarray,  # (3H, H) rows [Wq; Wk; Wv]
    in_proj_bias: np.ndarray,  # (3H,)
    out_proj_weight: np.ndarray,  # (H, H)
    out_proj_bias: np.ndarray,  # (H,)
    num_heads: int,
) -> np.ndarray:
    """Numpy forward of the extractor's pooling layer — a
    torch.nn.MultiheadAttention(batch_first=True) with ONE learned query
    attending over the marker-token embeddings, padding masked out
    (reference modeling_bionextextractor.py:163-196:
    ``MHattention_layer(weight, embeddings, embeddings,
    key_padding_mask=~mask)``). Returns (batch, hidden).

    Raises on a row with zero valid markers: all-(-inf) scores would turn
    the softmax into NaN and the adapter would silently emit NaN logits —
    the same fabricated-output failure mode the adapter refuses for bad
    checkpoints. (Marker-less chunks are filtered engine-side (P4); a row
    reaching here without markers means truncation ate them — a
    configuration error worth failing loudly on.)"""
    if not np.asarray(valid).any(axis=-1).all():
        bad = int(np.flatnonzero(~np.asarray(valid).any(axis=-1))[0])
        raise ValueError(
            f"attention_pool_single_query: batch row {bad} has zero valid "
            "markers (truncated past max_length?) — refusing to emit NaN"
        )
    b, m, h = embeddings.shape
    dh = h // num_heads
    wq, wk, wv = in_proj_weight[:h], in_proj_weight[h : 2 * h], in_proj_weight[2 * h :]
    bq, bk, bv = in_proj_bias[:h], in_proj_bias[h : 2 * h], in_proj_bias[2 * h :]
    q = (query @ wq.T + bq).reshape(num_heads, dh)  # same query for every batch row
    k = embeddings @ wk.T + bk  # (b, m, h)
    v = embeddings @ wv.T + bv
    k = k.reshape(b, m, num_heads, dh).transpose(0, 2, 1, 3)  # (b, nh, m, dh)
    v = v.reshape(b, m, num_heads, dh).transpose(0, 2, 1, 3)
    scores = np.einsum("hd,bhmd->bhm", q, k) / np.sqrt(dh)  # (b, nh, m)
    scores = np.where(valid[:, None, :], scores, -np.inf)
    scores = scores - scores.max(axis=-1, keepdims=True)
    attn = np.exp(scores)
    attn = attn / attn.sum(axis=-1, keepdims=True)
    pooled = np.einsum("bhm,bhmd->bhd", attn, v).reshape(b, h)
    return pooled @ out_proj_weight.T + out_proj_bias


def extractor_head_logits(
    pooled: np.ndarray,  # (batch, hidden) — attention-pooled representation
    fc1_w: np.ndarray, fc1_b: np.ndarray, fc2_w: np.ndarray, fc2_b: np.ndarray,
    fc1_novel_w: np.ndarray | None = None, fc1_novel_b: np.ndarray | None = None,
    fc2_novel_w: np.ndarray | None = None, fc2_novel_b: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Dual classification heads over the pooled representation
    (modeling_bionextextractor.py:198-217): relation = fc2(GELU(fc1(x)))
    → 9 logits; novelty = fc2_novel(GELU(fc1_novel(x))) → 2 logits (None
    when the checkpoint is the no-novel variant)."""
    rel = gelu(pooled @ fc1_w.T + fc1_b) @ fc2_w.T + fc2_b
    if fc1_novel_w is None:
        return rel, None
    nov = gelu(pooled @ fc1_novel_w.T + fc1_novel_b) @ fc2_novel_w.T + fc2_novel_b
    return rel, nov


def train_derived_relation_mask(observed: "list[tuple[int, int, int]]") -> np.ndarray:
    """Per-(type-pair, class) additive mask from observed training triples
    — the reference's real mask shape (extractor/data.py:119-121, 169-170:
    classes ever observed for a type pair get 0, everything else -9e9,
    symmetrized). ``observed`` holds (entity1_idx, entity2_idx, class_idx)
    per training relation. Note the reference runs INFERENCE with
    mask=None (extractor/__init__.py:37); this mask is a training-time /
    optional-prior artifact."""
    n_rel = len(RELATION_LABELS)
    mask = np.full((6, 6, n_rel), RELATION_MASK_NEGATIVE)
    for ia, ib, ic in observed:
        mask[ia, ib, ic] = 0.0
        mask[ib, ia, ic] = 0.0
    return mask


def gather_marker_embeddings(
    embeddings: np.ndarray,  # (batch, tokens, hidden)
    indexes: np.ndarray,  # (batch, max_markers), -1 padded
) -> tuple[np.ndarray, np.ndarray]:
    """Batched gather of the marker-token embeddings with -1 padding →
    (batch, max_markers, hidden) zeros-padded + boolean validity mask —
    numpy form of group_embeddings_by_index
    (modeling_bionextextractor.py:58-80)."""
    b, t, h = embeddings.shape
    idx = np.asarray(indexes)
    valid = idx != -1
    flat = embeddings.reshape(b * t, h)
    offset = (np.arange(b) * t)[:, None]
    sel = np.where(valid, idx + offset, 0)
    out = flat[sel.reshape(-1)].reshape(b, idx.shape[1], h)
    out[~valid] = 0.0
    return out, valid
