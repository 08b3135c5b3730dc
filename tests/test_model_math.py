"""K1/K3 model-head math: CRF Viterbi with the reference's transition
constraints, the type-pair relation-logit mask, and the marker gather —
pure numpy, verified against brute force and hand-computed cases
(reference modeling_bionexttagger.py:158-176, 375-450;
extractor/data.py:22-61; modeling_bionextextractor.py:58-80, 190-198)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from bionext_spark import model_math as MM
from bionext_spark.config import NEGATIVE_CLASS, RELATION_LABELS


def _brute_force(emissions, start, end, trans):
    seq_len, n = emissions.shape
    best_score, best_path = -np.inf, None
    for path in itertools.product(range(n), repeat=seq_len):
        s = start[path[0]] + emissions[0][path[0]]
        for i in range(1, seq_len):
            s += trans[path[i - 1]][path[i]] + emissions[i][path[i]]
        s += end[path[-1]]
        if s > best_score:  # strict > == first-of-max tie-break
            best_score, best_path = s, list(path)
    return best_path


def test_viterbi_matches_brute_force_small():
    rng = np.random.RandomState(7)
    start, end, trans = MM.default_crf_params(5)  # 2 entity types: O,B0,I0,B1,I1
    start = start + rng.randn(5)
    end = end + rng.randn(5)
    trans = trans + rng.randn(5, 5)
    MM.mask_impossible_transitions(start, end, trans)
    for _ in range(20):
        T = rng.randint(1, 5)
        emis = rng.randn(T, 5)
        assert MM.crf_viterbi(emis, start, end, trans) == _brute_force(emis, start, end, trans)


def test_viterbi_respects_constraints_under_adversarial_emissions():
    """Even when emissions scream 'I' everywhere, the decode never starts
    at I, never goes O→I, and never crosses I labels."""
    start, end, trans = MM.default_crf_params()
    emis = np.full((6, 13), -5.0)
    emis[:, 2] = 50.0  # I of label 0
    emis[3:, 4] = 60.0  # I of label 1 later
    tags = MM.crf_viterbi(emis, start, end, trans)
    n_ent = 6
    i_tags = {k * 2 + 2 for k in range(n_ent)}
    assert tags[0] not in i_tags
    for a, b in zip(tags, tags[1:]):
        if b in i_tags:
            assert a in (b - 1, b)  # only B_k or I_k may precede I_k


def test_viterbi_hand_case():
    # 3 tags toy (O, B, I with 1 entity type); zero params except blocks
    start, end, trans = MM.default_crf_params(3)
    emis = np.array([[0.0, 1.0, 5.0], [0.0, 0.0, 2.0], [3.0, 0.0, 0.0]])
    # t0: I(5) is blocked at start → B(1). t1: B→I allowed (2). t2: O(3).
    assert MM.crf_viterbi(emis, start, end, trans) == [1, 2, 0]


def test_relation_mask_blocks_invalid_pairs():
    mask = MM.relation_logit_mask()
    logits = np.zeros(len(RELATION_LABELS))
    # invalid pair: OrganismTaxon × CellLine → everything except
    # Negative_Class is -9e9, so argmax must be Negative_Class
    masked = MM.apply_relation_mask(logits, "OrganismTaxon", "CellLine", mask)
    assert int(np.argmax(masked)) == NEGATIVE_CLASS
    # valid pair (both directions): untouched logits
    for a, b in [("ChemicalEntity", "DiseaseOrPhenotypicFeature"),
                 ("DiseaseOrPhenotypicFeature", "ChemicalEntity")]:
        m = MM.apply_relation_mask(logits, a, b, mask)
        assert (m == logits).all()


def test_marker_gather_matches_loop():
    rng = np.random.RandomState(3)
    emb = rng.randn(2, 6, 4)
    idx = np.array([[1, 4, -1], [0, 2, 5]])
    got, valid = MM.gather_marker_embeddings(emb, idx)
    for b in range(2):
        for k in range(3):
            if idx[b, k] == -1:
                assert not valid[b, k] and (got[b, k] == 0).all()
            else:
                assert valid[b, k] and (got[b, k] == emb[b, idx[b, k]]).all()


def test_marker_indexes():
    ids = np.array([5, 9, 7, 9, 8, 3])
    assert MM.marker_indexes(ids, {9, 8}).tolist() == [1, 3, 4]


def test_gelu_known_values():
    # exact erf-based GELU: gelu(0)=0, gelu(1)=0.5·(1+erf(1/√2))
    assert MM.gelu(np.array([0.0]))[0] == 0.0
    assert abs(MM.gelu(np.array([1.0]))[0] - 0.8413447460685429) < 1e-12
    assert abs(MM.gelu(np.array([-1.0]))[0] - (-0.15865525393145707)) < 1e-12


def _manual_single_query_attention(q, emb, valid, num_heads):
    """Reference-by-construction MHA forward with identity projections."""
    b, m, h = emb.shape
    dh = h // num_heads
    out = np.zeros((b, h))
    for bi in range(b):
        for hd in range(num_heads):
            sl = slice(hd * dh, (hd + 1) * dh)
            scores = np.array(
                [
                    q[sl] @ emb[bi, mi, sl] / np.sqrt(dh) if valid[bi, mi] else -np.inf
                    for mi in range(m)
                ]
            )
            w = np.exp(scores - scores[valid[bi]].max())
            w[~valid[bi]] = 0.0
            w = w / w.sum()
            out[bi, sl] = sum(w[mi] * emb[bi, mi, sl] for mi in range(m))
    return out


def test_attention_pool_matches_manual_identity_proj():
    """With identity in/out projections the pool is plain per-head softmax
    attention of the learned query over valid markers — verified against a
    loop-built reference for 1 and 2 heads."""
    rng = np.random.RandomState(11)
    h = 4
    emb = rng.randn(3, 5, h)
    valid = np.array(
        [[True] * 5, [True, True, False, False, False], [True, False, False, False, False]]
    )
    emb[~valid] = 0.0
    q = rng.randn(h)
    eye = np.eye(h)
    in_w = np.vstack([eye, eye, eye])
    in_b = np.zeros(3 * h)
    for num_heads in (1, 2):
        got = MM.attention_pool_single_query(q, emb, valid, in_w, in_b, eye, np.zeros(h), num_heads)
        want = _manual_single_query_attention(q, emb, valid, num_heads)
        assert np.allclose(got, want, atol=1e-12)


def test_attention_pool_hand_case_single_marker():
    """One valid marker → softmax weight 1 → output = out_proj(v(marker))."""
    rng = np.random.RandomState(5)
    h = 4
    emb = np.zeros((1, 3, h))
    emb[0, 1] = rng.randn(h)
    valid = np.array([[False, True, False]])
    in_w = rng.randn(3 * h, h)
    in_b = rng.randn(3 * h)
    out_w = rng.randn(h, h)
    out_b = rng.randn(h)
    q = rng.randn(h)
    got = MM.attention_pool_single_query(q, emb, valid, in_w, in_b, out_w, out_b, 2)
    v = emb[0, 1] @ in_w[2 * h :].T + in_b[2 * h :]
    assert np.allclose(got[0], v @ out_w.T + out_b, atol=1e-10)


def test_attention_pool_padding_invariant():
    """Appending -1-padded (invalid) marker slots never changes the output
    — the key_padding_mask semantics of the reference head."""
    rng = np.random.RandomState(9)
    h = 6
    emb = rng.randn(2, 3, h)
    valid = np.ones((2, 3), dtype=bool)
    in_w, in_b = rng.randn(3 * h, h), rng.randn(3 * h)
    out_w, out_b = rng.randn(h, h), rng.randn(h)
    q = rng.randn(h)
    base = MM.attention_pool_single_query(q, emb, valid, in_w, in_b, out_w, out_b, 3)
    emb_pad = np.concatenate([emb, np.zeros((2, 2, h))], axis=1)
    valid_pad = np.concatenate([valid, np.zeros((2, 2), dtype=bool)], axis=1)
    padded = MM.attention_pool_single_query(q, emb_pad, valid_pad, in_w, in_b, out_w, out_b, 3)
    assert np.allclose(base, padded, atol=1e-12)


def test_extractor_head_logits_hand_case():
    """fc2(GELU(fc1(x))) with hand-picked weights, plus the no-novel path."""
    pooled = np.array([[1.0, -1.0]])
    fc1_w = np.array([[1.0, 0.0], [0.0, 1.0]])  # identity
    fc1_b = np.zeros(2)
    fc2_w = np.array([[2.0, 0.0]])  # picks 2·gelu(x0)
    fc2_b = np.array([0.5])
    rel, nov = MM.extractor_head_logits(pooled, fc1_w, fc1_b, fc2_w, fc2_b)
    assert nov is None
    assert abs(rel[0, 0] - (2 * 0.8413447460685429 + 0.5)) < 1e-12
    rel2, nov2 = MM.extractor_head_logits(
        pooled, fc1_w, fc1_b, fc2_w, fc2_b, fc1_w, fc1_b, fc2_w, fc2_b
    )
    assert np.allclose(rel2, rel) and np.allclose(nov2, rel)


def test_train_derived_relation_mask():
    """Per-(type-pair, class) mask: only observed classes unmask, and the
    pair is symmetrized (reference data.py:119-121, 169-170)."""
    mask = MM.train_derived_relation_mask([(0, 1, 2), (0, 1, 5)])
    assert mask[0, 1, 2] == 0.0 and mask[1, 0, 2] == 0.0
    assert mask[0, 1, 5] == 0.0 and mask[0, 1, 3] == MM.RELATION_MASK_NEGATIVE
    assert mask[2, 3, 2] == MM.RELATION_MASK_NEGATIVE


def test_hf_adapter_classes_import_clean_and_gated():
    """Adapter classes exist and fail with a clear message when torch is
    absent (this image); they must NOT import torch at module import."""
    from bionext_spark import adapters

    assert hasattr(adapters, "HFTaggerAdapter")
    assert hasattr(adapters, "HFEncoderAdapter")
    assert hasattr(adapters, "HFRelationAdapter")
    if not adapters.hf_adapters_available():
        for cls in (adapters.HFTaggerAdapter, adapters.HFEncoderAdapter, adapters.HFRelationAdapter):
            with pytest.raises(RuntimeError, match="torch"):
                cls("some/checkpoint")


def test_attention_pool_refuses_zero_valid_markers():
    """A row whose markers were all truncated away must raise, not emit
    NaN logits (all -inf scores -> NaN softmax)."""
    import numpy as np
    import pytest

    from bionext_spark import model_math as MM

    h, nh = 4, 2
    rng = np.random.default_rng(0)
    args = dict(
        query=rng.normal(size=h),
        embeddings=rng.normal(size=(2, 3, h)),
        in_proj_weight=rng.normal(size=(3 * h, h)),
        in_proj_bias=rng.normal(size=3 * h),
        out_proj_weight=rng.normal(size=(h, h)),
        out_proj_bias=rng.normal(size=h),
        num_heads=nh,
    )
    ok = MM.attention_pool_single_query(
        valid=np.array([[True, False, False], [True, True, False]]), **args
    )
    assert np.isfinite(ok).all()
    with pytest.raises(ValueError, match="zero valid markers"):
        MM.attention_pool_single_query(
            valid=np.array([[True, True, True], [False, False, False]]), **args
        )
