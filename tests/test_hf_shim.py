"""Execute the HF adapter forward paths IN-IMAGE via a fake torch /
transformers shim (round-3 verdict ask #3: every
classify_batch/tag_batch/encode_batch body was `pragma: no cover`
because torch is absent, so the K3 head *integration* — checkpoint
tensor extraction, marker-id indexing, numpy-head invocation, padding,
mask application — had zero executed tests).

The shim implements exactly the tensor protocol the adapters use
(`no_grad`, `as_tensor`, `.to/.cpu/.detach/.numpy`, `.mean/.norm`,
tokenizer call + `word_ids` + `add_tokens`) over numpy, registered in
``sys.modules`` so the PRODUCTION adapter code runs unmodified; expected
values are recomputed independently with the already-unit-tested
model_math kernels. Reference being integration-matched:
modeling_bionextextractor.py:43-122."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from bionext_spark import model_math as MM

H = 16  # hidden size — tiny keeps the matmuls readable in failures


class FT:
    """Fake tensor: numpy array + the tensor-protocol surface the
    adapters touch. Every op returns FT so call chains survive."""

    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def to(self, device):
        return self

    def cpu(self):
        return self

    def detach(self):
        return self

    def numpy(self):
        return self.arr

    def mean(self, axis):
        return FT(self.arr.mean(axis=axis))

    def norm(self, p=2, dim=-1, keepdim=False):
        return FT(np.linalg.norm(self.arr, ord=p, axis=dim, keepdims=keepdim))

    def __truediv__(self, o):
        return FT(self.arr / (o.arr if isinstance(o, FT) else o))


class BatchEnc(dict):
    """Tokenizer output: a mapping (so ``model(**enc)`` unpacks) with
    `.to(device)` and the fast-tokenizer `word_ids(i)` accessor."""

    def __init__(self, data, word_ids=None):
        super().__init__(data)
        self._word_ids = word_ids

    def to(self, device):
        return self

    def word_ids(self, i):
        return self._word_ids[i]


class FakeTokenizer:
    """Whitespace tokenizer with an on-demand vocab. Words longer than 8
    chars split into TWO subwords sharing a word_id, so the
    first-subword alignment path is exercised, not just 1:1 mapping."""

    def __init__(self):
        self.vocab = {"[PAD]": 0}

    def _id(self, tok):
        if tok not in self.vocab:
            self.vocab[tok] = len(self.vocab)
        return self.vocab[tok]

    def add_tokens(self, toks, special_tokens=False):
        added = 0
        for t in toks:
            if t not in self.vocab:
                self.vocab[t] = len(self.vocab)
                added += 1
        return added

    def convert_tokens_to_ids(self, toks):
        return [self.vocab.get(t) for t in toks]

    def __len__(self):
        return len(self.vocab)

    def _subwords(self, word):
        if len(word) > 8:
            return [word + "#a", word + "#b"]
        return [word]

    def __call__(
        self,
        texts,
        is_split_into_words=False,
        truncation=True,
        max_length=512,
        padding=True,
        return_tensors="pt",
    ):
        seqs = [list(t) if is_split_into_words else str(t).split() for t in texts]
        ids, wids = [], []
        for words in seqs:
            row_ids, row_wids = [], []
            for wi, w in enumerate(words):
                for sub in self._subwords(w):
                    row_ids.append(self._id(sub))
                    row_wids.append(wi)
            ids.append(row_ids[:max_length])
            wids.append(row_wids[:max_length])
        ml = max((len(r) for r in ids), default=1)
        am = [[1] * len(r) + [0] * (ml - len(r)) for r in ids]
        wids = [r + [None] * (ml - len(r)) for r in wids]
        ids = [r + [0] * (ml - len(r)) for r in ids]
        return BatchEnc(
            {"input_ids": FT(np.array(ids)), "attention_mask": FT(np.array(am))},
            wids,
        )


class Output:
    def __init__(self, hs):
        self.last_hidden_state = FT(hs)

    def __getitem__(self, i):
        if i == 0:
            return self.last_hidden_state
        raise IndexError(i)


class FakeBert:
    """Trunk: hidden state = fixed random embedding of the token id."""

    def __init__(self, seed=0):
        self.E = np.random.RandomState(seed).standard_normal((512, H))

    def hidden(self, ids):
        return self.E[np.asarray(ids) % 512]

    def __call__(self, input_ids=None, attention_mask=None, **kw):
        return Output(self.hidden(input_ids.numpy()))


def _linear(rng, out_dim, in_dim):
    return types.SimpleNamespace(
        weight=FT(rng.standard_normal((out_dim, in_dim))),
        bias=FT(rng.standard_normal(out_dim)),
    )


class FakeRelModel:
    """BertModel-shaped checkpoint carrying the extractor head tensors
    (weight / MHattention_layer / fc1 / fc2 [/ *_novel]) — the state-dict
    shape `_extract_head` pulls numpy weights from."""

    def __init__(self, novel=True, seed=1):
        rng = np.random.RandomState(seed)
        self.bert = FakeBert()
        self.weight = FT(rng.standard_normal((1, 1, H)))
        self.MHattention_layer = types.SimpleNamespace(
            in_proj_weight=FT(rng.standard_normal((3 * H, H))),
            in_proj_bias=FT(rng.standard_normal(3 * H)),
            out_proj=_linear(rng, H, H),
            num_heads=2,
        )
        self.fc1 = _linear(rng, 32, H)
        self.fc2 = _linear(rng, 9, 32)
        if novel:
            self.fc1_novel = _linear(rng, 32, H)
            self.fc2_novel = _linear(rng, 2, 32)
        self.config = types.SimpleNamespace(hidden_size=H)
        self.resized_to = None

    def to(self, device):
        return self

    def eval(self):
        return self

    def resize_token_embeddings(self, n):
        self.resized_to = n


class FakeExtractorClassModel:
    """Published-extractor-class shape: forward(indexes=...) returns the
    (relation, novelty) logits tuple itself; no head attributes."""

    def __init__(self):
        self.config = types.SimpleNamespace(hidden_size=H)
        self.seen_indexes = None
        self.resized_to = None

    def to(self, device):
        return self

    def eval(self):
        return self

    def resize_token_embeddings(self, n):
        self.resized_to = n

    def __call__(self, input_ids=None, attention_mask=None, indexes=None, **kw):
        self.seen_indexes = indexes.numpy().copy()
        b = input_ids.numpy().shape[0]
        rel = np.arange(b * 9, dtype=np.float64).reshape(b, 9)
        nov = np.arange(b * 2, dtype=np.float64).reshape(b, 2)
        return types.SimpleNamespace(logits=(FT(rel), FT(nov)))


class FakeBadModel(FakeExtractorClassModel):
    """Neither head tensors nor a logits tuple — must RAISE."""

    def __call__(self, input_ids=None, attention_mask=None, indexes=None, **kw):
        return types.SimpleNamespace(logits=FT(np.zeros((2, 9))))


class FakeTaggerModel:
    """Token-classification checkpoint with CRF params."""

    NUM_LABELS = 13

    def __init__(self, seed=3):
        rng = np.random.RandomState(seed)
        self.E = np.random.RandomState(0).standard_normal((512, H))
        self.W = rng.standard_normal((H, self.NUM_LABELS))
        start, end, trans = MM.default_crf_params(self.NUM_LABELS)
        self.crf = types.SimpleNamespace(
            start_transitions=FT(start + rng.standard_normal(start.shape) * 0.1),
            end_transitions=FT(end + rng.standard_normal(end.shape) * 0.1),
            transitions=FT(trans + rng.standard_normal(trans.shape) * 0.1),
        )
        self.config = types.SimpleNamespace(num_labels=self.NUM_LABELS)

    def to(self, device):
        return self

    def eval(self):
        return self

    def logits_np(self, ids):
        return self.E[np.asarray(ids) % 512] @ self.W

    def __call__(self, input_ids=None, attention_mask=None, **kw):
        return types.SimpleNamespace(logits=FT(self.logits_np(input_ids.numpy())))


class FakeEncoderModel:
    def __init__(self):
        self.bert = FakeBert(seed=7)
        self.config = types.SimpleNamespace(hidden_size=H)

    def to(self, device):
        return self

    def eval(self):
        return self

    def __call__(self, input_ids=None, attention_mask=None, **kw):
        return Output(self.bert.hidden(input_ids.numpy()))


# --------------------------------------------------------------------------
# The shim: registry-backed fake `torch` + `transformers` in sys.modules.
# --------------------------------------------------------------------------

REGISTRY: dict[str, tuple] = {}
FROM_PRETRAINED_CALLS: list[tuple[str, dict]] = []


class _NoGrad:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def _fake_modules():
    torch_mod = types.ModuleType("torch")
    torch_mod.no_grad = _NoGrad
    torch_mod.as_tensor = lambda x: FT(np.asarray(x))

    tf_mod = types.ModuleType("transformers")

    class _AutoTok:
        @staticmethod
        def from_pretrained(ckpt, **kw):
            return REGISTRY[ckpt][0]

    class _AutoModel:
        @staticmethod
        def from_pretrained(ckpt, **kw):
            FROM_PRETRAINED_CALLS.append((ckpt, kw))
            return REGISTRY[ckpt][1]

    tf_mod.AutoTokenizer = _AutoTok
    tf_mod.AutoModel = _AutoModel
    tf_mod.AutoModelForTokenClassification = _AutoModel
    return torch_mod, tf_mod


@pytest.fixture()
def hf_shim():
    """Install the fakes for one test; restore sys.modules after."""
    saved = {k: sys.modules.get(k) for k in ("torch", "transformers")}
    torch_mod, tf_mod = _fake_modules()
    sys.modules["torch"], sys.modules["transformers"] = torch_mod, tf_mod
    REGISTRY.clear()
    FROM_PRETRAINED_CALLS.clear()
    yield REGISTRY
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


CHUNKS = [
    "the [s1] braf [e1] oncogene binds [s2] tp53 [e2] protein",
    "variant [s1] v600e [e1] of [s2] melanomagenesis [e2] pathways observed",
]


def _expected_head_path(model, tok, chunks, max_length=512):
    """Independent recomputation of classify_batch's head path using the
    tested model_math kernels and raw numpy weights."""
    enc = tok(list(chunks), truncation=True, max_length=max_length, padding=True,
              return_tensors="pt")
    ids = enc["input_ids"].numpy()
    marker_ids = {tok.vocab[m] for m in ("[s1]", "[e1]", "[s2]", "[e2]")}
    idx_lists = [MM.marker_indexes(row, marker_ids) for row in ids]
    max_m = max(len(x) for x in idx_lists)
    indexes = np.full((len(ids), max_m), -1, dtype=np.int64)
    for i, x in enumerate(idx_lists):
        indexes[i, : len(x)] = x
    hidden = model.bert.hidden(ids).astype(np.float64)
    markers, valid = MM.gather_marker_embeddings(hidden, indexes)
    mha = model.MHattention_layer
    pooled = MM.attention_pool_single_query(
        model.weight.arr.reshape(-1), markers, valid,
        mha.in_proj_weight.arr, mha.in_proj_bias.arr,
        mha.out_proj.weight.arr, mha.out_proj.bias.arr, mha.num_heads,
    )
    return MM.extractor_head_logits(
        pooled, model.fc1.weight.arr, model.fc1.bias.arr,
        model.fc2.weight.arr, model.fc2.bias.arr,
        getattr(model, "fc1_novel", None) and model.fc1_novel.weight.arr,
        getattr(model, "fc1_novel", None) and model.fc1_novel.bias.arr,
        getattr(model, "fc2_novel", None) and model.fc2_novel.weight.arr,
        getattr(model, "fc2_novel", None) and model.fc2_novel.bias.arr,
    )


def test_classify_batch_head_tensor_checkpoint(hf_shim):
    """Full classify_batch against a BertModel+head-tensors checkpoint:
    tokenize → marker indexes (-1 padded) → trunk hidden states → numpy
    attention pool → dual heads, equal to the independent recomputation."""
    from bionext_spark.adapters import HFRelationAdapter

    model = FakeRelModel(novel=True)
    hf_shim["rel-ckpt"] = (FakeTokenizer(), model)
    ad = HFRelationAdapter("rel-ckpt")
    got = ad.classify_batch(["braf", "v600e"], ["tp53", "melanomagenesis"], CHUNKS)

    # expected path recomputes with the SAME tokenizer instance (vocab now
    # holds the markers added by ensure_loaded, in the same id order)
    exp_rel, exp_nov = _expected_head_path(model, hf_shim["rel-ckpt"][0], CHUNKS)
    assert len(got) == 2
    for i, (rel, nov) in enumerate(got):
        np.testing.assert_allclose(rel, exp_rel[i], rtol=1e-12)
        np.testing.assert_allclose(nov, exp_nov[i], rtol=1e-12)
    # resize_token_embeddings ran AFTER add_tokens grew the vocab: at load
    # time the fake vocab was [PAD] + the 4 markers (chunk words enter the
    # on-demand vocab only later; a real tokenizer's vocab is fixed)
    assert model.resized_to == 5


def test_classify_batch_no_novel_checkpoint(hf_shim):
    """The no-novel head variant: novelty logits default to zeros."""
    from bionext_spark.adapters import HFRelationAdapter

    model = FakeRelModel(novel=False)
    hf_shim["rel-nonovel"] = (FakeTokenizer(), model)
    got = HFRelationAdapter("rel-nonovel").classify_batch(["a"], ["b"], CHUNKS[:1])
    exp_rel, exp_nov = _expected_head_path(model, hf_shim["rel-nonovel"][0], CHUNKS[:1])
    assert exp_nov is None
    np.testing.assert_allclose(got[0][0], exp_rel[0], rtol=1e-12)
    assert got[0][1] == [0.0, 0.0]


def test_classify_batch_relation_mask_applied(hf_shim):
    """relation_mask + entity types adds mask[e1][e2] to the relation
    logits (modeling_bionextextractor.py:190-198)."""
    from bionext_spark.adapters import HFRelationAdapter

    hf_shim["rel-m"] = (FakeTokenizer(), FakeRelModel())
    mask = MM.relation_logit_mask()
    unmasked = HFRelationAdapter("rel-m").classify_batch(
        ["braf"], ["tp53"], CHUNKS[:1]
    )[0][0]
    hf_shim["rel-m2"] = (FakeTokenizer(), FakeRelModel())
    masked = HFRelationAdapter("rel-m2", relation_mask=mask).classify_batch(
        ["braf"], ["tp53"], CHUNKS[:1],
        e1_types=["GeneOrGeneProduct"], e2_types=["DiseaseOrPhenotypicFeature"],
    )[0][0]
    np.testing.assert_allclose(
        masked, MM.apply_relation_mask(np.array(unmasked), "GeneOrGeneProduct",
                                       "DiseaseOrPhenotypicFeature", mask),
        rtol=1e-12,
    )


def test_classify_batch_extractor_class_checkpoint(hf_shim):
    """Custom-extractor-class checkpoint: the model's own logits tuple is
    used verbatim and the indexes kwarg it receives is the -1-padded
    marker-position matrix."""
    from bionext_spark.adapters import HFRelationAdapter

    model = FakeExtractorClassModel()
    tok = FakeTokenizer()
    hf_shim["ext-ckpt"] = (tok, model)
    got = HFRelationAdapter("ext-ckpt").classify_batch(["a", "b"], ["c", "d"], CHUNKS)
    assert [g[0] for g in got] == [list(np.arange(9.0)), list(np.arange(9.0, 18.0))]
    assert [g[1] for g in got] == [[0.0, 1.0], [2.0, 3.0]]
    # marker indexing: each chunk has 4 markers at the whitespace-token
    # positions the fake tokenizer assigns
    enc = tok(list(CHUNKS), return_tensors="pt")
    marker_ids = {tok.vocab[m] for m in ("[s1]", "[e1]", "[s2]", "[e2]")}
    for i, row in enumerate(enc["input_ids"].numpy()):
        np.testing.assert_array_equal(
            model.seen_indexes[i][model.seen_indexes[i] != -1],
            MM.marker_indexes(row, marker_ids),
        )


def test_classify_batch_unknown_checkpoint_raises(hf_shim):
    """No head tensors AND no logits tuple → RuntimeError, never
    fabricated predictions (round-2 finding, kept closed)."""
    from bionext_spark.adapters import HFRelationAdapter

    hf_shim["bad-ckpt"] = (FakeTokenizer(), FakeBadModel())
    with pytest.raises(RuntimeError, match="refusing to fabricate"):
        HFRelationAdapter("bad-ckpt").classify_batch(["a"], ["b"], CHUNKS[:1])


def test_trust_remote_code_flag_passthrough(hf_shim):
    """ADVICE r3: the constructor flag reaches from_pretrained (default
    False), so auto_map checkpoints are loadable by explicit opt-in."""
    from bionext_spark.adapters import HFRelationAdapter

    hf_shim["t-ckpt"] = (FakeTokenizer(), FakeRelModel())
    HFRelationAdapter("t-ckpt").ensure_loaded()
    HFRelationAdapter("t-ckpt", trust_remote_code=True).ensure_loaded()
    kwargs = [kw for ckpt, kw in FROM_PRETRAINED_CALLS if ckpt == "t-ckpt"]
    assert [k.get("trust_remote_code") for k in kwargs] == [False, True]


def test_tag_batch_matches_numpy_decode(hf_shim):
    """tag_batch end-to-end: checkpoint CRF params are extracted, subword
    logits align to first-subwords (long words split into 2 subwords in
    the fake), and the decode equals direct crf_viterbi."""
    from bionext_spark.adapters import HFTaggerAdapter

    model = FakeTaggerModel()
    tok = FakeTokenizer()
    hf_shim["tag-ckpt"] = (tok, model)
    token_lists = [
        ["the", "extraordinarily", "long", "mutation"],
        ["brca1", "is", "amplified"],
    ]
    got = HFTaggerAdapter("tag-ckpt").tag_batch(token_lists)

    enc = tok([list(t) for t in token_lists], is_split_into_words=True,
              return_tensors="pt")
    logits = model.logits_np(enc["input_ids"].numpy())
    start, end, trans = (
        model.crf.start_transitions.arr, model.crf.end_transitions.arr,
        model.crf.transitions.arr,
    )
    for bi, toks in enumerate(token_lists):
        emis = MM.first_subword_emissions(enc.word_ids(bi), logits[bi], len(toks))
        assert got[bi] == MM.crf_viterbi(emis, start, end, trans)
        assert len(got[bi]) == len(toks)
    # the fake really did exercise multi-subword alignment
    assert any(len(w) > 8 for w in token_lists[0])


def test_encode_batch_mean_pool_l2(hf_shim):
    """encode_batch: mean-pooled last hidden state, L2-normalized
    (reference seq_variant.py:38-57)."""
    from bionext_spark.adapters import HFEncoderAdapter

    model = FakeEncoderModel()
    tok = FakeTokenizer()
    hf_shim["enc-ckpt"] = (tok, model)
    ad = HFEncoderAdapter("enc-ckpt", max_length=25)
    texts = ["braf v600e", "tp53"]
    got = np.array(ad.encode_batch(texts))
    assert ad.dim == H  # picked up from config.hidden_size

    enc = tok(list(texts), padding="max_length", max_length=25, truncation=True,
              return_tensors="pt")
    hs = model.bert.hidden(enc["input_ids"].numpy())
    rep = hs.mean(axis=1)
    rep = rep / np.linalg.norm(rep, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, rep, rtol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-12)
