"""Pluggable model adapters (K1/K2/K3 hosts).

The reference loads HF checkpoints eagerly into one GPU process
(src/tagger/__init__.py:59-82, src/extractor/__init__.py:40-57). Here a
model is an *adapter object* captured by the stage's Arrow UDF; executors
deserialize it once per python worker and reuse it across batches
(executor-local singleton via ``ensure_loaded``).

The default adapters are the deterministic stubs from
``bionext_spark.kernels`` — pure functions, no model weights — so tests
and the DuckDB/pure-Python oracles can reproduce the engine bit-for-bit.
Real transformer adapters plug in behind the same interface; they are
gated on torch/transformers being importable (not present in this image).
"""

from __future__ import annotations

from typing import Protocol, Sequence

from bionext_spark import kernels as K


class TaggerAdapter(Protocol):
    def tag_batch(self, token_lists: Sequence[Sequence[str]]) -> list[list[int]]: ...


class EncoderAdapter(Protocol):
    dim: int

    def encode_batch(self, texts: Sequence[str]) -> list[list[float]]: ...


class RelationAdapter(Protocol):
    def classify_batch(
        self,
        e1: Sequence[str],
        e2: Sequence[str],
        chunks: Sequence[str],
        e1_types: Sequence[str] | None = None,
        e2_types: Sequence[str] | None = None,
    ) -> list[tuple[list[float], list[float]]]: ...


class StubLexiconTagger:
    """Deterministic K1 stand-in: greedy longest-match BIO tagging."""

    def __init__(self, entries: Sequence[tuple[str, int]], max_ngram: int = 6):
        self.entries = list(entries)
        self.max_ngram = max_ngram
        self._lex: dict | None = None

    def ensure_loaded(self) -> dict:
        if self._lex is None:
            self._lex = K.build_tag_lexicon(self.entries)
        return self._lex

    def tag_batch(self, token_lists):
        lex = self.ensure_loaded()
        return [K.stub_bio_tags(toks, lex, self.max_ngram) for toks in token_lists]


class StubEncoder:
    """Deterministic K2 stand-in (md5-seeded unit vectors)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def encode_batch(self, texts):
        return [K.stub_embedding(t, self.dim) for t in texts]


class StubRelationClassifier:
    """Deterministic K3 stand-in (md5-seeded relation/novelty logits)."""

    def classify_batch(self, e1, e2, chunks, e1_types=None, e2_types=None):
        return [K.stub_relation_logits(a, b, c) for a, b, c in zip(e1, e2, chunks)]


class StubLitVarAdapter:
    """Deterministic S8 stand-in: the LitVar autocomplete REST call
    (reference src/linker/seq_variant.py:120-129) as a pure function of the
    '<cleaned mention> <gene symbol>' key; plugs into MemoizedLookup."""

    def lookup_batch(self, keys):
        from bionext_spark.synth import fake_litvar_response

        return [fake_litvar_response(k) for k in keys]


class StubLLMAdapter:
    """Deterministic K5 stand-in: the few-shot LLM variant normalizer
    (reference seq_variant.py:233-305) as a pure function of the
    '<amino-converted mention>\\x00<gene>' key; the raw model text is
    memoized, F5 scrub + F4 rewrite run downstream in the dataflow."""

    def lookup_batch(self, keys):
        from bionext_spark.synth import fake_llm_response

        return [fake_llm_response(k) for k in keys]


def hf_adapters_available() -> bool:
    try:  # pragma: no cover - torch/transformers not in this image
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except Exception:
        return False


def _require_hf(who: str) -> None:
    if not hf_adapters_available():
        raise RuntimeError(
            f"{who} needs torch+transformers (not in this image); "
            "use the deterministic stub adapters instead, or install the "
            "extras on the cluster and pass the checkpoint path."
        )


class HFTaggerAdapter:
    """K1 — real BERT+CRF tagger (reference
    src/tagger/model/modeling_bionexttagger.py:18-60): the transformer
    supplies per-token emissions; the constraint-masked Viterbi decode is
    the shared numpy kernel (bionext_spark.model_math.crf_viterbi), so the
    decode math tested in this image is exactly what runs under torch.

    Executors deserialize the adapter once per python worker; the model
    loads lazily on first batch (``ensure_loaded``), mirroring the
    reference's eager single-GPU load (src/tagger/__init__.py:59-82) but
    per-executor."""

    def __init__(self, checkpoint: str, device: str = "cpu", max_length: int = 512):
        _require_hf("HFTaggerAdapter")
        self.checkpoint = checkpoint
        self.device = device
        self.max_length = max_length
        self._model = None
        self._tok = None

    def ensure_loaded(self):  # pragma: no cover - needs torch
        if self._model is None:
            from transformers import AutoModelForTokenClassification, AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(self.checkpoint)
            self._model = AutoModelForTokenClassification.from_pretrained(
                self.checkpoint
            ).to(self.device).eval()
        return self._model, self._tok

    def _crf_params(self, model):  # pragma: no cover - needs torch
        """Use the checkpoint's CRF transitions when it carries them
        (reference BioNExtTaggerModel exposes crf.{start_,end_,}transitions);
        otherwise the zero-init constraint-masked defaults."""
        import numpy as np

        from bionext_spark import model_math as MM

        crf = getattr(model, "crf", None)
        if crf is not None:
            return (
                crf.start_transitions.detach().cpu().numpy(),
                crf.end_transitions.detach().cpu().numpy(),
                crf.transitions.detach().cpu().numpy(),
            )
        return MM.default_crf_params(model.config.num_labels)

    def tag_batch(self, token_lists):  # pragma: no cover - needs torch
        import torch

        from bionext_spark import model_math as MM

        model, tok = self.ensure_loaded()
        enc = tok(
            [list(t) for t in token_lists],
            is_split_into_words=True,
            truncation=True,
            max_length=self.max_length,
            padding=True,
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            logits = model(**enc).logits.cpu().numpy()
        start, end, trans = self._crf_params(model)
        out: list[list[int]] = []
        for bi, toks in enumerate(token_lists):
            emis = MM.first_subword_emissions(enc.word_ids(bi), logits[bi], len(toks))
            out.append(MM.crf_viterbi(emis, start, end, trans))
        return out


class HFEncoderAdapter:
    """K2 — SapBERT-style encoder (reference
    src/linker/seq_variant.py:38-57 / chemicals.py:59-70): mean-pooled
    last hidden state, L2-normalized, max_length 25."""

    dim = 768

    def __init__(self, checkpoint: str, device: str = "cpu", max_length: int = 25):
        _require_hf("HFEncoderAdapter")
        self.checkpoint = checkpoint
        self.device = device
        self.max_length = max_length
        self._model = None
        self._tok = None

    def ensure_loaded(self):  # pragma: no cover - needs torch
        if self._model is None:
            from transformers import AutoModel, AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(self.checkpoint)
            self._model = AutoModel.from_pretrained(self.checkpoint).to(self.device).eval()
            self.dim = self._model.config.hidden_size
        return self._model, self._tok

    def encode_batch(self, texts):  # pragma: no cover - needs torch
        import torch

        model, tok = self.ensure_loaded()
        enc = tok(
            list(texts),
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            rep = model(**enc)[0].mean(axis=1)
            rep = rep / rep.norm(p=2, dim=-1, keepdim=True)
        return rep.cpu().numpy().tolist()


class HFRelationAdapter:
    """K3 — relation+novelty classifier. The transformer encodes each
    marked chunk; the marker-token gather and the type-pair logit mask are
    the shared numpy kernels (model_math.gather_marker_embeddings /
    apply_relation_mask — reference extractor/data.py:360-394,
    modeling_bionextextractor.py:58-80, 190-198). Expects a checkpoint
    exporting (relation_logits, novel_logits) per chunk, e.g. the
    published BioNExt extractor."""

    def __init__(self, checkpoint: str, device: str = "cpu", max_length: int = 512):
        _require_hf("HFRelationAdapter")
        self.checkpoint = checkpoint
        self.device = device
        self.max_length = max_length
        self._model = None
        self._tok = None

    def ensure_loaded(self):  # pragma: no cover - needs torch
        if self._model is None:
            from transformers import AutoModel, AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(self.checkpoint)
            self._tok.add_tokens(["[s1]", "[e1]", "[s2]", "[e2]"], special_tokens=True)
            self._model = AutoModel.from_pretrained(
                self.checkpoint, trust_remote_code=False
            ).to(self.device).eval()
        return self._model, self._tok

    def classify_batch(
        self, e1, e2, chunks, e1_types=None, e2_types=None
    ):  # pragma: no cover - needs torch
        import numpy as np
        import torch

        from bionext_spark import model_math as MM

        model, tok = self.ensure_loaded()
        enc = tok(
            list(chunks),
            truncation=True,
            max_length=self.max_length,
            padding=True,
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            out = model(**enc)
        rel = out[0].cpu().numpy() if isinstance(out, tuple) else out.last_hidden_state[:, 0, :9].cpu().numpy()
        nov = out[1].cpu().numpy() if isinstance(out, tuple) else np.zeros((len(chunks), 2))
        mask = MM.relation_logit_mask()
        results = []
        for i in range(len(chunks)):
            r = rel[i]
            if e1_types is not None and e2_types is not None:
                # O6 — additive type-pair logit mask (data.py:386,
                # modeling_bionextextractor.py:190-198)
                r = MM.apply_relation_mask(r, e1_types[i], e2_types[i], mask)
            results.append((list(map(float, r)), list(map(float, nov[i]))))
        return results
