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
        self, e1: Sequence[str], e2: Sequence[str], chunks: Sequence[str]
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

    def classify_batch(self, e1, e2, chunks):
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
