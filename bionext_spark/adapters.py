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


# Byte-for-byte copy of the reference's prompt literal (seq_variant.py:
# 244-261, a triple-quoted string inside a nested function — the trailing
# space after "guidelines.", the 4-space indents, and the dangling
# "    " before the first example line are all part of the bytes a real
# LLM sees; output parity depends on them).
FEWSHOT_PROMPT_HEADER = (
    "As a biomedical expert, your role involves accurately associating "
    "sequence variances with their corresponding identifiers, following "
    "tmVar annotation guidelines. \n"
    "\n"
    "    Key Annotation Rules:\n"
    "\n"
    "    Substitution: <Sequence type>|SUB|<wild type>|<mutation position>|<mutant>\n"
    "    Deletion: <Sequence type>|DEL|<mutation position>|<mutant>\n"
    "    Insertion: <Sequence type>|INS|<mutation position>|<mutant>\n"
    "    Insertion + Deletion (indel/delins): <Sequence type>|INDEL|<mutation position>|<mutant>\n"
    "    Duplication: <Sequence type>|DUP|<mutation position>|<mutant>|<duplication times>\n"
    "    Frame shift: <Sequence type>|FS|<wild type>|<mutation position>|<mutant>|<frame shift position>\n"
    "    Sequence types include DNA (c), RNA (r), Genome (g), Protein (p), and Mitochondrial (m) sequences.\n"
    "\n"
    "    Examples provided for your reference:\n"
    "\n"
    "    "
)


def build_fewshot_prompt(text: str, gene: str, shots) -> str:
    """K5 prompt assembly, VERBATIM to the reference (seq_variant.py:
    244-268): the tmVar-rules header above, one
    'Gene: … Mention: … Code: …\\n' per retrieved example IN RETRIEVAL
    ORDER, then 'Now, complete the last entry:' and the target line.
    ``shots`` is the engine-selected example list (dicts or Rows with
    gene/mention/code) from select_fewshot_examples."""
    parts = [FEWSHOT_PROMPT_HEADER]
    # NOT `shots or []`: the Spark path delivers numpy arrays (Arrow →
    # pandas turns array<struct> cells into ndarray), whose truthiness
    # raises for length >= 2
    for s in (shots if shots is not None else []):
        parts.append(f"Gene: {s['gene']} Mention: {s['mention']} Code: {s['code']}\n")
    parts.append(f"Now, complete the last entry:\nGene: {gene} Mention: {text} Code: ")
    return "".join(parts)


class FewShotPromptLLM:
    """K5 adapter that CONSUMES the engine-selected few-shot examples: the
    dataflow retrieves top-k > threshold examples per distinct text
    (select_fewshot_examples) and ships them as the memo lookup's context
    column; this adapter assembles the reference-shaped prompt and
    delegates to ``complete`` (an LLM completion callable, e.g. an Ollama
    client on a cluster — tests inject a deterministic fake). A real
    adapter therefore never re-implements the retrieval, closing the
    round-2 gap where prompt assembly was adapter-internal."""

    def __init__(self, complete):
        self.complete = complete

    @staticmethod
    def _split(key: str) -> tuple[str, str]:
        text, _, gene = key.partition("\x00")
        return text, gene

    def lookup_batch(self, keys: Sequence[str]) -> list:
        # no context → zero-shot prompts
        return self.lookup_batch_ctx(keys, {"shots": [None] * len(keys)})

    def lookup_batch_ctx(self, keys: Sequence[str], ctx: dict) -> list:
        shots_col = ctx.get("shots", [None] * len(keys))
        out = []
        for key, shots in zip(keys, shots_col):
            text, gene = self._split(key)
            out.append(self.complete(build_fewshot_prompt(text, gene, shots)))
        return out


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
    """K3 — relation+novelty classifier with the REAL extractor head: the
    transformer encodes each marked chunk, the [s1]/[e1]/[s2]/[e2] marker
    embeddings are gathered (model_math.gather_marker_embeddings,
    reference modeling_bionextextractor.py:58-80), pooled by the
    checkpoint's 1-learned-query MultiheadAttention
    (model_math.attention_pool_single_query, :163-196) and classified by
    the dual GELU-MLP heads (model_math.extractor_head_logits, :198-217).
    All head math is the numpy tested in this image; torch only runs BERT.

    Two checkpoint shapes are supported:

    * the published BioNExt extractor class (custom code): its forward
      already returns logits = (relation_logits, novel_logits) — used
      directly. Loading a hub checkpoint whose auto_map points at custom
      code requires ``trust_remote_code=True`` (constructor flag, default
      False — opt in deliberately: remote code executes at load);
    * a plain ``BertModel`` checkpoint carrying the head tensors
      (``weight``, ``MHattention_layer.*``, ``fc1/fc2``,
      ``fc1_novel/fc2_novel``): the numpy head runs on the gathered
      markers.

    Anything else RAISES — no silent hidden-state-slice fallback
    (round-2 review: fabricated logits are worse than an error).

    ``relation_mask``: None (default) matches the reference's INFERENCE
    path, which runs mask-free (extractor/__init__.py:37 loads data with
    mask=None); pass a (6, 6, 9) array (e.g.
    model_math.train_derived_relation_mask of the training observations,
    or relation_logit_mask() for the deterministic pair-level prior) to
    add it to the relation logits."""

    def __init__(
        self,
        checkpoint: str,
        device: str = "cpu",
        max_length: int = 512,
        relation_mask=None,
        trust_remote_code: bool = False,
    ):
        _require_hf("HFRelationAdapter")
        self.checkpoint = checkpoint
        self.device = device
        self.max_length = max_length
        self.relation_mask = relation_mask
        self.trust_remote_code = trust_remote_code
        self._model = None
        self._tok = None
        self._marker_ids: set[int] | None = None
        self._head = None  # numpy head weights, or None → model returns logits

    MARKERS = ["[s1]", "[e1]", "[s2]", "[e2]"]

    def ensure_loaded(self):  # pragma: no cover - needs torch
        if self._model is None:
            from transformers import AutoModel, AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(self.checkpoint)
            added = self._tok.add_tokens(self.MARKERS, special_tokens=True)
            self._model = AutoModel.from_pretrained(
                self.checkpoint, trust_remote_code=self.trust_remote_code
            ).to(self.device).eval()
            if added:
                # new marker rows must exist in the embedding matrix or
                # indexing is out of range (reference training_mode
                # resizes via config.update_vocab)
                self._model.resize_token_embeddings(len(self._tok))
            self._marker_ids = {
                i for i in self._tok.convert_tokens_to_ids(self.MARKERS) if i is not None
            }
            self._head = self._extract_head(self._model)
        return self._model, self._tok

    @staticmethod
    def _extract_head(model):  # pragma: no cover - needs torch
        """Pull the attention-pool + dual-head tensors out of the
        checkpoint as numpy, or None if the model computes logits itself."""
        import numpy as np

        need = ["weight", "MHattention_layer", "fc1", "fc2"]
        if not all(hasattr(model, n) for n in need):
            return None

        def t2n(t):
            return t.detach().cpu().numpy().astype(np.float64)

        mha = model.MHattention_layer
        head = {
            "query": t2n(model.weight).reshape(-1),
            "in_w": t2n(mha.in_proj_weight),
            "in_b": t2n(mha.in_proj_bias),
            "out_w": t2n(mha.out_proj.weight),
            "out_b": t2n(mha.out_proj.bias),
            "num_heads": int(mha.num_heads),
            "fc1_w": t2n(model.fc1.weight), "fc1_b": t2n(model.fc1.bias),
            "fc2_w": t2n(model.fc2.weight), "fc2_b": t2n(model.fc2.bias),
        }
        if hasattr(model, "fc1_novel"):
            head.update(
                fc1_novel_w=t2n(model.fc1_novel.weight), fc1_novel_b=t2n(model.fc1_novel.bias),
                fc2_novel_w=t2n(model.fc2_novel.weight), fc2_novel_b=t2n(model.fc2_novel.bias),
            )
        return head

    def _encoder(self, model):  # pragma: no cover - needs torch
        """The BERT trunk: model.bert for the extractor classes, the model
        itself for a plain BertModel checkpoint."""
        return getattr(model, "bert", model)

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
        ids = enc["input_ids"].cpu().numpy()
        idx_lists = [MM.marker_indexes(row, self._marker_ids) for row in ids]
        max_m = max((len(x) for x in idx_lists), default=0) or 1
        indexes = np.full((len(ids), max_m), -1, dtype=np.int64)
        for i, x in enumerate(idx_lists):
            indexes[i, : len(x)] = x

        with torch.no_grad():
            if self._head is None:
                # custom extractor class: forward(indexes=...) returns the
                # (relation, novelty) logit tuple itself
                out = model(
                    **enc, indexes=torch.as_tensor(indexes).to(self.device)
                )
                logits = getattr(out, "logits", out)
                if not (isinstance(logits, (tuple, list)) and len(logits) == 2):
                    raise RuntimeError(
                        "HFRelationAdapter: checkpoint is neither a BioNExt "
                        "extractor (logits tuple) nor a BertModel with head "
                        "tensors (weight/MHattention_layer/fc1/fc2) — refusing "
                        "to fabricate predictions from hidden states"
                    )
                rel = logits[0].cpu().numpy().reshape(len(ids), -1)
                nov = logits[1].cpu().numpy().reshape(len(ids), -1)
            else:
                hidden = self._encoder(model)(**enc).last_hidden_state.cpu().numpy()
                markers, valid = MM.gather_marker_embeddings(
                    hidden.astype(np.float64), indexes
                )
                h = self._head
                pooled = MM.attention_pool_single_query(
                    h["query"], markers, valid, h["in_w"], h["in_b"],
                    h["out_w"], h["out_b"], h["num_heads"],
                )
                rel, nov = MM.extractor_head_logits(
                    pooled, h["fc1_w"], h["fc1_b"], h["fc2_w"], h["fc2_b"],
                    h.get("fc1_novel_w"), h.get("fc1_novel_b"),
                    h.get("fc2_novel_w"), h.get("fc2_novel_b"),
                )
                if nov is None:
                    nov = np.zeros((len(ids), 2))

        results = []
        for i in range(len(chunks)):
            r = rel[i]
            if self.relation_mask is not None and e1_types is not None and e2_types is not None:
                r = MM.apply_relation_mask(r, e1_types[i], e2_types[i], self.relation_mask)
            results.append((list(map(float, r)), list(map(float, nov[i]))))
        return results
