"""Pure-Python oracle for the KG pipeline.

Implements the reference BioNExt pipeline semantics end-to-end over plain
Python rows (the same fixtures the Spark engine reads), reusing the exact
kernel functions from bionext_spark.kernels at the model boundaries. Tests
compare the Spark engine's stage tables against this oracle row-for-row.

Faithfulness notes (citations into /root/reference):
* cascade = first non-empty lookup wins (src/linker/chemicals.py:96-111)
* majority vote = per-document support counts over exploded candidate
  lists; per mention pick max count, ties → first candidate in list order
  (chemicals.py:119-135, Python ``max`` keeps the first maximum)
* taxonomy: raw-text train match, lowercased KB match, manual id
  correction applied to the vote winner (taxonomy.py:53-91)
* genes: nearest linked organism anchor with strict ``<`` (first-in-doc
  tie-break), default ('9606', 0) when no organism exists; per-taxon
  train → per-taxon KB → per-taxon embeddings (which yield '-' when below
  threshold, short-circuiting the backup hop) → all-taxa backup KB
  (genes.py:107-160)
* cleaner drops '-' and renumbers with one per-document counter
  (cleaner.py:5-30)
* pair gen: distinct (identifier, type) combinations filtered by the
  bidirectional type mask (extractor/data.py:40-94); at inference every
  valid pair is a candidate
* marker insertion: first matching comma-part decides entity order;
  reverse span-order edits (extractor/data.py:97-126)
* aggregation: per-chunk argmax != 8 filter, comma-part cross product,
  elementwise sum of softmax(relation logits) + raw novel logits, argmax,
  final != 8 filter (extractor/__init__.py:70-133)

Deterministic divergences from the reference (it iterates ``set``s whose
order is unstable): candidate lists from multi-id KB hits are ordered by
lexicon rank; pair enumeration is ordered by (type, id).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any

from bionext_spark import kernels as K
from bionext_spark.functions import text as TF
from bionext_spark.config import (
    DEFAULT_CONFIG,
    DEFAULT_TAX_ID,
    ENTITY_LABELS,
    NEGATIVE_CLASS,
    RELATION_LABELS,
    TAXONOMY_ID_CORRECTIONS,
    VALID_TYPE_PAIRS,
    PipelineConfig,
)

# ---------------------------------------------------------------------------
# Stage 0 — conversation assembly (F7/W1).
# ---------------------------------------------------------------------------


def assemble(transcripts: list[dict[str, Any]]) -> dict[str, dict[str, Any]]:
    by_conv: dict[str, list[dict[str, Any]]] = defaultdict(list)
    for row in transcripts:
        by_conv[row["conv_id"]].append(row)
    out: dict[str, dict[str, Any]] = {}
    for conv_id, turns in by_conv.items():
        turns.sort(key=lambda r: r["turn_idx"])
        texts = [t["text"] for t in turns]
        doc = " ".join(texts)
        offsets, pos = [], 0
        for t in texts:
            offsets.append(pos)
            pos += len(t) + 1
        out[conv_id] = {
            "conv_id": conv_id,
            "doc_text": doc,
            "n_turns": len(turns),
            "turn_offsets": offsets,
            "turn_lengths": [len(t) for t in texts],
        }
    return out


def turn_of(offsets: list[int], start: int) -> int:
    ti = 0
    for i, o in enumerate(offsets):
        if o <= start:
            ti = i
        else:
            break
    return ti


# ---------------------------------------------------------------------------
# Stage 1 — tagger (W2 → K1 stub → W1 reassembly → W5 decode → A3 merge).
# ---------------------------------------------------------------------------


def tag(
    conversations: dict[str, dict[str, Any]],
    tag_lexicon: dict[tuple[str, ...], int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict[str, Any]]:
    mentions: list[dict[str, Any]] = []
    for conv_id in sorted(conversations):
        doc = conversations[conv_id]["doc_text"]
        starts, ends, tokens = K.tokenize(doc)
        all_tags: list[int] = []
        all_starts: list[int] = []
        all_ends: list[int] = []
        for lo, hi, n_left, n_right in K.make_windows(len(tokens), cfg.max_seq_len, cfg.context_size):
            wtags = K.stub_bio_tags(tokens[lo:hi], tag_lexicon)
            c0, c1 = n_left, (hi - lo) - n_right
            all_tags.extend(wtags[c0:c1])
            all_starts.extend(starts[lo + c0 : lo + c1])
            all_ends.extend(ends[lo + c0 : lo + c1])
        spans = K.decode_bio(all_tags, all_starts, all_ends)
        spans = K.merge_spans(spans)
        for mid, (s, e, lbl) in enumerate(sorted(spans, key=lambda x: (x[0], x[1]))):
            mentions.append(
                {
                    "conv_id": conv_id,
                    "mention_id": mid,
                    "label": ENTITY_LABELS[lbl],
                    "start": s,
                    "end": e,
                    "text": doc[s:e],
                    "turn_idx": turn_of(conversations[conv_id]["turn_offsets"], s),
                }
            )
    return mentions


# ---------------------------------------------------------------------------
# Stage 2 — linker cascades + majority vote (J1/J2/J3/J4, A1, P2).
# ---------------------------------------------------------------------------


def _majority_vote(
    per_mention_candidates: dict[int, list[str]], corrections: dict[str, str] | None = None
) -> dict[int, str]:
    counts: dict[str, int] = defaultdict(int)
    for cands in per_mention_candidates.values():
        for c in cands:
            counts[c] += 1
    winners: dict[int, str] = {}
    for mid, cands in per_mention_candidates.items():
        best = max(cands, key=lambda c: counts[c])  # first max wins
        if corrections:
            best = corrections.get(best, best)
        winners[mid] = best
    return winners


class Lexicons:
    """Indexes over the synth lexicon rows, mirroring the reference's
    in-memory dicts (train memory, KB dicts, embedding matrices)."""

    def __init__(
        self,
        concepts: list[dict[str, Any]],
        genes: list[dict[str, Any]],
        train: list[dict[str, Any]],
        variants: list[dict[str, Any]],
        dim: int = 16,
        gene_symbols: list[dict[str, Any]] | None = None,
    ):
        self.dim = dim
        # J8 — gene_lookup.json analog (seq_variant.py:312-313)
        self.gene_symbols: dict[str, str] = {
            r["gene_id"]: r["symbol"] for r in (gene_symbols or [])
        }
        self.train: dict[tuple[str, str | None, str], list[str]] = defaultdict(list)
        for r in sorted(train, key=lambda r: r["rank"]):
            self.train[(r["label"], r.get("tax_id"), r["text_key"])].append(r["linked_id"])
        self.taxonomy_kb: dict[str, list[str]] = defaultdict(list)
        self.emb_kb: dict[str, list[tuple[str, list[float]]]] = defaultdict(list)
        for r in concepts:
            if r["kb"] == "taxonomy":
                self.taxonomy_kb[r["text"]].append(r["id"])
            if r.get("embedding") is not None:
                self.emb_kb[r["kb"]].append((r["id"], r["embedding"]))
        self.genes_kb: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
        self.backup_genes: dict[str, list[str]] = defaultdict(list)
        for r in genes:
            self.genes_kb[r["tax_id"]][r["alias"]].append(r["gene_id"])
            self.backup_genes[r["alias"]].append(r["gene_id"])
        self.variants: dict[str, str] = {r["mention"]: r["identifier"] for r in variants}
        self.kb_class: dict[str, str] = {}
        for r in concepts:
            self.kb_class[r["kb"]] = r["class"]

    def embedding_lookup(self, text: str, kbs: list[str], threshold: float) -> list[str]:
        """K2+J3: encode lowercased text, best match per KB file above the
        threshold, then best across files (chemicals.py:71-94)."""
        emb = K.stub_embedding(text, self.dim)
        best: list[tuple[float, str, str]] = []
        for kb in sorted(kbs):
            rows = self.emb_kb.get(kb, [])
            if not rows:
                continue
            scores = [sum(a * b for a, b in zip(emb, e)) for _, e in rows]
            mi = K.argmax_first(scores)
            if scores[mi] > threshold:
                best.append((scores[mi], kb, rows[mi][0]))
        if not best:
            return []
        top = max(best, key=lambda x: x[0])
        return [top[2]]


def link(
    mentions: list[dict[str, Any]],
    lex: Lexicons,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    litvar_fn: Any = None,
    llm_fn: Any = None,
) -> list[dict[str, Any]]:
    by_conv: dict[str, list[dict[str, Any]]] = defaultdict(list)
    for m in mentions:
        by_conv[m["conv_id"]].append(m)

    out: list[dict[str, Any]] = []
    for conv_id in sorted(by_conv):
        ms = sorted(by_conv[conv_id], key=lambda m: m["mention_id"])
        cands: dict[int, list[str]] = {}
        methods: dict[int, str] = {}

        # --- taxonomy (taxonomy.py:69-92) ---
        for m in (x for x in ms if x["label"] == "OrganismTaxon"):
            if (c := lex.train.get(("OrganismTaxon", None, m["text"]))) is not None:
                cands[m["mention_id"]], methods[m["mention_id"]] = list(c), "train"
            elif (c := lex.taxonomy_kb.get(m["text"].lower())) :
                cands[m["mention_id"]], methods[m["mention_id"]] = list(c), "kb"
        tax_win = _majority_vote(
            {k: v for k, v in cands.items()}, TAXONOMY_ID_CORRECTIONS
        )

        # linked organisms in span order → anchors for gene linking
        org_anchors: list[tuple[str, int]] = [
            (tax_win[m["mention_id"]], m["start"])
            for m in ms
            if m["label"] == "OrganismTaxon" and m["mention_id"] in tax_win
        ]

        # --- chemicals / diseases / cells (chemicals.py:96-135 pattern) ---
        flat_casc = {
            "ChemicalEntity": ["mesh"],
            "DiseaseOrPhenotypicFeature": ["ctd"],
            "CellLine": ["cellosaurus"],
        }
        per_label_cands: dict[str, dict[int, list[str]]] = defaultdict(dict)
        for m in ms:
            lbl = m["label"]
            if lbl in flat_casc:
                c = lex.train.get((lbl, None, m["text"].lower()))
                if c:
                    per_label_cands[lbl][m["mention_id"]] = list(c)
                    methods[m["mention_id"]] = "train"
                else:
                    c2 = lex.embedding_lookup(m["text"], flat_casc[lbl], cfg.similarity_threshold)
                    if c2:
                        per_label_cands[lbl][m["mention_id"]] = c2
                        methods[m["mention_id"]] = "embedding"

        # --- genes (genes.py:107-160) ---
        gene_cands: dict[int, list[str]] = {}
        for m in (x for x in ms if x["label"] == "GeneOrGeneProduct"):
            usable = [(t, s) for t, s in org_anchors if t in lex.genes_kb]
            if usable:
                nearest = min(usable, key=lambda o: abs(m["start"] - o[1]))[0]
            else:
                nearest = DEFAULT_TAX_ID
            key = m["text"].lower()
            pred: list[str] = []
            method = None
            if (c := lex.train.get(("GeneOrGeneProduct", nearest, key))) :
                pred, method = list(c), "train"
            elif (c := lex.genes_kb.get(nearest, {}).get(key)) :
                pred, method = list(dict.fromkeys(c)), "kb"
            elif f"gene_{nearest}" in lex.emb_kb:
                hit = lex.embedding_lookup(key, [f"gene_{nearest}"], cfg.similarity_threshold)
                pred, method = (hit if hit else ["-"]), "embedding"
            elif (c := lex.backup_genes.get(key)) :
                pred, method = list(dict.fromkeys(c)), "backup"
            if pred:
                gene_cands[m["mention_id"]] = pred
                methods[m["mention_id"]] = method

        # --- sequence variants: train → rs-prefix → lexicon → LitVar → LLM
        # (deep hops: seq_variant.py:376-505, enabled when the external
        # adapters are configured — mirrors run_linker exactly) ---
        gene_win = _majority_vote(gene_cands)
        deep = lex.gene_symbols and (litvar_fn is not None or llm_fn is not None)
        # J4 variant flavor: nearest gene MENTION (linked or not — the
        # reference iterates ALL gene entities, :388-404; an unlinked
        # nearest gene anchors with id '-'); strict < keeps the earliest
        # gene in document order on ties
        gene_anchors = [
            (gene_win.get(m["mention_id"], "-"), m["start"], m["mention_id"])
            for m in ms
            if m["label"] == "GeneOrGeneProduct"
        ]
        var_cands: dict[int, list[str]] = {}
        for m in (x for x in ms if x["label"] == "SequenceVariant"):
            key = m["text"].lower()
            if (c := lex.train.get(("SequenceVariant", None, key))) :
                var_cands[m["mention_id"]], methods[m["mention_id"]] = list(c), "train"
            elif key.startswith("rs"):
                var_cands[m["mention_id"]], methods[m["mention_id"]] = [key], "rsid"
            elif key in lex.variants:
                var_cands[m["mention_id"]], methods[m["mention_id"]] = [lex.variants[key]], "lexicon"
            elif deep:
                gene_id = (
                    min(gene_anchors, key=lambda g: (abs(m["start"] - g[1]), g[2]))[0]
                    if gene_anchors
                    else None
                )
                symbol = lex.gene_symbols.get(gene_id) if gene_id is not None else None
                got: str | None = None
                if litvar_fn is not None and symbol is not None:
                    # S8: key = '<F2-cleaned mention> <symbol>' (:419-444)
                    got = litvar_fn(f"{TF.clean_variant_mention(m['text'])} {symbol}")
                if got:
                    var_cands[m["mention_id"]] = got.split(",")
                    methods[m["mention_id"]] = "litvar"
                elif llm_fn is not None:
                    # K5: cleaned text only when gene_lookup resolved (:426)
                    llm_text = (
                        TF.clean_variant_mention(m["text"]) if symbol is not None else m["text"]
                    )
                    llm_gene = symbol or gene_id or "-"
                    raw = llm_fn(f"{TF.convert_amino_acids(llm_text)}\x00{llm_gene}")
                    pred = TF.rewrite_sub_allele(TF.scrub_llm_output(raw))
                    var_cands[m["mention_id"]] = [pred]
                    methods[m["mention_id"]] = "llm"

        winners: dict[int, str] = dict(tax_win)
        for lbl_cands in per_label_cands.values():
            winners.update(_majority_vote(lbl_cands))
        winners.update(gene_win)
        winners.update(_majority_vote(var_cands))

        for m in ms:
            lid = winners.get(m["mention_id"], "-")
            out.append({**m, "linked_id": lid, "method": methods.get(m["mention_id"]) if lid != "-" else None})
    return out


def clean(links: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """P2 — drop unlinked, renumber per conversation in span order
    (cleaner.py:5-30)."""
    by_conv: dict[str, list[dict[str, Any]]] = defaultdict(list)
    for r in links:
        if r["linked_id"] != "-":
            by_conv[r["conv_id"]].append(r)
    out = []
    for conv_id in sorted(by_conv):
        for i, r in enumerate(sorted(by_conv[conv_id], key=lambda x: (x["start"], x["end"]))):
            out.append({**r, "mention_id": i})
    return out


# ---------------------------------------------------------------------------
# Stage 3 — extractor (A7/J5 → J6/W6 → W3 → K3 stub → P3/J7/A2 → triples).
# ---------------------------------------------------------------------------


def make_pairs(
    clean_links: list[dict[str, Any]],
    conversations: dict[str, dict[str, Any]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict[str, Any]]:
    by_conv: dict[str, list[dict[str, Any]]] = defaultdict(list)
    for r in clean_links:
        by_conv[r["conv_id"]].append(r)
    pairs = []
    for conv_id in sorted(by_conv):
        ms = sorted(by_conv[conv_id], key=lambda x: (x["start"], x["end"]))
        ids = sorted({(r["linked_id"], r["label"]) for r in ms}, key=lambda x: (x[1], x[0]))
        # entity pre-cap (mirrors operators.pairs.generate_pairs two-level cap)
        ids = ids[: cfg.max_entities_per_conversation]
        doc = conversations[conv_id]["doc_text"]
        n_pairs = 0
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                e1, e2 = ids[i], ids[j]
                if tuple(sorted((e1[1], e2[1]))) not in VALID_TYPE_PAIRS:
                    continue
                if n_pairs >= cfg.max_pairs_per_conversation:
                    break
                parts1 = set(e1[0].split(","))
                parts2 = set(e2[0].split(","))
                spans1, spans2 = [], []
                for m in ms:
                    mparts = m["linked_id"].split(",")
                    order = None
                    for el in mparts:
                        if el in parts1:
                            order = 1
                            break
                        elif el in parts2:
                            order = 2
                            break
                    if order == 1:
                        spans1.append((m["start"], m["end"]))
                    elif order == 2:
                        spans2.append((m["start"], m["end"]))
                marked = K.insert_markers(doc, spans1, spans2)
                pairs.append(
                    {
                        "conv_id": conv_id,
                        "e1_id": e1[0],
                        "e1_type": e1[1],
                        "e2_id": e2[0],
                        "e2_type": e2[1],
                        "marked_text": marked,
                    }
                )
                n_pairs += 1
    return pairs


def extract(
    pairs: list[dict[str, Any]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict[str, Any]]:
    # per (conv, e1_part, e2_part): list of (softmax_rel, novel_raw)
    grouped: dict[tuple[str, str, str], list[tuple[list[float], list[float]]]] = defaultdict(list)
    for p in pairs:
        chunks = K.chunk_marked_text(p["marked_text"], cfg.max_seq_len, p["e1_id"] != p["e2_id"])
        for ch in chunks:
            rel, nov = K.stub_relation_logits(p["e1_id"], p["e2_id"], ch)
            if K.argmax_first(rel) == NEGATIVE_CLASS:
                continue
            srel = K.softmax(rel)
            for p1 in p["e1_id"].split(","):
                for p2 in p["e2_id"].split(","):
                    grouped[(p["conv_id"], p1, p2)].append((srel, nov))
    triples = []
    for (conv_id, e1, e2), rows in sorted(grouped.items()):
        rel_sum = [sum(r[i] for r, _ in rows) for i in range(len(RELATION_LABELS))]
        nov_sum = [sum(n[i] for _, n in rows) for i in range(2)]
        label = K.argmax_first(rel_sum)
        if label == NEGATIVE_CLASS:
            continue
        triples.append(
            {
                "conv_id": conv_id,
                "subj": e1,
                "pred": RELATION_LABELS[label],
                "obj": e2,
                "novel": K.argmax_first(nov_sum) == 1,
            }
        )
    return triples


# ---------------------------------------------------------------------------
# Full pipeline.
# ---------------------------------------------------------------------------


def run_pipeline(
    transcripts: list[dict[str, Any]],
    lex: Lexicons,
    tag_lexicon: dict[tuple[str, ...], int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    litvar_fn: Any = None,
    llm_fn: Any = None,
) -> dict[str, Any]:
    convs = assemble(transcripts)
    mentions = tag(convs, tag_lexicon, cfg)
    links = link(mentions, lex, cfg, litvar_fn, llm_fn)
    cleaned = clean(links)
    pairs = make_pairs(cleaned, convs, cfg)
    triples = extract(pairs, cfg)
    return {
        "conversations": convs,
        "mentions": mentions,
        "links": links,
        "clean_links": cleaned,
        "pairs": pairs,
        "triples": triples,
    }
