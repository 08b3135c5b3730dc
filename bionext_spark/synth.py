"""Deterministic synthetic fixtures (FIXTURES.md §1-§3).

Generates, from a fixed seed, plain-Python rows for:

* ``transcripts`` — multi-turn conversations in the exact input_hint shape,
  with entity mentions planted from the lexicons below, including the
  adversarial cases FIXTURES.md calls for (window-straddling mentions via
  one 400-turn conversation, comma-composite identifiers, ``rs``-prefixed
  variants, zero-organism conversations, alias collisions for the
  majority vote, and the taxonomy merged-id correction case).
* lexicon tables: ``lexicon_concepts`` (+ stub embeddings),
  ``lexicon_genes``, ``train_direct``, ``lexicon_variants``,
  ``gene_symbols``.

Rows are plain dicts so both the Spark loaders and the pure-Python oracle
consume identical inputs.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import random
from typing import Any

from bionext_spark.kernels import stub_embedding

SEED = 42

# --------------------------------------------------------------------------
# Lexicon content (made-up, public-domain surface forms).
# --------------------------------------------------------------------------

# (surface, id) per KB. "hepatitis c virus" maps to the *merged* id so the
# manual correction 3052230→11103 (config.TAXONOMY_ID_CORRECTIONS) fires.
TAXONOMY_KB = [
    ("human", "9606"),
    ("mouse", "10090"),
    ("zebrafish", "7955"),
    ("rat", "10116"),
    ("hepatitis c virus", "3052230"),
    ("jaguar", "9690"),
    ("jaguar", "9691"),  # alias collision → majority vote has work to do
    ("panthera onca", "9690"),
]
TRAIN_TAXONOMY = [("Human", "9606"), ("mice", "10090")]  # raw-text match

# lexicon_genes: (tax_id, alias, gene_id)
GENES_KB = [
    ("9606", "brca1", "672"),
    ("9606", "tp53", "7157"),
    ("9606", "egfr", "1956"),
    ("9606", "braf", "673"),
    ("10090", "brca1", "12189"),
    ("10090", "tp53", "22059"),
    ("7955", "tp53", "30590"),
]
# Per-taxon gene embedding KBs exist only for these taxa (reference loads
# matrices for 7 taxa only, src/linker/utils.py:437-453).
GENE_EMB_TAXA = ("9606", "10090")
# (tax, kb-entry text, gene_id, text-the-embedding-was-computed-from)
GENE_EMB_KB = [
    ("9606", "kras proto-oncogene", "3845", "k-ras"),
    ("10090", "trp53 tumor protein", "22059", "trp53"),
]
TRAIN_GENES = [("9606", "p53", "7157"), ("10090", "p53", "22059")]
GENE_SYMBOLS = [("672", "BRCA1"), ("7157", "TP53"), ("1956", "EGFR"), ("673", "BRAF"), ("3845", "KRAS")]

TRAIN_CHEMICALS = [
    ("aspirin", "D001241"),
    ("caffeine", "D002110"),
    ("salt", "D012492"),
    ("salt", "D017673"),  # collision → vote
    ("nacl", "D012492"),  # supports D012492 in the vote
    ("combo drug", "D001241,D009369"),  # comma-composite identifier (J7)
]
MESH_EMB_KB = [  # (kb text, id, embedding source text)
    ("ibuprofen", "D007052", "ibuprofen"),
    ("aspirin", "D001241", "asprin"),  # misspelling links via embedding
]
TRAIN_DISEASES = [("diabetes", "D003920"), ("migraine", "D008881")]
CTD_EMB_KB = [("peripheral neuropathy", "D009437", "neuropathy")]
TRAIN_CELLS = [("hela", "CVCL_0030")]
CELL_EMB_KB = [("jurkat cell", "CVCL_0065", "jurkat")]
VARIANT_LEXICON = [("v600e", "p|SUB|V|600|E", "673"), ("c76a", "c|SUB|C|76|A", "7157")]

# Mention surfaces planted into turns: (surface, label). Includes surfaces
# no cascade can link ("orphanol", "unknownin") so the cleaner (P2) drops
# them, and "Ibuprofen"/"asprin" which only the embedding hop links.
PLANTABLE: list[tuple[str, str]] = (
    [(t, "OrganismTaxon") for t, _ in TAXONOMY_KB[:6]]
    + [("Human", "OrganismTaxon"), ("jaguar", "OrganismTaxon"), ("panthera onca", "OrganismTaxon")]
    + [(a, "GeneOrGeneProduct") for _, a, _ in GENES_KB]
    + [("p53", "GeneOrGeneProduct"), ("k-ras", "GeneOrGeneProduct"), ("orphanol", "GeneOrGeneProduct")]
    + [(t, "ChemicalEntity") for t, _ in TRAIN_CHEMICALS]
    + [("Ibuprofen", "ChemicalEntity"), ("asprin", "ChemicalEntity"), ("unknownin", "ChemicalEntity")]
    + [(t, "DiseaseOrPhenotypicFeature") for t, _ in TRAIN_DISEASES]
    + [("neuropathy", "DiseaseOrPhenotypicFeature")]
    + [("hela", "CellLine"), ("jurkat", "CellLine")]
    + [("rs12345", "SequenceVariant"), ("v600e", "SequenceVariant"), ("c76a", "SequenceVariant")]
)

# Extra taggable surfaces that only the deep seq-variant hops can resolve
# (planted via fixed turns appended by generate_transcripts, NOT via the
# rng, so the random transcript stream is byte-stable across versions):
# "c76 / T" → F2 clean → LitVar; "GCUAAU 99" → F3 codons → LLM;
# "GGG var 22" → LLM with no gene anchor in its conversation.
EXTRA_TAGGABLE: list[tuple[str, str]] = [
    ("c76 / T", "SequenceVariant"),
    ("GCUAAU 99", "SequenceVariant"),
    ("GGG var 22", "SequenceVariant"),
]

# (conv_id, [turn texts]) appended deterministically after the rng stream.
# conv9998 has gene + organism anchors (LitVar key gets a real symbol);
# conv9999 has no gene mention at all (the no-anchor LLM path).
EXTRA_CONVERSATIONS: list[tuple[str, list[str]]] = [
    (
        "conv9998",
        [
            "tp53 observed alongside c76 / T in sequencing",
            "brca1 panel flagged GCUAAU 99 as anomalous",
            "human subject also carried rs12345 as expected",
        ],
    ),
    ("conv9999", ["isolated GGG var 22 finding lacked gene context"]),
    # conv9997 discriminates the gene-anchor semantics (reference
    # seq_variant.py:388-404 anchors the nearest gene MENTION regardless of
    # link outcome): under the zebrafish (7955) anchor taxon — in the gene
    # KB but with NO embedding file — 'orphanol' gets zero candidates, so
    # it has no vote winner at all; yet it is the variant's NEAREST gene,
    # so the anchor must be orphanol with id '-' (not the farther, linked
    # tp53): LitVar's gene_lookup guard fails and the LLM hop runs with
    # gene '-'.
    (
        "conv9997",
        [
            "tp53 was mentioned once in the early zebrafish history",
            "the sample later showed orphanol near the c76 / T variant",
        ],
    ),
]

FILLER = (
    "the patient reported that treatment with standard therapy improved "
    "symptoms over several weeks while the care team monitored response and "
    "adjusted dosage according to observed outcomes during follow up visits"
).split()

ROLES = ("user", "assistant", "tool")
TOOLS = (None, "search", "chart_review", None)
BASE_TS = dt.datetime(2024, 8, 7, 12, 0, 0)


def tag_lexicon_entries() -> list[tuple[str, int]]:
    """(surface, label_index) pairs for the stub tagger lexicon — every
    plantable surface is taggable (the tagger finds mentions; the linker
    decides which survive)."""
    from bionext_spark.config import ENTITY_LABELS

    return [
        (text, ENTITY_LABELS.index(label)) for text, label in PLANTABLE + EXTRA_TAGGABLE
    ]


def _make_turn(rng: random.Random, planted: list[tuple[str, str]]) -> str:
    words: list[str] = []
    n_fill = rng.randint(4, 12)
    mention_slots = sorted(rng.sample(range(n_fill + 1), len(planted))) if planted else []
    mi = 0
    for pos in range(n_fill + 1):
        while mi < len(mention_slots) and mention_slots[mi] == pos:
            words.append(planted[mi][0])
            mi += 1
        if pos < n_fill:
            words.append(rng.choice(FILLER))
    return " ".join(words)


def generate_transcripts(
    n_conversations: int = 50,
    skew_conversation_turns: int = 400,
    seed: int = SEED,
) -> list[dict[str, Any]]:
    rng = random.Random(seed)
    rows: list[dict[str, Any]] = []
    for ci in range(n_conversations):
        conv_id = f"conv{ci:04d}"
        n_turns = skew_conversation_turns if ci == 0 else rng.randint(3, 40)
        # Every 7th conversation has no organism mentions → gene linking
        # falls back to the default 9606 taxon.
        allow_org = ci % 7 != 3
        for ti in range(n_turns):
            k = rng.choices([0, 1, 2, 3], weights=[3, 4, 2, 1])[0]
            planted = []
            for _ in range(k):
                surface, label = rng.choice(PLANTABLE)
                if not allow_org and label == "OrganismTaxon":
                    continue
                planted.append((surface, label))
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": ROLES[ti % 3],
                    "text": _make_turn(rng, planted),
                    "tool": TOOLS[ti % 4],
                    "ts": BASE_TS + dt.timedelta(seconds=60 * ti + ci),
                }
            )
    # Fixed seq-variant-cascade conversations appended WITHOUT touching the
    # rng, so the random stream above stays byte-stable across versions.
    for conv_id, texts in EXTRA_CONVERSATIONS:
        for ti, text in enumerate(texts):
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": ROLES[ti % 3],
                    "text": text,
                    "tool": TOOLS[ti % 4],
                    "ts": BASE_TS + dt.timedelta(seconds=60 * ti),
                }
            )
    return rows


def lexicon_concepts_rows(dim: int = 16) -> list[dict[str, Any]]:
    rows = []
    for text, cid in TAXONOMY_KB:
        rows.append({"kb": "taxonomy", "id": cid, "text": text, "class": "OrganismTaxon", "embedding": None})
    for text, cid, src in MESH_EMB_KB:
        rows.append({"kb": "mesh", "id": cid, "text": text, "class": "ChemicalEntity", "embedding": stub_embedding(src, dim)})
    for text, cid, src in CTD_EMB_KB:
        rows.append({"kb": "ctd", "id": cid, "text": text, "class": "DiseaseOrPhenotypicFeature", "embedding": stub_embedding(src, dim)})
    for text, cid, src in CELL_EMB_KB:
        rows.append({"kb": "cellosaurus", "id": cid, "text": text, "class": "CellLine", "embedding": stub_embedding(src, dim)})
    for tax, text, gid, src in GENE_EMB_KB:
        rows.append({"kb": f"gene_{tax}", "id": gid, "text": text, "class": "GeneOrGeneProduct", "embedding": stub_embedding(src, dim)})
    return rows


def train_direct_rows() -> list[dict[str, Any]]:
    """Train+val gold memory (reference builds these from BioRED train/val,
    e.g. src/linker/chemicals.py:41-46). ``rank`` preserves insertion order
    for the reference's first-of-max tie-break."""
    rows: list[dict[str, Any]] = []

    def add(label: str, pairs, tax: str | None = None, lower: bool = True):
        for i, (text, lid) in enumerate(pairs):
            rows.append(
                {
                    "label": label,
                    "text_key": text.lower() if lower else text,
                    "linked_id": lid,
                    "tax_id": tax,
                    "rank": i,
                }
            )

    add("OrganismTaxon", TRAIN_TAXONOMY, lower=False)  # raw text (taxonomy.py:53)
    add("ChemicalEntity", TRAIN_CHEMICALS)
    add("DiseaseOrPhenotypicFeature", TRAIN_DISEASES)
    add("CellLine", TRAIN_CELLS)
    for tax, text, gid in TRAIN_GENES:
        rows.append({"label": "GeneOrGeneProduct", "text_key": text.lower(), "linked_id": gid, "tax_id": tax, "rank": len(rows)})
    return rows


def lexicon_genes_rows() -> list[dict[str, Any]]:
    return [{"tax_id": t, "alias": a, "gene_id": g} for t, a, g in GENES_KB]


def lexicon_variants_rows() -> list[dict[str, Any]]:
    return [{"mention": m, "identifier": i, "gene_id": g} for m, i, g in VARIANT_LEXICON]


def gene_symbols_rows() -> list[dict[str, Any]]:
    return [{"gene_id": g, "symbol": s} for g, s in GENE_SYMBOLS]


def variant_fewshot_rows() -> list[dict[str, Any]]:
    """K5 few-shot example memory (reference builds (amino-converted
    mention, tmVar code, gene symbol) triples from BioRED train + tmVar,
    seq_variant.py:324-341); the synth analog derives them from the
    variant lexicon + gene symbols."""
    sym = dict(GENE_SYMBOLS)
    return [
        {"mention": m, "code": c, "gene": sym.get(g, "-")}
        for m, c, g in VARIANT_LEXICON
    ]


# --------------------------------------------------------------------------
# Deterministic external-lookup fakes (S8 LitVar / K5 LLM stand-ins).
#
# Pure functions of the lookup key so the Spark adapters, the memo table
# and the pure-Python oracle all agree bit-for-bit; shaped to exercise
# every downstream kernel (F2 clean feeds the key, F5 scrub sees multi-
# word model chatter, F4 rewrites the SUB-without-mutant shape).
# --------------------------------------------------------------------------


def fake_litvar_response(key: str) -> str | None:
    """key = '<F2-cleaned mention> <gene symbol>' → comma-joined rsids, or
    None (API found nothing). Deterministic rule: only substitution-shaped
    mentions (containing '>') resolve — everything else falls through to
    the LLM hop, like real LitVar autocomplete behaves on non-rs text."""
    if ">" not in key:
        return None
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return ",".join(f"rs{(h + i) % 100000}" for i in range((h % 2) + 1))


def fake_llm_response(key: str) -> str:
    """key = '<amino-converted mention>\\x00<gene>' → raw model text. Three
    deterministic shapes: chatty SUB-without-mutant (F5 scrub + F4
    rewrite), bare tmVar code (single candidate), and no-code chatter
    (scrubs to '-')."""
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    pos = h % 1000
    if h % 3 == 0:
        return f"Sure! Based on the guidelines, the code is c|SUB|A|{pos}| here."
    if h % 3 == 1:
        return f"p|SUB|V|{pos}|E"
    return "no valid tmVar code can be derived"
