"""Sequence-variant string kernels (SURVEY.md F2-F5).

Faithful reimplementations of the reference's tmVar-style text functions
(/root/reference/src/linker/seq_variant.py), exposed both as plain Python
(for kernels/oracle) and as Spark Column expressions where the operation
is order-insensitive. The codon substitution (F3) is order-SENSITIVE
(sequential str.replace over the table in insertion order), so it is a
kernel-only function applied via a pandas UDF.
"""

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# F3 — codon → 1-letter amino acid (standard genetic code), RNA table then
# DNA table, replaces applied sequentially in insertion order (reference
# seq_variant.py:62-117: `codon_amino = codon_to_rna | codon_to_dna`).
# --------------------------------------------------------------------------

_AMINO_CODONS = [  # (one-letter, RNA codons) in the reference's listing order
    ("A", "GCU GCC GCA GCG"),
    ("R", "CGU CGC CGA CGG AGA AGG"),
    ("N", "AAU AAC"),
    ("D", "GAU GAC"),
    ("C", "UGU UGC"),
    ("Q", "CAA CAG"),
    ("E", "GAA GAG"),
    ("G", "GGU GGC GGA GGG"),
    ("H", "CAU CAC"),
    ("I", "AUU AUC AUA"),
    ("L", "UUA UUG CUU CUC CUA CUG"),
    ("K", "AAA AAG"),
    ("M", "AUG"),
    ("F", "UUU UUC"),
    ("P", "CCU CCC CCA CCG"),
    ("S", "UCU UCC UCA UCG AGU AGC"),
    ("T", "ACU ACC ACA ACG"),
    ("W", "UGG"),
    ("Y", "UAU UAC"),
    ("V", "GUU GUC GUA GUG"),
    ("*", "UAA UGA UAG"),
]

CODON_AMINO: dict[str, str] = {}
for aa, codons in _AMINO_CODONS:  # RNA table
    for c in codons.split():
        CODON_AMINO[c] = aa
for aa, codons in _AMINO_CODONS:  # DNA table (U→T); dups overwrite equal
    for c in codons.split():
        CODON_AMINO[c.replace("U", "T")] = aa


def convert_amino_acids(text: str) -> str:
    """F3 — sequential replace over the codon table; order-sensitive by
    construction (reference seq_variant.py:113-117)."""
    for three, one in CODON_AMINO.items():
        text = text.replace(three, one)
    return text


# --------------------------------------------------------------------------
# F2 — variant mention cleanup (reference seq_variant.py:422-426).
# --------------------------------------------------------------------------


def clean_variant_mention(text: str) -> str:
    return text.replace("/", ">").replace("--", "").replace(" ", "")


def clean_variant_mention_col(col: Column) -> Column:
    return F.replace(F.replace(F.replace(col, F.lit("/"), F.lit(">")), F.lit("--"), F.lit("")), F.lit(" "), F.lit(""))


# --------------------------------------------------------------------------
# F4 — tmVar SUB→Allele rewrite (reference seq_variant.py:226-228, 294-301).
# --------------------------------------------------------------------------

_SUB_PATTERN = re.compile(r"(c|p)\|SUB\|[A-Z]\|(\d+)(\|)?$")


def is_sub_with_allele(seq: str) -> bool:
    m = _SUB_PATTERN.match(seq)
    return bool(m and m.group() == seq)


def rewrite_sub_allele(pred: str) -> str:
    """If the code matches the SUB-without-mutant shape, rename SUB →
    Allele and strip a trailing '|'."""
    if is_sub_with_allele(pred):
        pred = pred.replace("SUB", "Allele")
        if pred.endswith("|"):
            pred = pred[:-1]
    return pred


def rewrite_sub_allele_col(col: Column) -> Column:
    matches = col.rlike(r"^(c|p)\|SUB\|[A-Z]\|(\d+)(\|)?$")
    rewritten = F.regexp_replace(F.regexp_replace(col, r"SUB", "Allele"), r"\|$", "")
    return F.when(matches, rewritten).otherwise(col)


# --------------------------------------------------------------------------
# F5 — LLM output scrub (reference seq_variant.py:272-292): strip
# non-word/space/|/+/- chars per token, keep tokens containing '|',
# pick 1 → it; otherwise → the last; none → '-'.
# --------------------------------------------------------------------------


def scrub_llm_output(model_out: str) -> str:
    words = model_out.split()
    candidates = [re.sub(r"[^\w\s\|+-]", "", w) for w in words if "|" in w]
    if not candidates:
        return "-"
    return candidates[0] if len(candidates) == 1 else candidates[-1]


def scrub_llm_output_col(col: Column) -> Column:
    """F5 as array HOFs (JVM-side): filter raw words containing '|', strip
    the non-[\\w\\s|+-] chars, pick the single candidate or the last."""
    cands = F.transform(
        F.filter(F.split(col, r"\s+"), lambda w: w.contains("|")),
        lambda w: F.regexp_replace(w, r"[^\w\s\|+-]", ""),
    )
    return F.when(F.size(cands) == 0, F.lit("-")).otherwise(F.element_at(cands, -1))


def convert_amino_acids_udf():
    """F3 as an Arrow-batched pandas UDF — the sequential ordered replace
    cannot be a Spark expression; only the (few) variant mentions that
    reach the LLM hop ever pass through it."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _convert(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: convert_amino_acids(t) if t is not None else None)

    return _convert
