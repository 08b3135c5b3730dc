"""F2-F5 string kernel tests + memoized external lookup (S8/S9/S11)."""

from __future__ import annotations

from bionext_spark.functions.text import (
    CODON_AMINO,
    clean_variant_mention,
    clean_variant_mention_col,
    convert_amino_acids,
    is_sub_with_allele,
    rewrite_sub_allele,
    rewrite_sub_allele_col,
    scrub_llm_output,
)
from bionext_spark.sources.external import MemoizedLookup

from pyspark.sql import functions as F


def test_codon_table_complete():
    # 64 RNA + DNA-only variants; all map to 20 AAs + stop
    assert len(CODON_AMINO) > 64
    assert CODON_AMINO["AUG"] == "M" and CODON_AMINO["ATG"] == "M"
    assert CODON_AMINO["UAA"] == "*" and CODON_AMINO["TAA"] == "*"


def test_convert_amino_acids_order_sensitive():
    assert convert_amino_acids("GCU") == "A"
    # sequential replace: GCUGA → A + (UGA→? leftover 'GA') — the result of
    # in-order replacement, not codon-frame parsing
    assert convert_amino_acids("p.GCUGCC") == "p.AA"


def test_clean_variant_mention():
    assert clean_variant_mention("c.76 A/G--x") == "c.76A>Gx"


def test_sub_allele_rewrite():
    assert is_sub_with_allele("c|SUB|A|123|")
    assert rewrite_sub_allele("c|SUB|A|123|") == "c|Allele|A|123"
    assert rewrite_sub_allele("c|SUB|A|123|T") == "c|SUB|A|123|T"  # full SUB kept


def test_scrub_llm_output():
    assert scrub_llm_output("the code is c|SUB|A|5|T.") == "c|SUB|A|5|T"
    assert scrub_llm_output("a b c") == "-"
    assert scrub_llm_output("x|1 y|2") == "y|2"  # several → last


def test_column_variants_match_python(spark):
    rows = [("c.76 A/G--x",), ("c|SUB|A|123|",), ("p|SUB|B|9",)]
    df = spark.createDataFrame(rows, "s string")
    got = df.select(
        clean_variant_mention_col(F.col("s")).alias("clean"),
        rewrite_sub_allele_col(F.col("s")).alias("rw"),
    ).collect()
    for (s,), r in zip(rows, got):
        assert r["clean"] == clean_variant_mention(s)
        assert r["rw"] == rewrite_sub_allele(s)


def _make_adapter(prefix: str, resolve_all: bool = False):
    # defined inside a function so cloudpickle ships it by value to
    # executors (real adapters live in the package and import normally)
    class A:
        def lookup_batch(self, keys):
            return [
                f"{prefix}{k}" if (resolve_all or k != "unknown") else None for k in keys
            ]

    return A()


def test_memoized_lookup(spark, tmp_path):
    memo_dir = str(tmp_path / "memo")
    keys = spark.createDataFrame([("a",), ("b",), ("unknown",)], "key string")
    out = {r["key"]: r["value"] for r in MemoizedLookup(spark, memo_dir, _make_adapter("rs_")).lookup(keys).collect()}
    assert out == {"a": "rs_a", "b": "rs_b", "unknown": None}
    # second run with a DIFFERENT adapter: memoized keys keep their old
    # values (never re-fetched); only the unresolved key hits the adapter
    out2 = {
        r["key"]: r["value"]
        for r in MemoizedLookup(spark, memo_dir, _make_adapter("fresh_", resolve_all=True))
        .lookup(keys)
        .collect()
    }
    assert out2 == {"a": "rs_a", "b": "rs_b", "unknown": "fresh_unknown"}


def test_memo_dedupes_overlapping_appends(spark, tmp_path):
    """Concurrent pipelines sharing a memo_dir can append the same key
    twice; lookups must still return exactly one row per key (dedup on
    read), and joins downstream must not fan out."""
    memo_dir = str(tmp_path / "memo")
    spark.createDataFrame([("a", "v1"), ("b", "v2")], "key string, value string").write.mode(
        "append"
    ).parquet(memo_dir)
    spark.createDataFrame([("a", "v1"), ("c", "v3")], "key string, value string").write.mode(
        "append"
    ).parquet(memo_dir)
    lk = MemoizedLookup(spark, memo_dir, adapter=None)
    rows = lk.lookup(spark.createDataFrame([("a",), ("b",), ("c",)], "key string")).collect()
    assert len(rows) == 3
    assert {r["key"]: r["value"] for r in rows} == {"a": "v1", "b": "v2", "c": "v3"}


def test_offline_mode(spark, tmp_path):
    lk = MemoizedLookup(spark, str(tmp_path / "m2"), adapter=None)
    out = {r["key"]: r["value"] for r in lk.lookup(spark.createDataFrame([("x",)], "key string")).collect()}
    assert out == {"x": None}
