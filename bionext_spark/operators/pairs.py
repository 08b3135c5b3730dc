"""Stage 3a — candidate pair generation + marker instrumentation
(SURVEY.md A7, J5, J6, W6).

* A7 distinct-ids: ``select(conv_id, linked_id, label).distinct()``.
* J5 self theta-join: pairs are combinations of the per-conversation
  distinct set under the deterministic (type, id) total order, filtered by
  the broadcast type-compatibility mask (reference mask at
  src/extractor/data.py:40-61; at inference every surviving pair is a
  candidate). The per-conversation pair cap bounds the O(n²) blow-up on
  entity-rich conversations at scale (the reference has no cap; capped
  counts surface in stage metrics).
* J6 mention instrumentation: pairs × mentions equi-join on conv_id; the
  reference's "first matching comma-part decides entity order" loop
  (extractor/data.py:97-126) becomes min-position arithmetic over the
  exploded part list.
* W6 reverse-ordered marker insertion happens in one grouped kernel over
  (pair, collected spans) — the only Python in this stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from bionext_spark import kernels as K
from bionext_spark.config import DEFAULT_CONFIG, VALID_TYPE_PAIRS, PipelineConfig
from bionext_spark.operators import kernel_repartition


def generate_pairs(clean_links: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """A7 + J5 → (conv_id, e1_id, e1_type, e2_id, e2_type).

    TWO shuffles: the conv_id groupBy collects the per-conversation
    distinct entity set into a sorted array (entity pre-cap = a slice),
    then an explicit repartition of the tiny per-conversation rows keeps
    the pair-generation explode parallel (see inline comment); pair
    generation + the type-compatibility mask + the post-mask prefix cap
    all run as array HOFs inside whole-stage codegen — the round-1 shape
    (distinct → rank window → self-join → broadcast mask → rank window)
    was four shuffles producing the same rows, and pure serial stage
    latency at bench scale. Semantics are identical (same (type, id) lex
    order, mask applied before the cap — tested against the oracle):

    * entity pre-cap bounds the blow-up: a 10⁵-distinct-id conversation
      generates at most m(m-1)/2 ≈ 130k pair structs inside one array
      cell (~5 MB), never 5×10⁹ rows;
    * the collect_set buffer holds the conversation's distinct (label, id)
      pairs pre-slice — entities, not mentions, so even pathological
      conversations stay in the low MBs per aggregation buffer.
    """
    m = cfg.max_entities_per_conversation
    cap = cfg.max_pairs_per_conversation
    mask_lit = "array(" + ", ".join(
        f"'{a}|{b}'" for a, b in sorted(VALID_TYPE_PAIRS)
    ) + ")"  # labels never contain '|'
    ents = clean_links.groupBy("conv_id").agg(
        F.expr(
            f"slice(array_sort(collect_set(struct(label, linked_id))), 1, {m})"
        ).alias("ents")
    )
    # Explicit repartition between the agg and the explode: the agg output
    # is TINY (one row per conversation, ≤m entity structs), so AQE's
    # partition coalescing shrinks the reduce side to ONE task — and the
    # O(m²) pair-gen HOFs + explode below then run serially in it
    # (measured: a 39 core-s single-task stage at bench scale, growing
    # linearly with data — a weak-regime killer). A user-specified
    # repartition count is exempt from AQE coalescing; the extra exchange
    # moves only the tiny per-conversation rows.
    ents = ents.repartition(
        clean_links.sparkSession.sparkContext.defaultParallelism, "conv_id"
    )
    pair_gen = f"""
    slice(
      flatten(transform(ents, (x, i) ->
        filter(
          transform(slice(ents, i + 2, size(ents)),
                    y -> struct(x.linked_id as e1_id, x.label as e1_type,
                                y.linked_id as e2_id, y.label as e2_type)),
          p -> array_contains({mask_lit},
                              concat(least(p.e1_type, p.e2_type), '|',
                                     greatest(p.e1_type, p.e2_type)))))),
      1, {cap})
    """
    return ents.select("conv_id", F.explode(F.expr(pair_gen)).alias("p")).select(
        "conv_id", "p.e1_id", "p.e1_type", "p.e2_id", "p.e2_type"
    )


_MARK_SCHEMA = (
    "conv_id string, e1_id string, e1_type string, e2_id string, e2_type string, "
    "marked_text string"
)


def _side_spans(this: str, other: str, op: str) -> F.Column:
    """Span list for one side of a pair from the raw per-side match lists.

    For mention x (keyed by (start, end)): p_this = min part_pos among
    ``this``-side matches, p_other likewise (∞ when absent); keep x when
    p_this <op> p_other — the reference's "first matching comma-part
    decides entity order" loop (extractor/data.py:110-121) as array HOFs
    over per-pair lists of at most a few hundred elements. Side 1 uses
    ``<=`` and side 2 strict ``<`` so a part-position tie assigns the
    mention to entity 1, exactly the old order=1-wins rule."""
    inf = 999_999_999
    min_this = (
        f"aggregate(filter({this}, y -> y.start = x.start AND y.end = x.end), "
        f"{inf}, (a, y) -> least(a, y.part_pos))"
    )
    min_other = (
        f"aggregate(filter({other}, y -> y.start = x.start AND y.end = x.end), "
        f"{inf}, (a, y) -> least(a, y.part_pos))"
    )
    return F.expr(
        f"array_sort(array_distinct(transform(filter({this}, x -> "
        f"{min_this} {op} {min_other}), x -> struct(x.start, x.end))))"
    )


def pair_spans(pairs: DataFrame, clean_links: DataFrame) -> DataFrame:
    """J6 (relational part) → one row per pair with the ordered span lists
    of its two entities: (conv_id, e1.., e2.., spans1, spans2).

    Scale shape: mention parts aggregate to one span list per (conv,
    part), then to ONE part→spans map per conversation, and pairs join
    that map once on conv_id — each side's raw span list is rebuilt from
    the map inside whole-stage codegen (transform over the id's comma
    parts + flatten), and the first-match-wins entity ordering resolves
    in the same codegen pass (_side_spans). Two earlier shapes were
    measured and replaced: the naive pair-part × mention-part join
    exploded |pairs| × |mentions-per-entity| rows (17.7M vs 1.1M at
    bench scale); its successor — explode pairs to 2×|pairs| (pair,
    side, part) rows, join the part lists, groupBy back to pairs —
    still shuffled every exploded pair row twice (join exchange +
    pair-level groupBy; that groupBy exchange wrote ~700 MB at bench
    scale and its write stalls were among the largest non-scaling terms
    in the N→4N profile). The map form shuffles each pair row ONCE (the
    conv_id join) and each mention part once (the two-level
    aggregation); per-conversation map size is bounded by the
    conversation's distinct (part → mentions) fan-out — entities, not
    pairs — and the join key is conv_id, so AQE skew splitting applies
    to entity-rich conversations."""
    mention_parts = clean_links.select(
        "conv_id", "start", "end", F.posexplode(F.split("linked_id", ",")).alias("part_pos", "part")
    )
    part_ms = mention_parts.groupBy("conv_id", "part").agg(
        F.collect_list(F.struct("start", "end", "part_pos")).alias("ms")
    )
    conv_maps = part_ms.groupBy("conv_id").agg(
        F.map_from_entries(F.collect_list(F.struct("part", "ms"))).alias("pm")
    )
    pair_cols = ["conv_id", "e1_id", "e1_type", "e2_id", "e2_type"]

    def raw(side_id: str) -> str:
        # every part of a pair entity id exists in pm (pairs derive from
        # the same clean_links rows); the null filter is belt-and-braces
        return (
            f"flatten(filter(transform(split({side_id}, ','), p -> pm[p]),"
            " a -> a is not null))"
        )

    j = pairs.join(conv_maps, "conv_id").select(
        *pair_cols, F.expr(raw("e1_id")).alias("raw1"), F.expr(raw("e2_id")).alias("raw2")
    )
    return j.select(
        *pair_cols,
        _side_spans("raw1", "raw2", "<=").alias("spans1"),
        _side_spans("raw2", "raw1", "<").alias("spans2"),
    )


def mark_pairs(pairs: DataFrame, clean_links: DataFrame, conversations: DataFrame) -> DataFrame:
    """J6 + W6 → PAIRS with marked_text (explicit materialization; the
    hot pipeline path fuses marking into the classifier kernel instead —
    see extraction.classify_pair_spans — so the ~|pairs|×|doc| marked-text
    blow-up never shuffles)."""
    spans = pair_spans(pairs, clean_links)
    with_doc = kernel_repartition(
        spans.join(conversations.select("conv_id", "doc_text"), "conv_id")
    )

    def mark(batches):
        for pdf in batches:
            marked = [
                K.insert_markers(
                    doc,
                    [(s["start"], s["end"]) for s in (s1 if s1 is not None else [])],
                    [(s["start"], s["end"]) for s in (s2 if s2 is not None else [])],
                )
                for doc, s1, s2 in zip(pdf["doc_text"], pdf["spans1"], pdf["spans2"])
            ]
            yield pdf.drop(columns=["doc_text", "spans1", "spans2"]).assign(marked_text=marked)

    return with_doc.mapInPandas(mark, _MARK_SCHEMA)


def run_pair_generation(
    clean_links: DataFrame, conversations: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    return mark_pairs(generate_pairs(clean_links, cfg), clean_links, conversations)
