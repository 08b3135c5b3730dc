"""Stage 4 — entity canonicalization + graph materialization.

North-star extension beyond the reference (SURVEY.md §4 item 4): entities
that share a lowercased surface form within a label are aliases; connected
components over that alias graph pick one canonical id per component, and
the final knowledge graph materializes as vertex/edge tables with triples
rewritten to canonical ids.

Connected components use iterative hash-to-min propagation (the standard
Spark formulation — each round every vertex adopts the minimum component
id among itself and its neighbors; converges in O(graph diameter) rounds,
which for alias graphs is tiny). Each round is one shuffle on vertex id;
``localCheckpoint`` truncates lineage so plans stay bounded — this is the
only iterative operator in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alias_edges(links: DataFrame) -> DataFrame:
    """Star edges connecting all linked ids that share (label, lower(text))."""
    groups = (
        links.filter(F.col("linked_id") != "-")
        .select("label", F.lower("text").alias("alias"), "linked_id")
        .distinct()
        .groupBy("label", "alias")
        .agg(F.array_sort(F.collect_set("linked_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return groups.select(
        F.element_at("ids", 1).alias("a"), F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias("b")
    ).distinct()


def connected_components(vertices: DataFrame, edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """(vertex_id) + (a, b) undirected edges → (vertex_id, component).

    Component id = min vertex id in the component (min on the column's
    own type ordering). Each round does (1) one-hop neighbor-min
    propagation and (2) a pointer jump (component ← component[component]
    — monotone, since a component id is itself a vertex whose own
    component can only be smaller), so convergence is O(log diameter)
    rounds, not O(diameter): a 10^6-long alias chain resolves in ~20
    rounds instead of 10^6. The changed-row check makes termination
    exact; max_iter is only a runaway bound (2^max_iter diameter
    coverage)."""
    sym = edges.selectExpr("a as src", "b as dst").union(edges.selectExpr("b as src", "a as dst"))
    sym = sym.localCheckpoint()
    cc = vertices.select(F.col("vertex_id"), F.col("vertex_id").alias("component"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(cc, sym.dst == cc.vertex_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        hopped = cc.join(nbr_min, cc.vertex_id == nbr_min.src, "left").select(
            "vertex_id",
            F.least(F.col("component"), F.coalesce("nbr_component", F.col("component"))).alias(
                "component"
            ),
        )
        ptr = hopped.selectExpr("vertex_id as cvid", "component as ccomp")
        new_cc = (
            hopped.join(ptr, hopped.component == ptr.cvid, "left")
            .select(
                "vertex_id",
                F.coalesce("ccomp", "component").alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_cc.alias("n")
            .join(cc.alias("o"), "vertex_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        cc = new_cc
        if changed == 0:
            break
    return cc


def materialize_graph(clean_links: DataFrame, triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (vertices, edges) per schemas.VERTICES / schemas.EDGES."""
    verts = (
        clean_links.groupBy(F.col("linked_id").alias("vertex_id"))
        .agg(F.min("label").alias("label"), F.count("*").alias("n_mentions"))
    )
    cc = connected_components(verts.select("vertex_id"), alias_edges(clean_links))
    vertices = verts.join(cc, "vertex_id").select(
        "vertex_id", F.col("component").alias("canonical_id"), "label", "n_mentions"
    )
    canon = vertices.select("vertex_id", "canonical_id")
    edges = (
        triples.join(canon.withColumnRenamed("vertex_id", "subj"), "subj", "left")
        .withColumn("src", F.coalesce("canonical_id", F.col("subj")))
        .drop("canonical_id")
        .join(canon.withColumnRenamed("vertex_id", "obj"), "obj", "left")
        .withColumn("dst", F.coalesce("canonical_id", F.col("obj")))
        .groupBy("src", "dst", "pred", "novel")
        .agg(F.countDistinct("conv_id").alias("n_conversations"))
    )
    return vertices, edges
