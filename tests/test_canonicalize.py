"""Connected-components canonicalization + graph materialization tests."""

from __future__ import annotations

from bionext_spark.operators.canonicalize import alias_edges, connected_components, materialize_graph


def test_connected_components_chain(spark):
    verts = spark.createDataFrame([(v,) for v in "abcdefg"], "vertex_id string")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")], "a string, b string"
    )
    cc = {r["vertex_id"]: r["component"] for r in connected_components(verts, edges).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "f", "g": "g"}


def test_alias_edges_and_graph(spark):
    links = spark.createDataFrame(
        [
            ("c1", 0, "GeneOrGeneProduct", 0, 4, "TP53", 0, "7157", "train"),
            ("c2", 0, "GeneOrGeneProduct", 0, 4, "tp53", 0, "7157-alt", "kb"),
            ("c2", 1, "ChemicalEntity", 9, 16, "aspirin", 0, "D001241", "train"),
        ],
        "conv_id string, mention_id int, label string, start int, end int, "
        "text string, turn_idx int, linked_id string, method string",
    )
    edges = alias_edges(links).collect()
    assert {(r["a"], r["b"]) for r in edges} == {("7157", "7157-alt")}

    triples = spark.createDataFrame(
        [("c1", "7157-alt", "Association", "D001241", False)],
        "conv_id string, subj string, pred string, obj string, novel boolean",
    )
    vertices, out_edges = materialize_graph(links, triples)
    v = {r["vertex_id"]: r["canonical_id"] for r in vertices.collect()}
    assert v["7157"] == "7157" and v["7157-alt"] == "7157"
    e = out_edges.collect()
    assert len(e) == 1 and e[0]["src"] == "7157" and e[0]["dst"] == "D001241"
    assert e[0]["n_conversations"] == 1
