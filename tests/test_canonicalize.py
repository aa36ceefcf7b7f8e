"""CURIE normalization (robot_utils.py:286-311 semantics) + connected components."""

from pyspark.sql import functions as F

from kg_obo_spark.operators.canonicalize import (
    apply_id_update_map,
    canonical_map,
    connected_components,
    normalize_curie,
    union_find,
)


def _norm(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "id string")
    return [r["n"] for r in df.select(normalize_curie(F.col("id")).alias("n")).collect()]


def test_normalize_curie_shapes(spark):
    assert _norm(
        spark,
        [
            "OBO:BFO_0000030",
            "OBO:bfo.OWL#BFO_0000030",
            "http://purl.obolibrary.org/obo/BFO_0000030",
            "bfo:0000030",
            "BFO:0000030",
            "not an id",
        ],
    ) == [
        "BFO:0000030",
        "BFO:0000030",
        "BFO:0000030",
        "BFO:0000030",
        "BFO:0000030",
        "not an id",
    ]


def test_id_update_map_with_capitalized_dual_keys(spark):
    df = spark.createDataFrame(
        [("bfo:0000030",), ("Bfo:0000030",), ("BFO:0000030",), ("GO:0000001",)],
        "id string",
    )
    # map keyed on the lowercase variant only; transform.py:615-621 adds the
    # capitalized variants implicitly
    out = apply_id_update_map(df, ["id"], {"bfo:0000030": "BFO:0000030"})
    got = sorted(r["id"] for r in out.collect())
    assert got == ["BFO:0000030", "BFO:0000030", "BFO:0000030", "GO:0000001"]


def test_connected_components_chain_and_singleton(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "y")], "u string, v string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",), ("x",), ("y",), ("z",)], "id string")
    cc = {r["id"]: r["component"] for r in connected_components(edges, nodes).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x", "z": "z"}


def test_connected_components_pathological_chain(spark):
    # long chain converges in O(log n) star rounds, not O(n)
    n = 64
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)], "u string, v string"
    )
    cc = connected_components(edges)
    comps = {r["component"] for r in cc.collect()}
    assert comps == {"n000"}
    assert cc.count() == n + 1


def test_union_find_matches_distributed(spark):
    pairs = [("b", "a"), ("c", "b"), ("e", "d"), ("f", "e"), ("a", "f")]
    uf = union_find(pairs)
    edges = spark.createDataFrame(pairs, "u string, v string")
    dist = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    for k, v in uf.items():
        assert dist[k] == v


def test_canonical_map_min_curie(spark):
    terms = spark.createDataFrame([("GO:2",), ("GO:1",), ("GO:3",)], "id string")
    eq = spark.createDataFrame([("GO:2", "GO:1")], "a string, b string")
    m = {r["term_id"]: r["canonical_id"] for r in canonical_map(terms, eq).collect()}
    assert m == {"GO:2": "GO:1"}  # only changed mappings are materialized


def test_generate_id_update_map_golden(spark):
    """Reproduces examine_owl_names (robot_utils.py:223-331) from raw input:
    repair shapes, capitalization, unknown-prefix unexpected ids."""
    from kg_obo_spark.operators.canonicalize import generate_id_update_map

    raw = spark.createDataFrame(
        [
            ("OBO:BFO_0000001",),                                  # OBO rewrite
            ("obo:bfo.owl#BFO_0000002",),                          # .OWL# + lowercase obo
            ("http://purl.obolibrary.org/obo/CHEBI_0000003",),     # IRI compression
            ("go:0000004",),                                       # capitalize prefix
            ("BFO:0000005",),                                      # canonical: NO row
            ("XYZ:0000006",),                                      # unknown prefix
            ("not an id",),                                        # junk
        ],
        "id string",
    )
    rows = {
        r["old_id"]: (r["new_id"], r["repairable"])
        for r in generate_id_update_map(
            raw, known_prefixes=["BFO", "CHEBI", "GO", "PATO", "ENVO", "MONDO"]
        ).collect()
    }
    assert rows["OBO:BFO_0000001"] == ("BFO:0000001", True)
    assert rows["obo:bfo.owl#BFO_0000002"] == ("BFO:0000002", True)
    assert rows["http://purl.obolibrary.org/obo/CHEBI_0000003"] == ("CHEBI:0000003", True)
    assert rows["go:0000004"] == ("GO:0000004", True)
    assert "BFO:0000005" not in rows
    assert rows["XYZ:0000006"] == (None, False)
    assert rows["not an id"] == (None, False)


def test_generated_map_feeds_dual_key_apply(spark, tmp_path):
    """End-to-end: the GENERATED map, fed to apply_id_update_map, rewrites ids
    including the capitalized-prefix dual keys (transform.py:615-621) — the
    reference's derive-then-apply loop from raw input alone."""
    from kg_obo_spark.operators.canonicalize import (
        apply_id_update_map,
        generate_id_update_map,
        write_id_update_artifacts,
    )

    raw = spark.createDataFrame([("bfo:0000001",), ("OBO:GO_0000002",)], "id string")
    m = {
        r["old_id"]: r["new_id"]
        for r in generate_id_update_map(raw, known_prefixes=["BFO", "GO"])
        .filter("repairable")
        .collect()
    }
    nodes = spark.createDataFrame(
        # Bfo: capitalized variant of the discovered bfo: key -> dual-key hit
        [("bfo:0000001",), ("Bfo:0000001",), ("OBO:GO_0000002",), ("GO:0000009",)],
        "id string",
    )
    out = {r["id"] for r in apply_id_update_map(nodes, ["id"], m).collect()}
    assert out == {"BFO:0000001", "GO:0000002", "GO:0000009"}

    mal, upd = write_id_update_artifacts(raw, str(tmp_path), known_prefixes=["BFO", "GO"])
    lines = open(upd).read().splitlines()
    assert lines[0] == "Old ID\tNew ID"
    assert "OBO:GO_0000002\tGO:0000002" in lines


def test_incremental_components_equals_full_recompute(spark):
    """Run-2 over (old graph + delta) via incremental_components equals the
    full recompute, with the star-contraction running on a reduced graph
    (fewer edges, <= rounds) — ROADMAP incremental-CC contract."""
    from kg_obo_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    # two chains + a singleton pair; delta merges the chains and adds new nodes
    e1 = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("b2", "b3"), ("c1", "c2")],
        "u string, v string",
    )
    delta = spark.createDataFrame(
        [("a3", "b1"), ("b3", "d1"), ("d1", "d2"), ("e1", "e2")],
        "u string, v string",
    )
    prev, full_rounds = connected_components(e1, return_iterations=True)
    inc, n_reduced, inc_rounds = incremental_components(prev, delta)
    full = connected_components(e1.union(delta))

    got = {(r["id"], r["component"]) for r in inc.collect()}
    want = {(r["id"], r["component"]) for r in full.collect()}
    assert got == want
    # reduced graph is the delta rewritten through old components: 4 edges max
    assert 0 < n_reduced <= delta.count()
    assert n_reduced < e1.count() + delta.count()


def test_incremental_components_empty_delta_is_noop(spark):
    from kg_obo_spark.operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    e1 = spark.createDataFrame([("a", "b"), ("b", "c")], "u string, v string")
    prev = connected_components(e1)
    # delta edges entirely inside one existing component -> nothing to do
    delta = spark.createDataFrame([("a", "c")], "u string, v string")
    inc, n_reduced, rounds = incremental_components(prev, delta)
    assert n_reduced == 0 and rounds == 0
    assert {(r["id"], r["component"]) for r in inc.collect()} == {
        (r["id"], r["component"]) for r in prev.collect()
    }


def test_registry_delta_small_equals_distributed(spark):
    """The driver-side union-find fast path and the distributed
    star-contraction path of registry_delta_update produce identical changed
    rows on a registry with reroutes, stale rows, and new ids."""
    from kg_obo_spark.operators.canonicalize import registry_delta_update

    registry = spark.createDataFrame(
        [
            ("b", "b", 0), ("c", "b", 0),          # stale rows (superseded)
            ("a", "a", 1), ("b", "a", 1), ("c", "a", 1),
            ("x", "x", 1), ("y", "x", 1),
            ("z", "z", 2),
        ],
        "id string, component string, _epoch long",
    )
    delta = spark.createDataFrame(
        [("c", "y"), ("n1", "n2"), ("n3", "z"), ("q", "q")],
        "u string, v string",
    )
    small, nr_s, _ = registry_delta_update(registry, delta)
    dist, nr_d, _ = registry_delta_update(registry, delta, small_threshold=0)
    got_s = {(r["id"], r["component"]) for r in small.collect()}
    got_d = {(r["id"], r["component"]) for r in dist.collect()}
    assert got_s == got_d
    assert nr_s == nr_d
    # a-x merge: min(a,x)="a" so only x,y reroute (a,b,c keep "a" and are NOT
    # re-emitted); n1/n2 are a first-seen pair; n3 links to z and "n3" < "z"
    # so z reroutes to n3 and n3 is first-seen as its own min
    assert got_s == {
        ("x", "a"), ("y", "a"),
        ("n1", "n1"), ("n2", "n1"),
        ("n3", "n3"), ("z", "n3"),
    }
    assert not any(i == "q" for i, _ in got_s)  # self-loop id never appears
    assert not any(c == "b" for _, c in got_s)  # stale label never re-routes
