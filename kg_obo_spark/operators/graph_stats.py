"""Graph statistics — SURVEY §2.4 A1–A14 as DataFrame aggregates.

Reproduces the values of the reference's get_graph_details
(/root/reference/kg_obo/stats.py:230-332): node/edge counts, connected
components (undirected, stats.py:355), singletons, max/mean degree (mean
formatted 2dp, stats.py:325) — pinned by the bfo golden fixture
(73, 116, (10,1,49), 7, 47, '3.18'; tests/test_stats.py:25-31).

Skew note: degree aggregation over a hot node is a classic skewed groupBy; the
plan here relies on map-side partial aggregation (hash agg) which absorbs hot
keys before the exchange. ``degree_frame(salted=True)`` adds explicit
salting + two-phase aggregation for adversarial key distributions where a
single key exceeds one task's input (north_star requirement).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_obo_spark.operators.canonicalize import connected_components


@dataclass
class GraphStats:
    nodes: int
    edges: int
    connected_components: tuple[int, int, int]  # (n, min_size, max_size)
    singletons: int
    max_node_degree: int
    mean_node_degree: str  # 2dp string, matching stats.py:325


def degree_frame(edges: DataFrame, salted: bool = False, salt_buckets: int = 32) -> DataFrame:
    """(id, degree) over undirected edges (endpoints exploded).

    ``salted=True`` -> two-phase aggregation: partial count on (id, salt), final
    sum on id. Use when a single node's edges exceed one task partition."""
    endpoints = edges.select(
        F.explode(F.array("subject", "object")).alias("id")
    )
    if not salted:
        return endpoints.groupBy("id").agg(F.count("*").alias("degree"))
    # deterministic salt: hash of row content + partition id — stable across
    # task retries (monotonically_increasing_id is not), and commutative-sum
    # correctness doesn't depend on WHICH bucket a row lands in
    salted_df = endpoints.withColumn(
        "_salt",
        F.pmod(F.xxhash64("id", F.spark_partition_id()), F.lit(salt_buckets)),
    )
    partial = salted_df.groupBy("id", "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy("id").agg(F.sum("_c").alias("degree"))


def singleton_count(nodes: DataFrame, edges: DataFrame) -> int:
    """A4: nodes participating in no edge — left anti-join against endpoints."""
    endpoints = edges.select(F.explode(F.array("subject", "object")).alias("id")).distinct()
    return nodes.select("id").distinct().join(endpoints, "id", "left_anti").count()


def component_stats(nodes: DataFrame, edges: DataFrame) -> tuple[int, int, int]:
    """A3: (n_components, min_size, max_size), graph treated undirected
    (stats.py:355); singletons count as size-1 components."""
    cc = connected_components(
        edges.select("subject", "object"), nodes=nodes.select("id")
    )
    sizes = cc.groupBy("component").agg(F.count("*").alias("size"))
    row = sizes.agg(
        F.count("*").alias("n"), F.min("size").alias("mn"), F.max("size").alias("mx")
    ).first()
    return (row["n"] or 0, row["mn"] or 0, row["mx"] or 0)


def graph_stats(nodes: DataFrame, edges: DataFrame) -> GraphStats:
    """Full stats record (one driver-side struct; every aggregate distributed)."""
    n_nodes = nodes.count()
    n_edges = edges.count()
    deg = degree_frame(edges)
    drow = deg.agg(F.max("degree").alias("mx"), F.sum("degree").alias("total")).first()
    max_deg = int(drow["mx"] or 0)
    # mean over ALL nodes (nodes with no edges count as degree 0), 2dp string
    mean_deg = (drow["total"] or 0) / n_nodes if n_nodes else 0.0
    return GraphStats(
        nodes=n_nodes,
        edges=n_edges,
        connected_components=component_stats(nodes, edges),
        singletons=singleton_count(nodes, edges),
        max_node_degree=max_deg,
        mean_node_degree=f"{mean_deg:.2f}",
    )


def format_fanout(names_versions: DataFrame, formats: list[str] | None = None) -> DataFrame:
    """A14: cross every (name, version) with the artifact formats
    (stats.py:75-90, FORMATS=['TSV','JSON'] stats.py:26)."""
    formats = formats or ["TSV", "JSON"]
    fmt = F.explode(F.array(*[F.lit(f) for f in formats])).alias("Format")
    return names_versions.select("*", fmt)


def compare_versions(versions: DataFrame) -> DataFrame:
    """J4: self-join outlier detection across versions of the same (Name, Format):
    flag pairs whose file-size ratio is outside [0.5, 1.5] or node/edge count
    ratio outside [0.2, 1.2] (stats.py:376-426).

    Returns (Name, Version, Format, issue) rows for flagged versions. The
    reference nested-loops this O(n²) single-node; here it is a self-join keyed
    on (Name, Format) — same pairs, shuffled once."""
    a = versions.select(
        "Name", "Format",
        F.col("Version").alias("v_a"), F.col("Size").alias("s_a"),
        F.col("Nodes").alias("n_a"), F.col("Edges").alias("e_a"),
    )
    b = versions.select(
        "Name", "Format",
        F.col("Version").alias("v_b"), F.col("Size").alias("s_b"),
        F.col("Nodes").alias("n_b"), F.col("Edges").alias("e_b"),
    )
    pairs = a.join(b, ["Name", "Format"]).filter(F.col("v_a") != F.col("v_b"))
    size_ratio = F.col("s_a") / F.col("s_b")
    node_ratio = F.col("n_a") / F.col("n_b")
    edge_ratio = F.col("e_a") / F.col("e_b")
    flagged = pairs.select(
        "Name",
        F.col("v_a").alias("Version"),
        "Format",
        F.when(~size_ratio.between(0.5, 1.5), F.lit("size_outlier"))
        .when(~node_ratio.between(0.2, 1.2), F.lit("node_count_outlier"))
        .when(~edge_ratio.between(0.2, 1.2), F.lit("edge_count_outlier"))
        .alias("issue"),
    ).filter(F.col("issue").isNotNull())
    return flagged.groupBy("Name", "Version", "Format").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("issue"))).alias("issues")
    )


def missing_namespaces(owl_namespaces: DataFrame, node_names: DataFrame) -> DataFrame:
    """J6/A10: namespaces present in axioms but absent among node-name prefixes
    (stats.py:541-550) — distinct prefixes + left anti-join."""
    graph_ns = (
        node_names.select(F.split(F.col("name"), ":")[0].alias("ns")).distinct()
    )
    return owl_namespaces.select("ns").distinct().join(graph_ns, "ns", "left_anti")


def parse_robot_metrics(metrics: DataFrame, wanted: list[str]) -> DataFrame:
    """A7: group metric rows, collect values, subset to wanted metrics
    (stats.py:563-590). Values kept in first-seen order via collect_list over
    an ordered window is overkill here — the reference preserves file order, we
    sort for determinism and the golden fixture is order-insensitive."""
    return (
        metrics.filter(F.col("metric").isin(wanted))
        .groupBy("metric")
        .agg(F.sort_array(F.collect_list("metric_value")).alias("metric_values"))
    )
