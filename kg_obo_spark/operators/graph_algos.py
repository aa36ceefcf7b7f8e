"""Iterative graph analytics over KG edge tables — PageRank and ancestor
closure, both in EXACT arithmetic so results are engine-portable.

The reference computes per-graph aggregates (degree, components; see
/root/reference/kg_obo/stats.py:230-332) but stops short of iterative
centrality/reachability. A knowledge-graph user asks both questions
constantly — "which entities matter" (PageRank over the citation/co-mention
structure) and "what subsumes what" (transitive ancestor closure over is_a
hierarchies, the core OBO subsumption query). Both are loops, not single
Catalyst plans, so they follow the engine's documented application-level
strategy (SURVEY §4.3, same as ``connected_components``): DataFrame rounds
with ``localCheckpoint`` lineage truncation and a convergence signature.

Exactness discipline: floating-point PageRank sums are order-dependent and
would never hash-match a second engine. Ranks here are INTEGER fixed point
(``scale`` units = rank 1.0): per-node contribution is floor-div by
out-degree, damping is ``(num * x) div den``, and sums are integer sums —
associative and commutative, so any partitioning, any aggregation order,
and any engine produce bit-identical ranks. The DuckDB oracle mirrors the
loop with unrolled CTEs.

100 TB shape:
- PageRank: one shuffle per iteration is inherent (contributions re-key
  from src to dst). The edge table is checkpointed once and re-joined per
  round; on a real cluster you'd bucket it by ``src`` so the per-iteration
  probe side arrives pre-partitioned and only the (nodes-sized) rank frame
  shuffles. Dangling mass is folded in-plan via a one-row cross join —
  no per-iteration driver collect.
- Ancestor closure: REPEATED SQUARING (``C ∪ C∘C`` per round) reaches
  depth ``2^r`` after ``r`` rounds — log₂(depth) shuffles instead of one
  per level, the difference between 5 rounds and 40 on a deep ontology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "ancestor_closure",
    "node_depth",
    "triangle_counts",
    "kcore",
]


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Exact fixed-point PageRank: ``(id, rank)`` after ``iterations`` rounds.

    ``edges`` is a directed edge list (first two columns positionally
    src, dst; self-loops and duplicates dropped). ``nodes`` (optional single
    id column) widens the universe with isolated nodes. Ranks are integers
    in ``scale`` units; every node starts at ``scale`` and each round
    applies

        rank'(v) = base + (damping_num * (inc(v) + dangling)) div damping_den

    with ``base = ((damping_den - damping_num) * scale) div damping_den``,
    ``inc(v) = Σ_{u→v} rank(u) div out_degree(u)`` and ``dangling`` the
    per-node floor share of rank parked on out-degree-0 nodes (standard
    uniform redistribution, floor semantics). All operations are integer,
    so results are independent of partitioning and identical across
    engines; floor-div rounding loses mass monotonically (never inflates).

    Overflow bound: intermediate ``damping_num * Σ rank`` must fit int64 —
    choose ``scale <= 2^62 / (damping_num * n_nodes)`` (the default 1e9 is
    safe to ~10^8 nodes; drop to 1e6 beyond).
    """
    src, dst = edges.columns[:2]
    e = (
        edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    universe = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    )
    if nodes is not None:
        universe = universe.union(
            nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
        )
    n_df = universe.distinct().localCheckpoint()
    # one-row frames folded in by cross join: node count and (per round)
    # dangling mass — keeps every round a single Spark job, no driver loop
    # state beyond the iteration counter
    n_count = n_df.agg(F.count("*").alias("n_nodes")).localCheckpoint()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()
    base = ((damping_den - damping_num) * scale) // damping_den

    ranks = n_df.select("id", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        with_deg = ranks.join(deg, ranks["id"] == deg["src"], "left")
        contrib = with_deg.filter(F.col("deg").isNotNull()).select(
            "src", F.expr("rank div deg").alias("c")
        )
        inc = e.join(contrib, "src").groupBy("dst").agg(
            F.sum("c").alias("inc")
        )
        dang = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("dsum"))
            .crossJoin(n_count)
            .select(F.expr("dsum div n_nodes").alias("dshare"))
        )
        ranks = (
            n_df.join(inc, n_df["id"] == inc["dst"], "left")
            .crossJoin(dang)
            .select(
                "id",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"(CAST({damping_num} AS BIGINT)"
                        f" * (coalesce(inc, CAST(0 AS BIGINT)) + dshare))"
                        f" div CAST({damping_den} AS BIGINT)"
                    )
                ).alias("rank"),
            )
            # eager: ranks fans into three consumers next round (with_deg
            # twice via filter branches + the final join) — the memory rule
            # for multi-consumer frames (lazy checkpoint would recompute)
            .localCheckpoint()
        )
    return ranks


def ancestor_closure(
    edges: DataFrame, max_iter: int = 30, return_iterations: bool = False
) -> DataFrame:
    """Transitive closure of a DAG: every ``(id, anc)`` reachable pair.

    ``edges`` is (child, parent) positionally — the is_a/part_of edge table
    of an ontology. Closure is built by repeated squaring: each round
    unions the current closure with its self-composition, so reachable
    depth doubles per round and a depth-``d`` hierarchy converges in
    ``⌈log₂ d⌉`` shuffles (a frontier loop would take ``d``). Convergence
    is detected by a stable (count, xor-checksum) signature, the same
    ledger ``connected_components`` uses. Cycles would converge too (the
    closure is finite) but output membership, not ancestry — feed DAGs.

    ``return_iterations=True`` returns ``(df, n_rounds)`` — the ledger the
    squaring test uses to prove the log₂(depth) round count.
    """
    src, dst = edges.columns[:2]
    c = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("anc"))
        .filter(F.col("id") != F.col("anc"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    n_rounds = 0
    for _ in range(max_iter):
        n_rounds += 1
        step = (
            c.alias("l")
            .join(c.alias("r"), F.col("l.anc") == F.col("r.id"))
            .select(F.col("l.id").alias("id"), F.col("r.anc").alias("anc"))
        )
        # lazy checkpoint: the signature aggregation below materializes it,
        # one fused job per round (the connected_components pattern)
        c = c.union(step).distinct().localCheckpoint(eager=False)
        sig = c.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("id", "anc")).alias("h"),
        ).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    if return_iterations:
        return c, n_rounds
    return c


def triangle_counts(
    edges: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """Exact per-node triangle counts ``(id, n_tri)`` of an undirected
    graph — the clustering/cohesion statistic of KG quality reports.

    The naive wedge join (every 2-path, then check the closing edge) emits
    ``Σ deg(v)²`` wedges — quadratic in hot-node degree, fatal on skewed
    graphs. This uses the standard DEGREE-ORDERED ORIENTATION
    (compact-forward): orient each edge from its (degree, id)-smaller
    endpoint to the larger, which caps every node's out-degree at
    O(√m), so the wedge join emits near-linear output and each triangle
    is generated exactly once (at its unique source whose oriented
    out-edges reach the other two). The closing check is an inner join on
    the canonical (min, max) edge key — no driver-side work anywhere.
    Counts are exact integers; the DuckDB oracle is the canonical a<b<c
    three-way self-join.
    """
    src, dst = edges.columns[:2]
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    # orient by (degree, id): from smaller to larger endpoint
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .localCheckpoint()
    )
    wedges = (
        oriented.alias("l")
        .join(oriented.alias("r"), F.col("l.s") == F.col("r.s"))
        .filter(F.col("l.t") < F.col("r.t"))
        .select(
            F.col("l.s").alias("a"),
            F.col("l.t").alias("b"),
            F.col("r.t").alias("c"),
        )
    )
    tri = wedges.join(
        und,
        (F.least("b", "c") == F.col("u")) & (F.greatest("b", "c") == F.col("v")),
    ).select("a", "b", "c")
    members = tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
    counts = members.groupBy("id").agg(F.count("*").alias("n_tri"))
    universe = und.select(F.col("u").alias("id")).union(
        und.select(F.col("v").alias("id"))
    )
    if nodes is not None:
        universe = universe.union(
            nodes.select(F.col(nodes.columns[0]).alias("id"))
        )
    return (
        universe.distinct()
        .join(counts, "id", "left")
        .select(
            "id", F.coalesce("n_tri", F.lit(0).cast("long")).alias("n_tri")
        )
    )


def node_depth(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """``(id, depth)``: number of proper ancestors of each node in a DAG
    (tree depth when edges form a forest; roots have depth 0).

    Derived from :func:`ancestor_closure` — one count per id plus a left
    join against the node universe so roots (no outgoing parent edge)
    appear with depth 0.
    """
    src, dst = edges.columns[:2]
    closure = ancestor_closure(edges)
    universe = edges.select(F.col(src).alias("id")).union(
        edges.select(F.col(dst).alias("id"))
    )
    if nodes is not None:
        universe = universe.union(
            nodes.select(F.col(nodes.columns[0]).alias("id"))
        )
    depths = closure.groupBy("id").agg(F.count("*").alias("depth"))
    return (
        universe.distinct()
        .join(depths, "id", "left")
        .select("id", F.coalesce("depth", F.lit(0).cast("long")).alias("depth"))
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """Iterated k-peel over an undirected graph: ``(id, core_deg)`` — the
    nodes that survive removing degree-<``k`` vertices (and their edges)
    round after round, with their degree in the surviving subgraph. The
    k-core is the standard density/robustness report for a knowledge graph
    (a reference-style stats job asks "is there a tightly linked nucleus,
    and how big" — singletons/degree histograms, which the reference's
    stats stop at, cannot answer it).

    ``rounds=None`` (production) peels to the FIXPOINT — the true k-core:
    every returned node has ``core_deg >= k``. Convergence is detected by
    the edge count (a peel that removes nothing is terminal), the same
    application-level loop discipline as ``connected_components``:
    ``localCheckpoint`` per round truncates lineage. A fixed ``rounds``
    replays exactly that many peels — deterministic, all-integer, and
    engine-portable, which is the contract-oracle configuration (DuckDB
    unrolls the same rounds as CTE stages; recursive CTEs cannot carry the
    per-round aggregate).

    100 TB shape, per round: ONE degree aggregation (explode of the edge
    endpoints, map-side combined) + two hash semi-joins of the edge table
    against the (nodes-sized, always smaller) keep set — no corpus-sized
    collects, no quadratic blowup; the edge frame only ever SHRINKS. AQE
    handles skewed hub degrees; on a real cluster the edge table is
    bucketed by ``src`` so the semi-joins co-locate.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    src, dst = edges.columns[:2]
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = cur.count()
    # fixpoint mode iterates until a peel removes nothing; max_rounds is a
    # runaway guard that FAILS LOUDLY instead of silently returning a
    # non-converged (core_deg < k possible) frame — r7 ADVICE: a deep-peel
    # graph (e.g. a long path at k=2 needs ~n/2 rounds) used to exhaust the
    # cap and break the documented "every returned node has core_deg >= k"
    # invariant with no error. A graph's peel count is bounded by its node
    # count, so raise max_rounds for legitimately deep graphs.
    total = rounds if rounds is not None else max_rounds
    converged = rounds is not None
    for _ in range(total):
        if n_edges == 0:
            converged = True
            break
        deg = (
            cur.select(F.explode(F.array("u", "v")).alias("id"))
            .groupBy("id")
            .agg(F.count("*").alias("d"))
        )
        kept = deg.filter(F.col("d") >= k).select("id")
        nxt = (
            cur.join(kept.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(kept.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n_next = nxt.count()
        if rounds is None and n_next == n_edges:
            converged = True
            break  # fixpoint: the peel removed nothing
        cur, n_edges = nxt, n_next
    if not converged and n_edges > 0:
        raise RuntimeError(
            f"kcore(k={k}) did not converge within max_rounds={max_rounds} "
            f"peels ({n_edges} edges still shrinking); raise max_rounds — "
            "the fixpoint needs at most one round per node on a path graph"
        )
    return (
        cur.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("core_deg"))
    )
