"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, cosine via JVM-side ``zip_with`` +
  ``aggregate`` (no Python), rank with a window per query. One shuffle
  (the per-query top-k), linear scan of the corpus — the right shape when
  queries are few and the corpus is the big side.
- **IVF (inverted-file) top-k** — the 100 TB path: assign every vector to its
  nearest of C deterministic centroids (partition pruning analog: only the
  query's ``nprobe`` nearest cells are scanned). Approximate; recall measured
  against brute force in tests.

Dot products on array columns stay inside codegen; floats are cast to double
and rounded (6dp) so the DuckDB oracle can value-match the exact variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    (query_id, neighbor_id, sim, rank); excludes self-matches when ids collide.
    Ties broken by neighbor id asc — deterministic."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
        )
    )
    scored = embeddings.crossJoin(q).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine). Centroids are a
    broadcast dimension: (centroid_id, centroid_vec)."""
    c = F.broadcast(centroids)
    scored = embeddings.crossJoin(c).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine(F.col(vec_col), F.col("centroid_vec")).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def deterministic_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """First n vectors by id as centroids — deterministic, no RNG (workflow
    constraint); real deployments would run k-means|| offline."""
    return (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy(id_col))
            .alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: scan only the ``nprobe`` cells nearest each query.

    At scale the assignment table is written partitioned by centroid_id, so a
    query reads nprobe/n_centroids of the corpus (partition pruning)."""
    cents = deterministic_centroids(embeddings, n_centroids, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    qcells = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qv", "centroid_id",
            cosine(F.col("qv"), F.col("centroid_vec")).alias("csim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("csim").desc(), F.col("centroid_id")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = assigned.join(F.broadcast(qcells), "centroid_id").select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), F.col("qv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
