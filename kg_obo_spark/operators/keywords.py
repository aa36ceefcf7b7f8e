"""Per-document keyword extraction: top-k terms by TF-IDF.

The corpus-analytics classic — term frequency weighted against corpus-wide
document frequency — used for corpus exploration, near-duplicate triage, and
topic labeling at training-data scale.

The score is the LINEAR idf variant with the corpus constant dropped:
``score = tf / df`` as the exact fixed-point integer ``(1_000_000 * tf) //
df``. Within a document this ranks identically to ``tf * N / df`` (N is
constant) and to any monotone reweighting of ``tf/df``; the integer form
makes the result — including tie-breaks (alphabetical by term) —
bit-identical in any engine, any partitioning, any rerun, and never
overflows (``1e6 * tf`` fits a long for any document). A log-idf column is
a consumer-side transform; its last-ulp libm differences are not
cross-engine stable, so it is deliberately not part of the verified value.

Reference analog: none — kg-obo has no corpus-statistics operators; this is
part of the LLM-training-data analytics family added on top.

100 TB shape: explode tokens -> (doc, term) count aggregation (map-side
partial combine, ONE exchange on (doc, term)) -> document frequency as a
window over ``term`` (exchange two) -> per-doc top-k rank window (exchange
three). Three clusterings are inherent to an inverted-index computation
(term-doc, term, doc); none is a self-join and nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import tokens

#: fixed-point scale for the integer tf/df score
SCORE_SCALE = 1_000_000


def top_terms_tfidf(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top ``k`` terms of every document by exact-integer TF-IDF.

    Returns (``id_col``, ``term``, ``tf``, ``df``, ``score_e6``, ``rank``):
    term count within the doc, number of docs containing the term, the
    fixed-point score ``(1e6 * tf) // df``, and the 1-based rank
    (score desc, term asc). Documents with no tokens produce no rows.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    t = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = t.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.select(
        id_col,
        "term",
        "tf",
        F.count(F.lit(1)).over(Window.partitionBy("term")).alias("df"),
    ).select(
        id_col,
        "term",
        "tf",
        "df",
        # div() is exact long floor-division (never a double round-trip)
        F.expr(f"div({SCORE_SCALE} * tf, df)").alias("score_e6"),
    )
    rank_w = Window.partitionBy(id_col).orderBy(
        F.col("score_e6").desc(), F.col("term").asc()
    )
    return (
        scored.select(
            id_col,
            "term",
            "tf",
            "df",
            "score_e6",
            F.row_number().over(rank_w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("score_e6").cast("long").alias("score_e6"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
