"""Lexical retrieval scoring — BM25 top-k in EXACT fixed-point arithmetic.

A training-data pipeline retrieves constantly: picking RAG contexts,
mining hard negatives, pulling topical slices out of a 100 TB corpus.
The standard lexical scorer is BM25; this module implements the
engine-wide exact-arithmetic variant so rankings (including ties) are
bit-identical across engines, partitionings, and reruns:

- **idf** is the linear-rational Robertson form without the log,
  ``idf_fp = (idf_scale * (N - df + 1)) // (df + 1)`` — the same
  monotone-in-df ordering, exact integers (the ``top_terms_tfidf``
  linear-idf precedent).
- **tf saturation** keeps real BM25 shape with rational ``k1 = p/q``,
  ``b = r/s``: the classic term
  ``tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))`` with ``avgdl = T/N`` is
  cleared of fractions by multiplying through by ``q*s*T``::

      contrib = (idf_fp * s*(p+q)*T*tf) // (q*s*T*tf + p*(s-r)*T + p*r*dl*N)

  — one integer floor-division per (doc, term) (idf multiplied into the
  numerator BEFORE the division, so the fixed-point scale carries the
  saturation fraction's resolution), summed per doc. Floor-then-sum is
  the defined semantics on both engines.

100 TB shape: corpus statistics (N, T, per-term df) are one bounded pass
(collect = |query| + 2 scalars; on a real deployment they come from table
metadata or maintained term-stat tables). The scoring pass clusters the
token stream by document ONCE — ``repartition(id)`` then (doc, term)
counts, doc lengths, the tf join, and the per-doc score sum ALL ride that
single hash(id) exchange via the subset rule — and the global top-k is a
TakeOrderedAndProject, never a full sort.

Overflow: ``idf_fp * numer`` must fit int64 — ``idf_scale`` defaults to
1e3; keep ``idf_scale * N * (s*(p+q)) * T * max_tf < 2^63`` (drop the
scale for web-scale N).

Reference analog: none — this extends the engine's LLM-training-data
retrieval family (the reference processes ontologies, not corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import tokens

__all__ = ["bm25_scores", "bm25_topk", "bm25_topk_queries", "retrieval_eval"]


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    idf_scale: int = 1000,
) -> DataFrame:
    """``(id_col, score_fp)`` for every document matching >= 1 query term.

    ``k1`` and ``b`` are exact rationals (defaults 6/5 = 1.2 and 3/4 =
    0.75, the textbook BM25 constants). See the module docstring for the
    integer recurrence and the one-exchange plan shape.
    """
    if not query_terms or len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be non-empty and distinct")
    p, q = k1
    r, s = b
    if p <= 0 or q <= 0 or r < 0 or s <= 0 or r > s:
        raise ValueError(f"k1={k1} must be positive, b={b} must be in [0,1]")

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    n_docs = df.count()
    # r8: ONE corpus tokenization into the checkpointed (id, tok, tf) table;
    # the N/T/df/max-tf stats all derive from it (the plan discipline
    # bm25_topk_queries already had — the single-query path used to tokenize
    # the corpus three times: t_total, df stats, and the tf table).
    g = (
        toks.repartition("id")
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()  # fans into stats, dl and tfq below
    )
    stats = g.agg(
        F.sum("tf").alias("t"), F.max("tf").alias("max_tf")
    ).first()
    t_total = stats["t"] or 0
    max_tf = stats["max_tf"] or 0
    df_rows = (
        g.filter(F.col("tok").isin(query_terms))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    idf = {
        row["tok"]: (idf_scale * (n_docs - row["df"] + 1)) // (row["df"] + 1)
        for row in df_rows
    }
    if not idf:
        return df.select(
            F.col(id_col).alias("id"), F.lit(0).cast("long").alias("score_fp")
        ).limit(0)
    idf_col = F.lit(0).cast("long")
    for term in sorted(idf):
        idf_col = F.when(F.col("tok") == F.lit(term), F.lit(idf[term])).otherwise(
            idf_col
        )
    # r7 ADVICE: the documented int64 precondition is now CHECKED at runtime
    # from the already-collected scalars (Spark non-ANSI arithmetic wraps
    # silently, which would corrupt rankings, not crash). max dl <= t_total.
    numer_chk = max(idf.values()) * s * (p + q) * t_total * max_tf
    denom_chk = (
        q * s * t_total * max_tf + p * (s - r) * t_total + p * r * t_total * n_docs
    )
    if max(numer_chk, denom_chk) >= 2**62:  # 2x safety margin under int64
        raise ValueError(
            f"BM25 fixed-point products risk int64 overflow (numerator bound "
            f"{numer_chk}, denominator bound {denom_chk}); lower idf_scale "
            f"(={idf_scale}) or score per shard"
        )
    dl = g.groupBy("id").agg(F.sum("tf").alias("dl"))
    tfq = g.filter(F.col("tok").isin(query_terms))
    numer_n = s * (p + q)
    a_c, b_c, c_c = q * s, p * (s - r), p * r
    contrib = (
        tfq.join(dl, "id")
        .select(
            "id",
            (
                (idf_col * F.expr(f"CAST({numer_n} AS BIGINT) * {t_total} * tf"))
                .cast("long")
                .alias("_num")
            ),
            F.expr(
                f"CAST({a_c} AS BIGINT) * {t_total} * tf"
                f" + CAST({b_c} AS BIGINT) * {t_total}"
                f" + CAST({c_c} AS BIGINT) * dl * {n_docs}"
            ).alias("_den"),
        )
        .select(
            "id",
            F.expr("_num div _den").alias("c"),
        )
    )
    return contrib.groupBy("id").agg(F.sum("c").alias("score_fp"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Global top-``k`` by (score DESC, id ASC) — deterministic ties, and
    the limit pushes into a TakeOrderedAndProject (no full sort)."""
    return (
        bm25_scores(df, query_terms, id_col=id_col, text_col=text_col, **kwargs)
        .orderBy(F.desc("score_fp"), "id")
        .limit(k)
    )


def bm25_topk_queries(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    term_col: str = "term",
    k1: tuple[int, int] = (6, 5),
    b: tuple[int, int] = (3, 4),
    idf_scale: int = 1000,
) -> DataFrame:
    """Batch BM25 over a QUERY TABLE — (query_id, id, score_fp, rank),
    top-``k`` per query by (score DESC, id ASC). This is the shape for
    scoring thousands of queries in one corpus pass (RAG context mining,
    retrieval-eval sweeps), where :func:`bm25_topk` takes one literal term
    list.

    ``queries``: (query_id, term) rows; duplicate terms within a query are
    collapsed (set semantics, same as the literal variant's distinct-terms
    contract). Arithmetic is the module's exact fixed-point recurrence,
    unchanged.

    100 TB shape: the corpus is tokenized and clustered by document ONCE
    (``repartition(id)`` into the checkpointed (doc, term, tf) frame);
    N / T / per-term df all derive from that frame, never from a second
    text pass, and df stats join in-plan (broadcast — no driver CASE
    literal, the term dimension can be thousands wide). Everything after
    the checkpoint operates on tf-table- or query-bounded frames (the
    checkpoint drops partitioning metadata, so those small aggregations
    re-exchange — corpus-independent cost). Per-query top-k is
    :func:`~kg_obo_spark.operators.similarity.salted_topk` — no
    single-reducer window.
    """
    p, q = k1
    r, s = b
    if p <= 0 or q <= 0 or r < 0 or s <= 0 or r > s:
        raise ValueError(f"k1={k1} must be positive, b={b} must be in [0,1]")
    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(term_col).alias("term"),
        )
        .distinct()
        .localCheckpoint()  # tiny; fans into df-stats and the score join
    )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    # ONE corpus tokenization: g is checkpointed, and N / T / per-term df
    # all derive from it (T = sum(tf); df = rows per tok since g is
    # distinct (id, tok)) — no second pass over the text
    g = (
        toks.repartition("id")
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()  # fans into stats, dl, and the query-term slice
    )
    n_docs = df.count()
    t_total = g.agg(F.sum("tf")).collect()[0][0] or 0
    terms = qt.select("term").distinct()
    idf = (
        g.join(F.broadcast(terms), g["tok"] == terms["term"])
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "tok",
            F.expr(
                f"(CAST({int(idf_scale)} AS BIGINT) * ({n_docs} - df + 1))"
                f" div (df + 1)"
            ).alias("idf_fp"),
        )
    )
    dl = g.groupBy("id").agg(F.sum("tf").alias("dl"))
    numer_n = s * (p + q)
    a_c, b_c, c_c = q * s, p * (s - r), p * r
    scored = (
        g.join(F.broadcast(idf), "tok")
        .join(F.broadcast(qt), F.col("tok") == F.col("term"))
        .join(dl, "id")
        .select(
            "query_id",
            "id",
            F.expr(
                f"(idf_fp * (CAST({numer_n} AS BIGINT) * {t_total} * tf))"
                f" div (CAST({a_c} AS BIGINT) * {t_total} * tf"
                f"      + CAST({b_c} AS BIGINT) * {t_total}"
                f"      + CAST({c_c} AS BIGINT) * dl * {n_docs})"
            ).alias("c"),
        )
        .groupBy("query_id", "id")
        .agg(F.sum("c").cast("long").alias("score_fp"))
    )
    from pyspark.sql.window import Window

    from kg_obo_spark.operators.similarity import salted_topk

    top = salted_topk(scored, "query_id", "score_fp", "id", k)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_fp"), F.col("id").asc()
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def retrieval_eval(
    results: DataFrame,
    truth: DataFrame,
    query_id_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval quality per query, in exact integers: ``(query_id,
    n_truth, hits, recall_e6, rr_e6)`` where ``recall_e6 = floor(1e6 *
    hits / n_truth)`` and ``rr_e6 = floor(1e6 / first_relevant_rank)``
    (0 when no returned row is relevant) — recall@k and reciprocal rank,
    the two numbers every ANN/LSH/BM25 configuration is tuned against.

    ``results``: (query_id, neighbor_id, rank) — an operator output such as
    :func:`bm25_topk_queries`, :func:`~kg_obo_spark.operators.similarity.
    ann_quantized_topk` or ``ivf_topk``. ``truth``: (query_id, neighbor_id)
    relevant pairs (e.g. the exact top-k, or labeled qrels). Every truth
    query gets a row — a query the results missed entirely scores 0/0.

    100 TB shape: one (query, neighbor)-keyed join of two already-small
    frames (both bounded by queries x k) + per-query aggregations riding
    the same clustering; integer arithmetic end to end, so the report is
    engine-exact (oracle-able) and rerun-stable.
    """
    res = results.select(
        F.col(query_id_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
        F.col(rank_col).cast("long").alias("rank"),
    )
    tru = truth.select(
        F.col(query_id_col).alias("query_id"),
        F.col(neighbor_col).alias("neighbor_id"),
    ).distinct()
    n_truth = tru.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    )
    matched = res.join(tru, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("hits"),
        F.min("rank").alias("_first"),
    )
    return (
        n_truth.join(matched, "query_id", "left")
        .select(
            "query_id",
            "n_truth",
            F.coalesce("hits", F.lit(0).cast("long")).alias("hits"),
            F.expr(
                "div(1000000 * coalesce(hits, CAST(0 AS BIGINT)), n_truth)"
            ).alias("recall_e6"),
            F.coalesce(
                F.expr("div(CAST(1000000 AS BIGINT), _first)"),
                F.lit(0).cast("long"),
            ).alias("rr_e6"),
        )
    )
