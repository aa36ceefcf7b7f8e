"""Streaming corpus curation: continuous benchmark decontamination.

The batch :func:`~kg_obo_spark.functions.text.ngram_contamination` computes
per-document benchmark n-gram overlap with a lead() window + two
aggregations — stateful plans a streaming query can't run in append mode.
But a document is ONE ROW of the corpus, so the whole statistic is
row-local: this variant evaluates it inside a stateless ``mapInPandas``
against a driver-broadcast set of the benchmark's distinct grams, making
decontamination a continuous-ingest operator (ROADMAP candidate 7, second
leg; the quality-filter leg needs no variant at all — it is already a pure
projection, pinned by tests/test_streaming_curation.py).

The benchmark side is static by definition (an eval set), so its gram set
is materialized ONCE before the stream starts — the same boundedness
assumption the batch operator's broadcast join makes.

Token model: :func:`~kg_obo_spark.functions.text.py_tokens`, the exact
Python mirror of the engine-wide Java ``\\s+`` (ASCII) ``tokens()`` model —
pre-r7 this used ``str.split()`` (Unicode whitespace), which silently
diverged on U+00A0/U+2028 corpora. Equivalence with the batch operator is
pinned per micro-batch in tests/test_streaming_curation.py.

Throughput (r7 finding, BENCH/NEWOPS_R7.md): the per-gram ``g in set``
probe IS the fast path. The r6-suggested vectorization (pd.util.hash_array
over the batch's grams + np.searchsorted against a pre-hashed benchmark
array) measured 4x SLOWER — CPython's cached str hash + O(1) set lookup
(~50 ns/gram, C) beats keyed siphash (~1.2 us/string through pandas) plus a
log-n binary search, exactly (no hash-collision caveat). The remaining cost
is gram-STRING construction, which the batch operator pays JVM-side too;
if this stage ever bottlenecks a production stream, the lever is fewer/
shorter gram strings (interning, token-id grams), not probe vectorization.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import py_tokens, tokens


def benchmark_gram_set(
    benchmark: DataFrame, n: int = 3, text_col: str = "text"
) -> frozenset[str]:
    """The benchmark corpus's distinct word n-grams, collected to the driver
    (bounded: an eval set). JVM-side gram construction via the shared
    tokens() model, so the set equals the batch operator's broadcast side."""
    toks = tokens(F.col(text_col))
    grams = benchmark.select(
        F.explode(
            F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                )
            )
        ).alias("gram")
    ).distinct()
    return frozenset(r["gram"] for r in grams.collect())


def stream_ngram_contamination(
    spark: SparkSession,
    doc_stream: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document contamination stats on a stream: for each arriving
    document, (``id_col``, n_distinct_grams, n_contaminated,
    contamination_frac) against the static ``benchmark``. Documents with
    fewer than ``n`` tokens produce no row (as in the batch operator).
    Stateless — safe in append mode, no watermark needed."""
    bench_bc = spark.sparkContext.broadcast(
        benchmark_gram_set(benchmark, n=n, text_col=text_col)
    )
    id_type = doc_stream.schema[id_col].dataType.simpleString()

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bench = bench_bc.value
        for pdf in batches:
            ids, n_grams, n_cont, fracs = [], [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col].astype(str)):
                ws = py_tokens(text)
                if len(ws) < n:
                    continue
                grams = {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}
                c = sum(1 for g in grams if g in bench)
                ids.append(i)
                n_grams.append(len(grams))
                n_cont.append(c)
                fracs.append(c / len(grams))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "n_distinct_grams": pd.Series(n_grams, dtype="int64"),
                    "n_contaminated": pd.Series(n_cont, dtype="int64"),
                    "contamination_frac": pd.Series(fracs, dtype="float64"),
                }
            )

    return doc_stream.select(id_col, text_col).mapInPandas(
        stats,
        schema=(
            f"{id_col} {id_type}, n_distinct_grams long, "
            "n_contaminated long, contamination_frac double"
        ),
    )
