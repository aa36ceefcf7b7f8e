"""Sliding-window document chunking for RAG / context-window splitting.

A retrieval or training pipeline rarely consumes whole documents: it wants
fixed-size token windows with a configurable overlap (stride < window), so
that no passage is ever split across a hard boundary without also appearing
whole in a neighboring chunk. This is the standard overlapping-window
splitter, expressed as a pure dataflow.

Window layout for a document of ``n`` tokens, window ``chunk_tokens`` and
``stride``: chunk ``i`` starts at token ``i * stride`` for
``i = 0 .. ceil(max(0, n - chunk_tokens) / stride)`` and takes
``min(chunk_tokens, n - start)`` tokens. Every token is covered, every chunk
except a document's last is exactly full, and no chunk is wholly contained
in its predecessor (requires ``stride <= chunk_tokens``). Empty documents
produce no chunks.

The token model is :func:`kg_obo_spark.functions.text.tokens` (whitespace
runs, empties filtered) — the single token model shared by token_count,
repetition metrics, packing, and the Gopher quality filter.

Reference analog: none — kg-obo processes ontologies as atomic units
(reference: kg_obo/transform.py). Chunking is part of the LLM-training-data
family this engine adds on top of the reference's inventory.

100 TB shape: a map-side codegen projection with ZERO exchange — tokenize,
explode a bounded ``sequence`` of window indices, slice. Fan-out per
document is ``ceil(n / stride)`` rows, bounded by document length; filters
and column pruning still push to the scan. The token array is staged behind
an alias in a prior select so it is materialized once per row, not
re-derived per reference (CollapseProject keeps a multiply-referenced
non-cheap alias as its own Project).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Returns one row per chunk:

    - ``doc_id``     — the source document (``id_col``)
    - ``chunk_id``   — 0-based window index within the document (long)
    - ``tok_start``  — token offset of the window start (long)
    - ``n_tokens``   — tokens in this chunk (long; full except a doc's last)
    - ``chunk_text`` — the window's tokens joined with single spaces

    ``stride`` defaults to ``chunk_tokens`` (disjoint chunks); a smaller
    stride overlaps consecutive windows by ``chunk_tokens - stride`` tokens.

    ``tokenizer`` plugs a subword token model into the window arithmetic
    (e.g. :class:`~kg_obo_spark.functions.tokenizer.GreedyWordpiece`;
    ``chunk_text`` is then the subword pieces joined by spaces); ``None``
    keeps the whitespace ``tokens()`` model. The tokenizer's
    ``pieces_frame`` is a map-side stage, so the zero-exchange plan shape
    is unchanged either way.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if stride is None:
        stride = chunk_tokens
    if not (0 < stride <= chunk_tokens):
        raise ValueError(
            f"stride must be in (0, chunk_tokens={chunk_tokens}], got {stride}"
        )
    if tokenizer is None:
        d = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    else:
        d = tokenizer.pieces_frame(df, id_col=id_col, text_col=text_col)
    d = d.select(
        id_col, "_toks", F.size("_toks").cast("long").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    # last window index: 0 when the document fits one window, else the
    # ceil-division ceil((n_tok - chunk) / stride); floor((a + b - 1) / b)
    # on longs is exact far beyond any document length
    last = F.when(F.col("n_tok") <= F.lit(chunk_tokens), F.lit(0)).otherwise(
        F.floor(
            (F.col("n_tok") - F.lit(chunk_tokens) + F.lit(stride) - 1)
            / F.lit(stride)
        )
    )
    d = d.select(
        id_col,
        "_toks",
        "n_tok",
        F.explode(F.sequence(F.lit(0).cast("long"), last.cast("long"))).alias(
            "chunk_id"
        ),
    )
    tok_start = F.col("chunk_id") * F.lit(stride)
    n = F.least(F.lit(chunk_tokens).cast("long"), F.col("n_tok") - tok_start)
    return d.select(
        id_col,
        F.col("chunk_id"),
        tok_start.cast("long").alias("tok_start"),
        n.alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), tok_start.cast("int") + 1, n.cast("int")),
            " ",
        ).alias("chunk_text"),
    )
