"""Sequence packing for training-data pipelines.

A language-model training run does not consume documents — it consumes
fixed-length token sequences. The standard concat-and-chunk packing
(GPT-style): order the corpus deterministically, concatenate every
document's tokens into one stream, and cut the stream every ``budget``
tokens. A long document spans sequence boundaries, a sequence holds many
short documents, and no token of padding is wasted.

This expresses packing as a pure dataflow instead of a sequential pass:
each document is mapped to every ``(shard, seq_id)`` training sequence its
token span overlaps, together with the exact slice offsets — enough for a
reader to assemble any sequence from the source documents without ever
materializing the concatenated token stream.

The ordering is :func:`~kg_obo_spark.operators.sampling.epoch_shard_assignment`'s
md5 epoch permutation (engine-portable, rerun- and partitioning-independent),
so the full packing layout is value-verifiable in any engine. A new seed is
a fresh epoch layout.

Reference analog: none — kg-obo processes ontologies as atomic units
(reference: kg_obo/transform.py). Packing is part of the LLM-training-data
family this engine adds on top of the reference's inventory.

100 TB shape: shard/order-key assignment is a map-side codegen projection;
the ONLY exchange is the hash partition on ``shard`` for the running
token-count window (pick ``n_shards`` so one shard's rows fit a task —
md5 sharding keeps shard sizes uniform regardless of document skew); the
boundary explode and slice arithmetic are codegen map-side on top of the
window. One exchange total, plan-pinned in tests/test_packing.py. The
explode fan-out is bounded: a document of T tokens emits at most
``T // budget + 1`` rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import token_count
from kg_obo_spark.operators.sampling import epoch_shard_assignment


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """Map every document onto the fixed-``budget`` training sequences it
    occupies under concat-and-chunk packing of the (seed, n_shards) epoch
    order. Empty documents (zero tokens) occupy no span and are dropped.

    Returns one row per (document, sequence) overlap:

    - ``shard``      — epoch shard (int)
    - ``seq_id``     — 0-based sequence number within the shard (long)
    - ``doc_id``     — the source document (``id_col``)
    - ``seq_pos``    — token position within the sequence where this
      document's slice starts (long, ``0 <= seq_pos < budget``)
    - ``doc_offset`` — token offset within the document where the slice
      starts (long)
    - ``n_tokens``   — tokens this document contributes to this sequence
      (long, ``1 <= n_tokens <= budget``)

    Every sequence of a shard except its last is exactly ``budget`` tokens
    full; per-document slices are contiguous and partition the document.

    ``tokenizer`` plugs a subword token model into the budget arithmetic
    (e.g. :class:`~kg_obo_spark.functions.tokenizer.GreedyWordpiece`, so
    sequence boundaries match what a training run actually consumes);
    ``None`` keeps the whitespace ``token_count`` model. The tokenizer's
    ``counts_frame`` is a map-side stage, so the one-exchange plan shape
    is unchanged either way.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if tokenizer is None:
        counts = df.select(
            F.col(id_col), token_count(F.col(text_col)).alias("n_tok")
        )
    else:
        counts = tokenizer.counts_frame(df, id_col=id_col, text_col=text_col)
    return pack_counted(counts, budget, n_shards=n_shards, seed=seed, id_col=id_col)


def pack_counted(
    counts: DataFrame,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """The packing dataflow over a pre-counted frame (``id_col``, ``n_tok``
    [, passthrough...]): epoch shard/order assignment, the per-shard
    running-count window (the ONE exchange), boundary explode, slice
    arithmetic. ``passthrough`` columns ride the window untouched and come
    back on every output row (unit metadata such as an SFT example's mask
    boundary — no join needed). pack_sequences delegates here; the plan
    shape and output contract are its docstring's."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    d = epoch_shard_assignment(counts, n_shards=n_shards, seed=seed, id_col=id_col)
    d = d.select(
        "shard",
        "order_key",
        F.col(id_col),
        "n_tok",
        *passthrough,
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("order_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # project the window first, THEN explode: Spark rejects a window
    # function inside explode()'s child expression
    d = d.select(
        "shard",
        id_col,
        "n_tok",
        *passthrough,
        F.sum("n_tok").over(w).alias("tok_end"),
    ).select(
        "shard",
        id_col,
        *passthrough,
        (F.col("tok_end") - F.col("n_tok")).alias("tok_start"),
        "tok_end",
    )
    d = d.select(
        "shard",
        id_col,
        *passthrough,
        "tok_start",
        "tok_end",
        F.explode(
            F.sequence(
                F.floor(F.col("tok_start") / F.lit(budget)),
                F.floor((F.col("tok_end") - 1) / F.lit(budget)),
            )
        ).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * F.lit(budget)
    slice_start = F.greatest(F.col("tok_start"), seq_start)
    slice_end = F.least(F.col("tok_end"), seq_start + F.lit(budget))
    return d.select(
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col(id_col),
        *passthrough,
        (slice_start - seq_start).cast("long").alias("seq_pos"),
        (slice_start - F.col("tok_start")).cast("long").alias("doc_offset"),
        (slice_end - slice_start).cast("long").alias("n_tokens"),
    )


def pack_sft_examples(
    examples: DataFrame,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "example_id",
    context_col: str = "context",
    response_col: str = "response",
) -> DataFrame:
    """Pack SFT (context, response) examples into fixed-``budget`` training
    sequences WITH the loss-mask geometry a trainer needs: concat-and-chunk
    over the rendered example token stream (context tokens then response
    tokens), emitting per-(example, sequence) slices plus how many of each
    slice's tokens are loss-active (response tokens — context tokens are
    masked out of the loss in SFT).

    Returns (shard, seq_id, ``id_col``, seq_pos, ex_offset, n_tokens,
    n_loss_tokens): the pack_sequences slice contract over examples, where
    ``ex_offset`` is the slice's token offset within the example and
    ``n_loss_tokens = |slice ∩ [n_context_tokens, n_total)|`` — summing it
    per sequence gives the sequence's supervised-token count; a slice
    entirely inside the context contributes 0.

    Token counts are whitespace ``token_count`` over the RENDERED strings
    (the "role: text" context includes its role labels — what the trainer
    actually tokenizes), so the mask boundary is exact for the emitted
    text. Dataflow: one map-side count projection + the pack_counted
    window — the mask boundary rides the shuffle as a passthrough column,
    never a join. ONE exchange on top of whatever produced the examples;
    plan-pinned in tests/test_packing.py.
    """
    n_ctx = token_count(F.col(context_col))
    n_resp = token_count(F.col(response_col))
    counts = examples.select(
        F.col(id_col),
        n_ctx.cast("long").alias("_nctx"),
        (n_ctx + n_resp).cast("long").alias("n_tok"),
    )
    spans = pack_counted(
        counts, budget, n_shards=n_shards, seed=seed, id_col=id_col,
        passthrough=("_nctx",),
    )
    slice_end = F.col("doc_offset") + F.col("n_tokens")
    loss = slice_end - F.greatest(F.col("doc_offset"), F.col("_nctx"))
    return spans.select(
        "shard",
        "seq_id",
        id_col,
        "seq_pos",
        F.col("doc_offset").alias("ex_offset"),
        "n_tokens",
        F.greatest(F.lit(0), loss).cast("long").alias("n_loss_tokens"),
    )


def pack_examples_atomic(
    counts: DataFrame,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "example_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """EXAMPLE-ATOMIC greedy packing (first-fit in epoch order, no splits):
    unlike concat-and-chunk (:func:`pack_counted`), every unit is placed
    whole — a new sequence starts whenever the next unit would overflow the
    budget — which is the standard SFT packing policy (an example split
    across sequences would train on a truncated response). Units larger
    than the budget cannot be placed and are EXCLUDED (route them through
    chunking/truncation upstream); empty units are dropped.

    Input: (``id_col``, ``n_tok`` [, passthrough...]). Returns
    (shard, seq_id, ``id_col``, [passthrough...,] seq_pos, n_tokens).

    Dataflow: the fill state is a SEQUENTIAL fold — seq boundaries depend
    on every predecessor, which no window/prefix-sum expresses — so this is
    the legitimate applyInPandas case: one task per shard runs the greedy
    fill over its (order_key, id)-sorted units, parallel ACROSS shards.
    Exactly the window exchange pack_counted pays, same key; pick
    ``n_shards`` so one shard's unit rows fit a task (md5 sharding keeps
    shards uniform). The layout is a pure function of
    (corpus, budget, n_shards, seed) — partitioning-independent, mirrored
    by a recursive-CTE oracle.
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    d = epoch_shard_assignment(counts, n_shards=n_shards, seed=seed, id_col=id_col)
    d = d.select("shard", "order_key", id_col, "n_tok", *passthrough).filter(
        (F.col("n_tok") > 0) & (F.col("n_tok") <= budget)
    )
    id_type = d.schema[id_col].dataType.simpleString()
    pt_schema = "".join(
        f", {f.name} {f.dataType.simpleString()}"
        for f in d.schema.fields
        if f.name in passthrough
    )
    out_schema = (
        f"shard int, seq_id long, {id_col} {id_type}{pt_schema}, "
        "seq_pos long, n_tokens long"
    )

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["order_key", id_col], kind="mergesort")
        seq_ids, seq_poss = [], []
        seq, pos = 0, 0
        for n in pdf["n_tok"]:
            n = int(n)
            if pos + n > budget:
                seq += 1
                pos = 0
            seq_ids.append(seq)
            seq_poss.append(pos)
            pos += n
        out = pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "seq_id": pd.Series(seq_ids, dtype="int64"),
                id_col: pdf[id_col].to_numpy(),
                **{c: pdf[c].to_numpy() for c in passthrough},
                "seq_pos": pd.Series(seq_poss, dtype="int64"),
                "n_tokens": pdf["n_tok"].astype("int64").to_numpy(),
            }
        )
        return out

    return d.groupBy("shard").applyInPandas(fill, schema=out_schema)


def pack_sft_examples_atomic(
    examples: DataFrame,
    budget: int,
    n_shards: int = 64,
    seed: int = 0,
    id_col: str = "example_id",
    context_col: str = "context",
    response_col: str = "response",
) -> DataFrame:
    """Example-atomic SFT packing: :func:`pack_examples_atomic` over
    rendered (context, response) token counts, with the loss-mask size
    carried through (``n_loss_tokens`` = the example's response tokens —
    whole examples are placed, so the mask is a constant per row, not an
    overlap computation). Examples longer than the budget are excluded
    (see pack_examples_atomic); truncate or chunk them upstream.

    Returns (shard, seq_id, ``id_col``, seq_pos, n_tokens, n_loss_tokens).
    """
    n_ctx = token_count(F.col(context_col))
    n_resp = token_count(F.col(response_col))
    counts = examples.select(
        F.col(id_col),
        (n_ctx + n_resp).cast("long").alias("n_tok"),
        n_resp.cast("long").alias("_nloss"),
    )
    placed = pack_examples_atomic(
        counts, budget, n_shards=n_shards, seed=seed, id_col=id_col,
        passthrough=("_nloss",),
    )
    return placed.select(
        "shard",
        "seq_id",
        id_col,
        "seq_pos",
        "n_tokens",
        F.col("_nloss").alias("n_loss_tokens"),
    )
