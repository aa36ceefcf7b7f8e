"""Transcript / conversation analytics and training-example construction.

The north-star input (BASELINE.json ``input_hint``) is an Iceberg table of
multi-turn conversation / agent transcripts with columns
``(conv_id, turn_idx, role, text, tool, ts)``. These operators consume that
shape directly and cover what a training-data pipeline does with transcripts
*besides* KG construction: SFT (context, response) example assembly,
preference-pair (RLHF) construction, per-conversation rollups, and tool-call
sequence analytics. Reference analog: none — kg-obo stops at graph
materialization; this family is the training-data layer on top (same tier as
packing/chunking/mixture in operators/packing.py etc.).

For the driver contract the ``documents`` table is reshaped deterministically
(:func:`transcripts_from_documents`) so every operator here is
DuckDB-value-oracled end to end.

Scale notes (100 TB, 10^12 turns): every operator clusters by ``conv_id``
exactly once — one hash exchange, with any follow-up per-conversation
aggregation riding the same partitioning (Spark's output-partitioning subset
rule). Conversations are bounded (thousands of turns, not billions), so
per-key state never skews the way hot entities do in the KG path; no salting
needed. Nothing here joins, collects, or holds more than one conversation's
turns in a window frame at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kg_obo_spark.functions.text import tokens

__all__ = [
    "transcripts_from_documents",
    "sft_examples",
    "sft_examples_budget",
    "conversation_stats",
    "tool_bigrams",
    "assign_conversation_splits",
    "chunk_conversations",
    "chunk_conversations_budget",
    "dedup_conversations",
    "preference_pairs",
    "conversation_embeddings",
    "conversation_near_dup",
    "cluster_conversations",
    "conversation_near_dup_clustered",
]

# Epoch base for the deterministic synthetic timestamp column (seconds).
TS_BASE_S = 1_700_000_000
TURNS_PER_CONV = 4


def transcripts_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic map-only reshape of the ``documents`` table into the
    north-star transcript schema (BASELINE.json input_hint):

    - ``conv_id``  = doc_id // 4            (4 turns per conversation)
    - ``turn_idx`` = doc_id % 4
    - ``role``     = user / assistant alternating (even / odd turn)
    - ``tool``     = 'tool_<doc_id % 3>' on assistant turns where
      doc_id % 5 != 0, else NULL (not every assistant turn calls a tool)
    - ``ts_s``     = TS_BASE_S + doc_id * 60 (integer epoch seconds — kept
      as a BIGINT, not a timestamp, so cross-engine oracle comparison is
      exact with no timezone/precision semantics in play)

    Pure projection: zero exchanges, fully mirrored in ANSI SQL by the
    oracle (same arithmetic on doc_id). Production input is a real
    transcript table (kg_obo_spark.datagen.transcripts / TableIO Iceberg
    layout); this reshape exists so the driver's SQL-visible tables can
    exercise the identical operator code.
    """
    doc_id = F.col("doc_id")
    turn_idx = F.pmod(doc_id, F.lit(TURNS_PER_CONV)).cast("int")
    return docs.select(
        F.floor(doc_id / TURNS_PER_CONV).cast("long").alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(turn_idx % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        F.when(
            (turn_idx % 2 == 1) & (F.pmod(doc_id, F.lit(5)) != 0),
            F.concat(F.lit("tool_"), F.pmod(doc_id, F.lit(3)).cast("string")),
        ).alias("tool"),
        (F.lit(TS_BASE_S) + doc_id * 60).cast("long").alias("ts_s"),
        F.col("text"),
    )


def sft_examples(tr: DataFrame, sep: str = "\n") -> DataFrame:
    """SFT (context, response) training examples: one row per assistant turn
    that has at least one preceding turn, with ``context`` = every prior
    turn rendered as ``role: text`` joined by ``sep`` (chat-template
    flattening) and ``response`` = the assistant turn's text.

    Returns (conv_id, turn_idx, context, response, n_context_turns).

    Dataflow: ONE exchange — hash(conv_id) for the running-context window
    (rows UNBOUNDED PRECEDING .. 1 PRECEDING over turn_idx order); the
    role filter and rendering are map-side around it. At 10^12 turns the
    frame holds one conversation prefix at a time — context size is bounded
    by conversation length, never corpus size. Plan-pinned in
    tests/test_conversations.py.
    """
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = tr.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("text").alias("response"),
        F.array_join(F.collect_list(line).over(w), sep).alias("context"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_context_turns"),
    )
    return out.filter(
        (F.col("role") == "assistant") & (F.col("n_context_turns") >= 1)
    ).select("conv_id", "turn_idx", "context", "response", "n_context_turns")


def _append_subword_counts(tr: DataFrame, tokenizer) -> DataFrame:
    """Map-side pass-through that appends ``_nt0`` = the turn's subword
    token count under ``tokenizer`` (the tokenizer-seam discipline from
    packing/chunking: a mapInPandas stage, zero exchange, py_tokens word
    splitting so Python and JVM stages agree on word boundaries)."""
    from typing import Iterator as _It

    import pandas as pd

    from kg_obo_spark.functions.text import py_tokens

    cols = tr.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in tr.schema.fields
    ) + ", _nt0 long"

    def gen(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_nt0"] = pd.Series(
                [
                    sum(
                        len(tokenizer.encode_word(w))
                        for w in py_tokens(str(t))
                    )
                    for t in pdf["text"]
                ],
                dtype="int64",
                index=pdf.index,
            )
            yield pdf

    return tr.select(*cols).mapInPandas(gen, schema=schema)


def sft_examples_budget(
    tr: DataFrame,
    max_context_tokens: int,
    sep: str = "\n",
    tokenizer=None,
) -> DataFrame:
    """SFT example assembly under a CONTEXT-WINDOW TOKEN BUDGET: like
    :func:`sft_examples`, but the context keeps only the most recent prior
    turns whose combined whitespace-token count fits ``max_context_tokens``
    (left-truncation, the standard chat-training policy). A single long
    prior turn that doesn't fit is dropped entirely (turn granularity — no
    mid-turn splits), so the context can be empty while the example row
    survives.

    ``tokenizer`` (the packing/chunking seam, e.g.
    :class:`~kg_obo_spark.functions.tokenizer.GreedyWordpiece`) switches the
    budget to SUBWORD token counts — the units a training run's context
    window is actually measured in (~1.8x whitespace on this corpus) —
    via a map-side count stage; None keeps the whitespace model.

    Returns (conv_id, turn_idx, context, response, n_context_turns,
    n_context_tokens).

    Dataflow: the turn-inclusion rule is a SUFFIX test on the running token
    cumsum — prior turn j is in budget for assistant turn i iff
    C(j-1) >= C(i-1) - budget, where C is one forward cumulative sum — so
    one hash(conv_id) exchange covers everything: both window frames (the
    cumsum and the prior-struct collect) share the partitioning+order, and
    the budget filter/render are map-side HOFs over the collected
    conversation prefix (bounded by conversation length, never corpus
    size). The kept array is staged behind an alias so the multi-reference
    HOF evaluates once (CollapseProject keeps non-cheap aliases).
    Plan-pinned in tests/test_conversations.py.
    """
    if max_context_tokens <= 0:
        raise ValueError(
            f"max_context_tokens must be positive, got {max_context_tokens}"
        )
    if tokenizer is not None:
        tr = _append_subword_counts(tr, tokenizer)
        n_tok = F.col("_nt0")
    else:
        n_tok = F.size(tokens(F.col("text"))).cast("long")
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    w_cum = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_prev = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = tr.select(
        "conv_id",
        "turn_idx",
        "role",
        F.col("text").alias("response"),
        F.sum(n_tok).over(w_cum).alias("_cum"),
        n_tok.alias("_nt"),
        F.collect_list(
            F.struct(
                line.alias("line"),
                (F.sum(n_tok).over(w_cum) - n_tok).alias("cum_prev"),
            )
        ).over(w_prev).alias("_arr"),
    ).filter((F.col("role") == "assistant") & (F.col("turn_idx") >= 1))
    # C(i-1) for this turn, and the inclusion threshold
    thr = F.col("_cum") - F.col("_nt") - F.lit(max_context_tokens)
    staged = base.select(
        "conv_id",
        "turn_idx",
        "response",
        (F.col("_cum") - F.col("_nt")).alias("_cprev"),
        F.filter(
            F.col("_arr"), lambda x: x["cum_prev"] >= thr
        ).alias("_kept"),
    )
    return staged.select(
        "conv_id",
        "turn_idx",
        F.array_join(
            F.transform(F.col("_kept"), lambda x: x["line"]), sep
        ).alias("context"),
        "response",
        F.size("_kept").cast("long").alias("n_context_turns"),
        F.when(
            F.size("_kept") > 0,
            F.col("_cprev") - F.element_at("_kept", 1)["cum_prev"],
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_context_tokens"),
    )


def conversation_stats(tr: DataFrame) -> DataFrame:
    """Per-conversation rollup: turn counts by role, tool-call count, exact
    whitespace-token totals (overall and assistant-only), and wall-clock
    span in seconds. All-integer output so the oracle comparison is exact.

    Returns (conv_id, n_turns, n_user, n_assistant, n_tool_calls,
    total_tokens, assistant_tokens, duration_s).

    Dataflow: ONE exchange — the hash(conv_id) aggregation, with map-side
    partial aggregation doing the heavy lifting (token counting is pure
    codegen via tokens()). The classic transcript-corpus profiling scan.
    """
    n_tok = F.size(tokens(F.col("text"))).cast("long")
    is_assistant = F.col("role") == "assistant"
    return tr.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(is_assistant, 1).otherwise(0)).alias("n_assistant"),
        F.count("tool").alias("n_tool_calls"),
        F.sum(n_tok).alias("total_tokens"),
        F.sum(F.when(is_assistant, n_tok).otherwise(F.lit(0))).alias(
            "assistant_tokens"
        ),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
    )


def tool_bigrams(tr: DataFrame) -> DataFrame:
    """Tool-call sequence analytics: consecutive (tool, next tool) pairs
    within each conversation (turn order), counted corpus-wide — the
    agent-behavior transition matrix.

    Returns (tool_a, tool_b, n_pairs, n_convs) where ``n_convs`` is the
    number of distinct conversations the transition occurs in.

    Dataflow: tool-call rows are a map-side filter (usually a small fraction
    of turns — filter first, shuffle less); lead() needs hash(conv_id);
    the pair count is a second, much smaller aggregation keyed by the pair.
    The distinct-conv count is exact (two-phase distinct aggregate) — at
    10^12 turns the pair domain is |tools|^2, tiny, so the extra pass over
    pair-keyed rows is noise next to the conv-keyed sort.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = tr.filter(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    pairs = calls.select(
        "conv_id",
        F.col("tool").alias("tool_a"),
        F.lead("tool").over(w).alias("tool_b"),
    ).filter(F.col("tool_b").isNotNull())
    return pairs.groupBy("tool_a", "tool_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def assign_conversation_splits(
    tr: DataFrame,
    train_bp: int = 9000,
    val_bp: int = 500,
    test_bp: int = 500,
) -> DataFrame:
    """Leak-free train/val/test assignment at CONVERSATION granularity:
    every turn of a conversation lands in the same split. Splitting
    transcript corpora by ROW leaks a conversation's remaining turns into
    eval (the classic contamination bug for dialogue data); hashing the
    GROUP key fixes it for free. Basis points are 1/SAMPLE_MOD units and
    must sum exactly to SAMPLE_MOD (a total partition — nothing silently
    dropped).

    Adds a ``split`` column ('train' | 'val' | 'test') and the underlying
    ``split_bucket``. Pure codegen projection over the scan (the md5 bucket
    of conv_id, the same engine-portable rule as sampling.sample_bucket) —
    ZERO exchange, plan-pinned in tests/test_conversations.py.
    """
    from kg_obo_spark.operators.sampling import SAMPLE_MOD, sample_bucket

    parts = {"train": train_bp, "val": val_bp, "test": test_bp}
    for name, bp in parts.items():
        if bp < 0:
            raise ValueError(f"{name}_bp must be non-negative, got {bp}")
    if sum(parts.values()) != SAMPLE_MOD:
        raise ValueError(
            f"split sizes must sum to {SAMPLE_MOD}, got {sum(parts.values())}"
        )
    b = sample_bucket(F.col("conv_id"))
    split = (
        F.when(b < F.lit(train_bp), F.lit("train"))
        .when(b < F.lit(train_bp + val_bp), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return tr.select(
        "*", b.alias("split_bucket"), split.alias("split")
    )


def chunk_conversations(
    tr: DataFrame, window_turns: int = 4, stride: int = 2, sep: str = "\n"
) -> DataFrame:
    """Dialogue-RAG chunking: sliding windows of ``window_turns`` rendered
    turns per conversation with ``stride`` overlap — the retrieval-indexing
    splitter for transcript corpora (chunk_documents' coverage semantics at
    TURN granularity: every turn covered, window starts at multiples of the
    stride, the last window reaches the conversation's end, a conversation
    shorter than one window yields exactly one chunk).

    Returns (conv_id, chunk_id, first_turn_idx, n_turns, chunk_text) where
    ``chunk_text`` is the window's turns rendered ``role: text`` joined by
    ``sep`` and ``first_turn_idx`` is the real turn_idx of the window's
    first turn (turn indices need not be contiguous).

    Dataflow: ONE hash(conv_id) exchange (the per-conversation collect;
    array_sort of (turn_idx, line) structs makes the order arrival-
    independent); window enumeration and slicing are map-side HOFs with
    fan-out bounded by conversation length / stride. Plan-pinned in
    tests/test_conversations.py.
    """
    if window_turns <= 0:
        raise ValueError(f"window_turns must be positive, got {window_turns}")
    if not (0 < stride <= window_turns):
        raise ValueError(
            f"stride must be in (0, window_turns], got {stride}"
        )
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    assembled = tr.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", line.alias("line")))
        ).alias("_arr")
    )
    n = F.size("_arr")
    n_chunks = F.when(n <= window_turns, F.lit(1)).otherwise(
        F.floor((n - window_turns + stride - 1) / stride) + 1
    )
    d = assembled.select(
        "conv_id",
        "_arr",
        n.alias("_n"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_id", "_dup"
        ),
    )
    start = F.col("chunk_id") * stride  # 0-based ordinal
    take = F.least(F.lit(window_turns), F.col("_n") - start)
    return d.select(
        "conv_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.element_at("_arr", start.cast("int") + 1)["turn_idx"].alias(
            "first_turn_idx"
        ),
        take.cast("long").alias("n_turns"),
        F.array_join(
            F.transform(
                F.slice("_arr", start.cast("int") + 1, take.cast("int")),
                lambda x: x["line"],
            ),
            sep,
        ).alias("chunk_text"),
    )


def chunk_conversations_budget(
    tr: DataFrame, max_tokens: int, sep: str = "\n", tokenizer=None
) -> DataFrame:
    """Token-budget dialogue chunking: split each conversation into chunks
    of consecutive rendered turns whose combined whitespace-token count
    stays within ``max_tokens`` — turn-atomic greedy fill (a turn never
    splits; a single turn longer than the budget gets its own chunk). The
    chunk-size bound embedding models need, where
    :func:`chunk_conversations` bounds only the turn COUNT.

    Returns (conv_id, chunk_id, first_turn_idx, n_turns, n_tokens,
    chunk_text).

    ``tokenizer`` (the packing/chunking seam, e.g.
    :class:`~kg_obo_spark.functions.tokenizer.GreedyWordpiece`) switches the
    budget to SUBWORD token counts via the same map-side count stage as
    :func:`sft_examples_budget`; None keeps the whitespace model.

    Dataflow: ONE hash(conv_id) exchange total. The greedy fill is a
    sequential fold, but over a CONVERSATION-bounded array — so instead of
    the per-shard applyInPandas that corpus-scale atomic packing needs
    (operators/packing.py), it runs as a map-side ``F.aggregate`` HOF over
    the collected turn structs, and the per-chunk re-aggregation rides the
    collect's hash(conv_id) partitioning via the subset rule (grouping on
    (conv_id, chunk_id) reuses hash(conv_id)). Plan-pinned in
    tests/test_conversations.py.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    if tokenizer is not None:
        # subword-unit budgets via the tokenizer seam (same map-side count
        # stage as sft_examples_budget — the ONE-exchange plan is unchanged)
        tr = _append_subword_counts(tr, tokenizer)
        n_tok = F.col("_nt0")
    else:
        n_tok = F.size(tokens(F.col("text"))).cast("long")
    assembled = tr.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("turn_idx", line.alias("line"), n_tok.alias("nt"))
            )
        ).alias("_arr")
    )
    # greedy fill as a fold: acc = (current chunk id, tokens in it,
    # per-turn chunk assignments)
    init = F.struct(
        F.lit(0).alias("chunk"),
        F.lit(0).cast("long").alias("cur"),
        F.array().cast("array<int>").alias("out"),
    )

    def step(acc, x):
        overflow = (acc["cur"] > 0) & (acc["cur"] + x["nt"] > max_tokens)
        new_chunk = F.when(overflow, acc["chunk"] + 1).otherwise(acc["chunk"])
        new_cur = F.when(overflow, x["nt"]).otherwise(acc["cur"] + x["nt"])
        return F.struct(
            new_chunk.alias("chunk"),
            new_cur.alias("cur"),
            F.concat(acc["out"], F.array(new_chunk)).alias("out"),
        )

    d = assembled.select(
        "conv_id",
        "_arr",
        F.aggregate(F.col("_arr"), init, step)["out"].alias("_asg"),
    )
    d = d.select(
        "conv_id",
        F.posexplode("_arr").alias("_pos", "_t"),
        F.col("_asg"),
    ).select(
        "conv_id",
        F.element_at("_asg", F.col("_pos") + 1).cast("long").alias("chunk_id"),
        F.col("_t")["turn_idx"].alias("turn_idx"),
        F.col("_t")["line"].alias("_line"),
        F.col("_t")["nt"].alias("_nt"),
    )
    return d.groupBy("conv_id", "chunk_id").agg(
        F.min("turn_idx").alias("first_turn_idx"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_nt").alias("n_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", F.col("_line")))
                ),
                lambda x: x["_line"],
            ),
            sep,
        ).alias("chunk_text"),
    )


def dedup_conversations(tr: DataFrame) -> DataFrame:
    """Conversation-level exact dedup: fingerprint = md5 of the turn-ordered,
    whitespace-normalized, lowercased transcript (the dedup_exact
    normalization applied per turn, joined by newline in turn_idx order) —
    catches re-submitted / re-ingested conversations that row-level dedup
    can't see. Keep-first rule: the smallest conv_id per fingerprint is the
    keeper (same policy as dedup_exact's min-id rule).

    Returns (conv_id, fingerprint, keep) with keep 1/0.

    Dataflow: TWO exchanges, both inherent — hash(conv_id) to assemble each
    conversation's canonical string (collect_list of (turn_idx, norm)
    structs, array_sort for arrival-order independence, so the fingerprint
    is a pure function of the conversation), then hash(fingerprint) for the
    keep-first min window. Fingerprints are 32-byte strings; the second
    shuffle never carries text.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    assembled = tr.groupBy("conv_id").agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", norm.alias("norm")))
                    ),
                    lambda x: x["norm"],
                ),
                "\n",
            )
        ).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint")
    return assembled.select(
        "conv_id",
        "fingerprint",
        F.when(F.col("conv_id") == F.min("conv_id").over(w), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("keep"),
    )


def preference_pairs(tr: DataFrame) -> DataFrame:
    """Preference-pair (RLHF/DPO-style) construction: within each
    conversation, the assistant turns are candidate responses; the chosen
    response is the one with the highest score (here: exact whitespace token
    count — a deterministic stand-in for a reward-model score column) and
    the rejected one the lowest, with turn_idx breaking ties (earlier wins
    best, later wins worst, so a 2-candidate tie still yields a pair).
    Conversations with fewer than two assistant turns produce no row.

    Returns (conv_id, chosen_turn_idx, rejected_turn_idx, chosen_score,
    rejected_score, score_gap) — all BIGINT.

    Dataflow: ONE exchange. Both row_number() windows share the
    hash(conv_id) partitioning (two sort orders over the same exchange), and
    the final per-conversation pairing aggregation rides that partitioning
    via the subset rule — no second shuffle. Never a self-join of
    candidates. Plan-pinned in tests/test_conversations.py.
    """
    score = F.size(tokens(F.col("text"))).cast("long")
    cand = tr.filter(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", score.alias("score")
    )
    w_best = Window.partitionBy("conv_id").orderBy(
        F.col("score").desc(), F.col("turn_idx").asc()
    )
    w_worst = Window.partitionBy("conv_id").orderBy(
        F.col("score").asc(), F.col("turn_idx").desc()
    )
    ranked = cand.select(
        "conv_id",
        "turn_idx",
        "score",
        F.row_number().over(w_best).alias("_rb"),
        F.row_number().over(w_worst).alias("_rw"),
    )
    paired = ranked.groupBy("conv_id").agg(
        F.max(F.when(F.col("_rb") == 1, F.col("turn_idx"))).alias(
            "chosen_turn_idx"
        ),
        F.max(F.when(F.col("_rw") == 1, F.col("turn_idx"))).alias(
            "rejected_turn_idx"
        ),
        F.max(F.when(F.col("_rb") == 1, F.col("score"))).alias("chosen_score"),
        F.max(F.when(F.col("_rw") == 1, F.col("score"))).alias(
            "rejected_score"
        ),
    )
    return paired.filter(
        F.col("chosen_turn_idx") != F.col("rejected_turn_idx")
    ).select(
        "conv_id",
        "chosen_turn_idx",
        "rejected_turn_idx",
        "chosen_score",
        "rejected_score",
        (F.col("chosen_score") - F.col("rejected_score")).alias("score_gap"),
    )


def conversation_embeddings(
    embeddings: DataFrame,
    turns_per_conv: int = TURNS_PER_CONV,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(conv_id, n_turns, cemb array<double>): mean-pooled conversation
    embedding from its per-turn embeddings (conv_id = id // turns_per_conv,
    matching the transcripts_from_documents reshape; production keys the
    embedding table by (conv_id, turn_idx) directly).

    Pooling is the standard semantic-dedup representation (SemDeDup-style):
    one vector per conversation, so downstream near-dup / clustering runs on
    conversation count, not turn count. The element-wise sum LEFT-FOLDS over
    the turn-id-sorted array — a pinned association order, so an external
    oracle summing in the same order is bit-exact (IEEE addition is not
    associative; an unordered SQL avg() would not value-match).

    One hash(conv_id) exchange; arrays are conversation-bounded.
    """
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v")))
    )
    # integral div (never float division — exact for the full int64 range)
    g = embeddings.groupBy(
        F.expr(f"{id_col} div {int(turns_per_conv)}").alias("conv_id")
    ).agg(arr.alias("_arr"))
    first = F.transform(F.element_at("_arr", 1)["v"], lambda x: x.cast("double"))
    rest = F.slice(F.col("_arr"), 2, F.size("_arr") - 1)
    summed = F.aggregate(
        rest,
        first,
        lambda acc, x: F.zip_with(acc, x["v"], lambda a, b: a + b.cast("double")),
    )
    return g.select(
        "conv_id",
        F.size("_arr").cast("long").alias("n_turns"),
        F.transform(summed, lambda s: s / F.size("_arr")).alias("cemb"),
    )


def conversation_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.35,
    turns_per_conv: int = TURNS_PER_CONV,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic conversation-level near-duplicate pairs: (a, b, sim_e6) for
    conversation pairs whose mean-pooled embeddings reach ``threshold``
    cosine — embedding-space dedup at CONVERSATION granularity, catching
    paraphrased/re-rolled dialogues that exact transcript fingerprints
    (:func:`dedup_conversations`) and lexical MinHash both miss.

    Only complete conversations (exactly ``turns_per_conv`` turn vectors)
    participate — partial tails have incomparable pooled vectors. sim_e6 is
    the floor-e6 fixed point of the unclamped cosine (floor of an identical
    double is identical across engines; spelled-out dot/(|a||b|), the
    oracle-parity form). The comparison itself is integer.

    Scale shape: pooling is one conv-keyed exchange (above); the pair stage
    here is the EXACT O(n^2) baseline over pooled vectors — fine to a few
    hundred thousand conversations. Past that, feed the pooled frame to
    :func:`~kg_obo_spark.operators.similarity.embedding_near_dup_lsh`
    (id_col="conv_id", vec_col="cemb") — blocking, caps, and verify apply
    unchanged to pooled vectors.
    """
    from kg_obo_spark.operators.similarity import cosine

    # materialize the pooled frame once: it fans into BOTH join sides, and
    # without the checkpoint each side re-runs the pooling exchange — i.e.
    # re-scans the (corpus-sized) embeddings table twice (the
    # kg_comention_weights pattern, operators/materialize.py)
    pooled = (
        conversation_embeddings(embeddings, turns_per_conv, id_col, vec_col)
        .filter(F.col("n_turns") == turns_per_conv)
        .localCheckpoint()
    )
    a = pooled.select(F.col("conv_id").alias("a"), F.col("cemb").alias("va"))
    b = pooled.select(F.col("conv_id").alias("b"), F.col("cemb").alias("vb"))
    sim_e6 = F.floor(
        F.lit(1_000_000.0) * cosine(F.col("va"), F.col("vb"))
    ).cast("long")
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", sim_e6.alias("sim_e6"))
        .filter(F.col("sim_e6") >= int(threshold * 1_000_000))
    )


def cluster_conversations(
    embeddings: DataFrame,
    n_clusters: int = 8,
    iters: int = 3,
    turns_per_conv: int = TURNS_PER_CONV,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    seed_fn=None,
) -> DataFrame:
    """(conv_id, cluster_id): topic-cluster conversations by deterministic
    k-means over their mean-pooled turn embeddings — the grouping layer
    cluster-based curation needs (SemDeDup-style dedup-within-cluster,
    per-topic mixture weights, cluster-stratified eval splits). Compose with
    :func:`~kg_obo_spark.operators.sampling.mixture_sample_rates` on the
    cluster label for topic rebalancing.

    Pure composition of existing pieces: :func:`conversation_embeddings`
    (one conv-keyed exchange, checkpointed — it feeds every Lloyd
    iteration) -> :func:`~kg_obo_spark.operators.similarity.
    kmeans_centroids` (hash-spread deterministic seeds, broadcast map-only
    assignment, one (clusters x dim)-row shuffle per iteration — corpus
    never reshuffles) -> final map-only assignment. Deterministic given the
    mean values; ``exact=True`` (fixed-point integer means, see
    kmeans_centroids) makes the clustering BIT-reproducible at any
    parallelism, and with ``seed_fn=deterministic_centroids_md5`` fully
    engine-portable — the contract-oracle configuration.
    """
    from kg_obo_spark.operators.similarity import ivf_assign, kmeans_centroids

    pooled = (
        conversation_embeddings(embeddings, turns_per_conv, id_col, vec_col)
        .filter(F.col("n_turns") == turns_per_conv)
        .localCheckpoint()
    )
    cents = kmeans_centroids(
        pooled, n_clusters, iters, id_col="conv_id", vec_col="cemb",
        exact=exact, seed_fn=seed_fn,
    )
    return ivf_assign(pooled, cents, "conv_id", "cemb").select(
        "conv_id", F.col("centroid_id").alias("cluster_id")
    )


def conversation_near_dup_clustered(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_clusters: int = 8,
    iters: int = 2,
    turns_per_conv: int = TURNS_PER_CONV,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    seed_fn=None,
) -> DataFrame:
    """Cluster-blocked semantic near-dup (the SemDeDup deployment shape):
    pool -> k-means assign -> compare pairs only WITHIN a cluster. Same
    output schema as :func:`conversation_near_dup`; approximate — a pair
    straddling a cluster boundary is missed (recall vs the exact operator
    is measured in tests; high thresholds live well inside clusters).

    Scale shape: the corpus-quadratic exact pair stage becomes
    sum-over-clusters quadratic — one hash(cluster_id) exchange of the
    pooled frame per side, candidate volume n²/k for balanced clusters.
    Raise ``n_clusters`` as the corpus grows (SemDeDup runs tens of
    thousands of clusters at web scale); clusters are data-dependent, so a
    degenerate embedding distribution (everything in one cluster) degrades
    to the exact cost, never to wrong answers.
    """
    from kg_obo_spark.operators.similarity import (
        cosine,
        ivf_assign,
        kmeans_centroids,
    )

    pooled = (
        conversation_embeddings(embeddings, turns_per_conv, id_col, vec_col)
        .filter(F.col("n_turns") == turns_per_conv)
        .localCheckpoint()
    )
    cents = kmeans_centroids(
        pooled, n_clusters, iters, id_col="conv_id", vec_col="cemb",
        exact=exact, seed_fn=seed_fn,
    )
    assigned = ivf_assign(pooled, cents, "conv_id", "cemb").localCheckpoint()
    a = assigned.select(
        F.col("conv_id").alias("a"),
        F.col("cemb").alias("va"),
        F.col("centroid_id").alias("_ca"),
    )
    b = assigned.select(
        F.col("conv_id").alias("b"),
        F.col("cemb").alias("vb"),
        F.col("centroid_id").alias("_cb"),
    )
    sim_e6 = F.floor(
        F.lit(1_000_000.0) * cosine(F.col("va"), F.col("vb"))
    ).cast("long")
    return (
        a.join(b, (F.col("_ca") == F.col("_cb")) & (F.col("a") < F.col("b")))
        .select("a", "b", sim_e6.alias("sim_e6"))
        .filter(F.col("sim_e6") >= int(threshold * 1_000_000))
    )


def conversation_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 16,
    prefix_bits: int = 4,
    max_bucket: int = 256,
    turns_per_conv: int = TURNS_PER_CONV,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    store=None,
) -> DataFrame:
    """Hyperplane-LSH-blocked semantic near-dup over POOLED conversation
    embeddings (ROADMAP #11): the data-independent scale path beside the
    data-dependent cluster blocking of
    :func:`conversation_near_dup_clustered`. Output schema follows the
    similarity family — (a, b, sim) with round-6 cosine — since blocking,
    bucket cap, lineage, and verify are
    :func:`~kg_obo_spark.operators.similarity.embedding_near_dup_lsh`
    UNCHANGED, just keyed by (conv_id, cemb).

    ``planes`` switches the splitmix64 numpy signatures for JVM-codegen
    literal-plane signatures (:func:`~kg_obo_spark.operators.similarity.
    hyperplane_signature_literal`) — with
    :func:`~kg_obo_spark.operators.similarity.md5_sign_planes` that is the
    engine-portable contract configuration (the emb_near_dup_lsh pattern).

    Scale shape: one conv-keyed pooling exchange, then signature (map-only)
    -> chunk-key exchange -> capped candidate join — never corpus-quadratic,
    and unlike the clustered variant no Lloyd iterations and no degenerate-
    distribution quadratic worst case (hot buckets are capped, with the
    loss ledgered via ``store``)."""
    from kg_obo_spark.operators.similarity import (
        embedding_near_dup_lsh,
        hyperplane_signature_literal,
    )

    pooled = (
        conversation_embeddings(embeddings, turns_per_conv, id_col, vec_col)
        .filter(F.col("n_turns") == turns_per_conv)
        .localCheckpoint()
    )
    sigs = (
        hyperplane_signature_literal(pooled, planes, "conv_id", "cemb")
        if planes is not None
        else None
    )
    return embedding_near_dup_lsh(
        pooled,
        threshold=threshold,
        n_planes=n_planes,
        prefix_bits=prefix_bits,
        id_col="conv_id",
        vec_col="cemb",
        max_bucket=max_bucket,
        store=store,
        run_id="conv_lsh",
        signatures=sigs,
    )
