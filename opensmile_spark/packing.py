"""Training-sequence assembly for LLM data pipelines.

The last mile of a 100 TB corpus pipeline (after filtering / dedup /
mixing) is turning documents into fixed-budget training sequences and a
reproducible global order. openSMILE's analogue is the framer: fixed-size
windows cut from a continuous stream (cFramer, frameMode=fixed —
reference `src/dspcore/framer.cpp`); here the "stream" is the token
concatenation of a document set and the "frame" is a context window.

  chunk_documents        split each doc into overlapping token windows
                         (frameSize/frameStep ≙ max_tokens/stride) — a
                         narrow per-row explode, zero shuffle
  pack_concat            GPT-style concat-then-split packing: documents
                         are laid end-to-end in a deterministic order and
                         cut every `budget` tokens; docs may straddle a
                         boundary (emitted once per pack they touch with
                         doc-local token offsets). One window cumsum per
                         group — group by a shard key at scale so no
                         single global ordering is materialized
  pack_sequences         materialize the packs pack_concat only plans:
                         slice + assemble token-id arrays into exactly
                         `budget`-sized sequences (JVM array exprs; the
                         assembly groupBy reuses the cumsum window's
                         group-key exchange — one shuffle total)
  pack_greedy            first-fit no-split packing: walk docs in order,
                         open a new pack when the budget would overflow.
                         Sequential per group (applyInPandas); groups are
                         the parallelism unit
  deterministic_shuffle  seeded md5 shard + in-shard position — the
                         reproducible "global shuffle" a training run
                         needs (rerun-stable, engine-portable; same
                         portable-hash construction as sampling.py)

All token counting is whitespace tokens of the trimmed text, identical to
`text.token_count`'s `n_tokens_ws`, so budgets compose with its outputs.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StructField,
                               StructType)

from .sampling import _hash32


def chunk_documents(df: DataFrame, max_tokens: int = 128,
                    overlap: int = 16, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping context windows of at most
    `max_tokens` whitespace tokens with `overlap` tokens shared between
    consecutive chunks (stride = max_tokens - overlap).

    Chunk i covers tokens [i*stride, i*stride + max_tokens); the number of
    chunks is ceil((n - overlap) / stride) clamped to >= 1, so every token
    lands in at least one chunk and the last chunk is the only short one.

    Pure built-in expressions (split / sequence / posexplode / slice /
    array_join): narrow, no shuffle, whole-stage codegen; at 100 TB this
    pipelines with the parquet scan. openSMILE analogue: cFramer with
    frameSize=max_tokens, frameStep=stride (reference
    `src/dspcore/framer.cpp:24-38` — frameStep < frameSize is exactly the
    overlapping-window case).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap < max_tokens, got {overlap}")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # ceil((n - overlap) / stride), at least 1
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(float(stride)))
    ).cast("int")
    with_chunks = (
        df.withColumn("__toks", toks)
        .withColumn("__n_tokens", n.cast("long"))
        .select(
            id_col, "__toks", "__n_tokens",
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
             .alias("chunk_idx", "__i"),
        )
    )
    start = F.col("chunk_idx") * stride
    return (
        with_chunks.select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("__toks"), start + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(max_tokens).cast("long"),
                    F.col("__n_tokens") - start).alias("chunk_tokens"),
        )
    )


def pack_concat(df: DataFrame, budget: int,
                token_col: str = "n_tokens_ws",
                id_col: str = "doc_id",
                group_cols: Sequence[str] = (),
                carry_cols: Sequence[str] = ()) -> DataFrame:
    """Concat-then-split sequence packing: documents are concatenated in
    (`group_cols`, `id_col`) order and cut every `budget` tokens. A doc
    spanning a cut appears once per pack it touches, with the half-open
    doc-local token range [tok_begin, tok_end) it contributes and the
    offset `pack_begin` where that slice starts inside the pack — enough
    for a writer to assemble every pack without re-reading neighbours.

    Shape: one cumulative-sum window per group + a bounded span explode
    (a doc of t tokens touches at most t/budget + 1 packs). With empty
    `group_cols` the window is a single global ordering — fine for tests,
    a serial bottleneck at scale; production groups by a shard key
    (`deterministic_shuffle`) so each shard packs independently and in
    parallel, which is also what keeps pack ids stable under reruns.

    `carry_cols` are passed through unchanged to every emitted span row
    (e.g. a token-id array for `pack_sequences` to slice) — kept out of
    the window/agg math so they ride the same exchange for free.
    """
    from pyspark.sql import Window

    order = [id_col]
    w = (Window.partitionBy(*group_cols).orderBy(*order)
         if group_cols else Window.orderBy(*order))
    tok = F.col(token_col).cast("long")
    cum_end = F.sum(tok).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spans = (
        df.withColumn("__cum_end", cum_end)
        .withColumn("__cum_start", F.col("__cum_end") - tok)
        # packs touched: floor(start/b) .. floor((end-1)/b); empty docs
        # pin to the pack their position falls in
        .withColumn("__first",
                    F.floor(F.col("__cum_start") / budget))
        .withColumn("__last",
                    F.greatest(F.floor((F.col("__cum_end") - 1) / budget),
                               F.col("__first")))
    )
    pack = F.explode(F.sequence(F.col("__first"), F.col("__last"))) \
            .alias("pack_id")
    exploded = spans.select(
        *group_cols, id_col, *carry_cols,
        tok.alias("doc_tokens"), "__cum_start", pack)
    lo = F.greatest(F.lit(0), F.col("pack_id") * budget
                    - F.col("__cum_start"))
    hi = F.least(F.col("doc_tokens"), (F.col("pack_id") + 1) * budget
                 - F.col("__cum_start"))
    return exploded.select(
        *group_cols, id_col, *carry_cols, "doc_tokens",
        F.col("pack_id").cast("long").alias("pack_id"),
        lo.cast("long").alias("tok_begin"),
        hi.cast("long").alias("tok_end"),
        # where this doc's slice starts inside the pack = global slice
        # start minus the pack's global start
        F.greatest(F.lit(0), F.col("__cum_start")
                   - F.col("pack_id") * budget).cast("long")
         .alias("pack_begin"),
    )


def pack_sequences(df: DataFrame, budget: int,
                   ids_col: str = "bpe_token_ids",
                   id_col: str = "doc_id",
                   group_cols: Sequence[str] = (),
                   pad_id: int | None = None) -> DataFrame:
    """Assemble the actual packed training sequences: concat the
    `ids_col` arrays of each group's documents in `id_col` order and cut
    every `budget` ids — the materialized counterpart of `pack_concat`'s
    manifest (which it reuses for the span math, carrying the id arrays
    through the same exchange).

    Returns one row per (group, pack_id):
      input_ids  array<int> of exactly `budget` ids (the final pack of a
                 group may be shorter; `pad_id` right-pads it to budget)
      n_docs     documents contributing to the pack
      n_ids      ids before padding

    Shape: with non-empty `group_cols` the whole chain is ONE exchange —
    the (group, pack_id) assembly groupBy is satisfied by the cumsum
    window's hash partitioning on the group key, so each token id
    crosses the wire exactly once (plan-audited). Slicing and assembly
    are JVM array expressions (slice / sort_array / flatten), zero
    Python. Same scale contract as pack_concat: group by a shard key so
    packing parallelizes and pack ids are rerun-stable.
    """
    counted = df.withColumn("__n_ids", F.size(ids_col).cast("long"))
    man = pack_concat(counted, budget, "__n_ids", id_col, group_cols,
                      carry_cols=(ids_col,))
    piece = F.slice(
        F.col(ids_col), (F.col("tok_begin") + 1).cast("int"),
        (F.col("tok_end") - F.col("tok_begin")).cast("int"))
    assembled = (
        man.select(*group_cols, "pack_id", "pack_begin",
                   F.col(id_col).alias("__doc"), piece.alias("__piece"))
        .groupBy(*group_cols, "pack_id")
        .agg(
            F.flatten(F.transform(
                F.sort_array(F.collect_list(
                    F.struct("pack_begin", "__doc", "__piece"))),
                lambda s: s["__piece"])).alias("input_ids"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .withColumn("n_ids", F.size("input_ids").cast("long")))
    if pad_id is not None:
        pad = F.array_repeat(
            F.lit(pad_id).cast("int"),
            (F.lit(budget) - F.col("n_ids")).cast("int"))
        assembled = assembled.withColumn(
            "input_ids", F.concat("input_ids", pad))
    return assembled.select(*group_cols, "pack_id", "input_ids",
                            "n_docs", "n_ids")


def pack_greedy(df: DataFrame, budget: int,
                token_col: str = "n_tokens_ws",
                id_col: str = "doc_id",
                group_cols: Sequence[str] = ("source",)) -> DataFrame:
    """First-fit no-split packing: within each group, walk documents in
    `id_col` order keeping a running token total; when adding a non-first
    doc would exceed `budget`, open a new pack. Docs longer than the
    budget get a pack of their own (no truncation — downstream
    `chunk_documents` handles oversized docs).

    The walk is inherently sequential, so it runs per group via
    applyInPandas (Arrow batch, sort + one linear pass — no per-row
    Python); `group_cols` is the parallelism unit. At 100 TB, group by a
    deterministic shard (`deterministic_shuffle`) sized so each shard's
    doc list fits an Arrow batch; pack ids are (group, local id) —
    globally unique once the group key is part of the output.
    """
    out_fields = [f for f in df.select(*group_cols, id_col, token_col)
                  .schema.fields]
    schema = out_fields + [
        StructField("pack_id", LongType(), False),
        StructField("pack_pos", IntegerType(), False),
        StructField("pack_tokens", LongType(), False),
    ]
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort",
                              ignore_index=True)
        toks = pdf[token_col].to_numpy()
        pack_id, pos, run = 0, 0, 0
        pids, poss, runs = [], [], []
        for i, t in enumerate(toks):
            # a non-first doc always extends a non-empty pack (the doc
            # that opened it), so the open-new-pack rule is simply
            # "adding this doc would overflow" — including after
            # zero-token prefixes, matching the recursive-CTE oracle
            if i > 0 and run + t > budget:
                pack_id, pos, run = pack_id + 1, 0, 0
            pids.append(pack_id)
            poss.append(pos)
            run += int(t)
            runs.append(run)
            pos += 1
        pdf["pack_id"] = pd.Series(pids, dtype="int64")
        pdf["pack_pos"] = pd.Series(poss, dtype="int32")
        pdf["pack_tokens"] = pd.Series(runs, dtype="int64")
        return pdf

    return (df.select(*group_cols, id_col, token_col)
            .groupBy(*group_cols)
            .applyInPandas(pack, StructType(schema)))


def deterministic_shuffle(df: DataFrame, n_shards: int = 1024,
                          key_col: str = "doc_id",
                          seed: int = 0) -> DataFrame:
    """Reproducible global shuffle: shard = md5-hash(key:seed) mod
    n_shards, position = rank of the hash within the shard. Rerun-stable,
    engine-portable (same md5 construction as `sampling._hash32`), and
    independent of input partitioning — the properties `df.orderBy(rand())`
    lacks. Ties on the 32-bit hash break by key, so the order is total.

    One shuffle on the shard key; each shard sorts locally (row_number,
    not a global sort). A training reader consumes shards in id order,
    rows in `shuffle_pos` order — equivalent to one fixed permutation of
    the corpus. At 10^9 docs use n_shards large enough that a shard's
    row_number window fits an executor (e.g. 64k shards).
    """
    from pyspark.sql import Window

    h = _hash32(F.col(key_col), seed)
    w = Window.partitionBy("shard").orderBy("__h", key_col)
    return (df.withColumn("__h", h)
            .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
            .withColumn("shuffle_pos",
                        (F.row_number().over(w) - 1).cast("long"))
            .drop("__h"))
