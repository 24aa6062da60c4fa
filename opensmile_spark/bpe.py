"""Distributed BPE tokenizer: train (Sennrich et al. ACL'16, public) and
encode over the `documents` table.

Closes the loop text.token_count only approximates: that op COUNTS
GPT-2-style pretokens; this one learns an actual merge table from the
corpus and emits real subword tokens — the last step a training-data
pipeline needs before packing sequences by true token budget.

Reference anchor: the train/apply split mirrors cVectorMVN's two-phase
shape (/root/reference/src/dspcore/vectorMVN.cpp — estimate statistics
over the full input, then apply them row-wise); here the "statistics"
are the learned merge ranks and "apply" is subword encoding.

Scale design (100 TB):
  - `word_histogram`: ONE groupBy(word) shuffle with map-side partial
    counts. Words come from the same GPT-2-style pretokenizer regex as
    text.token_count (JVM regexp_extract_all + explode, no Python), so
    the histogram is the tokenizer's entire view of the corpus.
  - `bpe_train`: the merge loop runs over the TOP-K histogram rows
    (default 50k) collected to the driver — the bounded-model protocol
    every production tokenizer trainer uses (a word-count dict, not the
    corpus). Zipf's law puts ~99%+ of token mass in the top-50k words
    at web scale, and K bounds driver memory independent of corpus
    size. The loop itself is pure python over ≤K tuples and never
    touches the cluster.
  - `bpe_encode`: map-only — zero shuffle, zero joins. The merge-rank
    dict is a broadcast variable (~vocab_size entries); one Arrow
    kernel per batch pretokenizes and encodes each DISTINCT word once
    (memoized — Zipf again), so per-batch cost scales with distinct
    words, not token count.

Determinism: pair selection breaks count ties on the lexicographically
smaller pair; histogram truncation breaks count ties on the smaller
word — training is reproducible bit-for-bit across partitionings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from .text import BPE_ISH_PATTERN

__all__ = ["BPEModel", "UNK_ID", "word_histogram", "bpe_train",
           "bpe_encode", "bpe_encode_ids"]


def word_histogram(df: DataFrame, text_col: str = "text",
                   pattern: str = BPE_ISH_PATTERN,
                   lowercase: bool = False) -> DataFrame:
    """(word, count) over the GPT-2-style pretokens of `text_col`.
    One shuffle (map-side partial counts); pretokens keep their leading
    space (the Ġ convention), so token concatenation reconstructs the
    source text wherever the pattern tiles it."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = F.explode(F.regexp_extract_all(txt, F.lit(pattern), 0))
    return (df.select(words.alias("word"))
            .groupBy("word").count())


UNK_ID = 0


@dataclass
class BPEModel:
    """Ordered merge list + training alphabet. `merges[i]` is the pair
    merged at step i; earlier rank wins during encoding (standard BPE).
    `alphabet` (sorted distinct characters of the training histogram)
    anchors the integer vocabulary: id 0 is <unk>, ids 1..|alphabet|
    are the base characters, merged symbols follow in creation order —
    deterministic, so the same corpus always yields the same ids."""
    merges: list = field(default_factory=list)
    alphabet: list = field(default_factory=list)

    @property
    def ranks(self) -> dict:
        return {pair: i for i, pair in enumerate(self.merges)}

    def vocab(self) -> list:
        """Merged symbols in creation order (base chars excluded — they
        are implicit: any single character is always a valid token)."""
        return [a + b for a, b in self.merges]

    def token_ids(self) -> dict:
        """token -> id. Unseen tokens map to UNK_ID (0) at encode time."""
        ids = {c: i + 1 for i, c in enumerate(self.alphabet)}
        base = len(self.alphabet) + 1
        for j, (a, b) in enumerate(self.merges):
            ids.setdefault(a + b, base + j)
        return ids

    @property
    def vocab_size(self) -> int:
        """ids are dense in [0, vocab_size): unk + alphabet + merges
        (minus merges whose symbol collides with an earlier token)."""
        return len(self.token_ids()) + 1

    def to_df(self, spark) -> DataFrame:
        """Persistable (kind, rank, left, right) table: kind='char' rows
        hold the alphabet (token in `left`), kind='merge' rows the
        ordered merges."""
        rows = ([("char", i, c, None) for i, c in enumerate(self.alphabet)]
                + [("merge", i, a, b)
                   for i, (a, b) in enumerate(self.merges)])
        return spark.createDataFrame(
            rows, "kind string, rank int, left string, right string")

    @classmethod
    def from_df(cls, df: DataFrame) -> "BPEModel":
        rows = df.collect()
        chars = sorted((r for r in rows if r["kind"] == "char"),
                       key=lambda r: r["rank"])
        merges = sorted((r for r in rows if r["kind"] == "merge"),
                        key=lambda r: r["rank"])
        return cls(merges=[(r["left"], r["right"]) for r in merges],
                   alphabet=[r["left"] for r in chars])


def _train_on_hist(hist: list, n_merges: int, min_count: int) -> list:
    """Classic BPE merge loop over [(word, count)] — pure python."""
    words = [(tuple(w), c) for w, c in hist if w]
    merges = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # max count; ties -> lexicographically smallest pair (determinism)
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_words = []
        for syms, c in words:
            if a not in syms:
                new_words.append((syms, c))
                continue
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), c))
        words = new_words
    return merges


def bpe_train(df: DataFrame, n_merges: int = 200, top_k: int = 50_000,
              min_count: int = 2, text_col: str = "text",
              pattern: str = BPE_ISH_PATTERN,
              lowercase: bool = False) -> BPEModel:
    """Learn `n_merges` BPE merges from the corpus.

    The cluster computes the word histogram (one shuffle); the driver
    trains on its top-`top_k` rows (count desc, word asc — bounded,
    deterministic). Merging stops early when the best pair's weighted
    count drops below `min_count`.
    """
    hist_rows = (word_histogram(df, text_col, pattern, lowercase)
                 .orderBy(F.desc("count"), F.asc("word"))
                 .limit(top_k)
                 .collect())
    hist = [(r["word"], r["count"]) for r in hist_rows]
    alphabet = sorted({c for w, _ in hist for c in w})
    return BPEModel(merges=_train_on_hist(hist, n_merges, min_count),
                    alphabet=alphabet)


def _encode_word(word: str, ranks: dict) -> list:
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(df: DataFrame, model: BPEModel, text_col: str = "text",
               out_col: str = "bpe_tokens",
               pattern: str = BPE_ISH_PATTERN,
               lowercase: bool = False) -> DataFrame:
    """Append `out_col` (array<string> subword tokens) and
    `n_{out_col}` (long). Map-only: merge ranks ride a broadcast
    variable, the Arrow kernel memoizes per distinct word, no shuffle.
    """
    import re

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(model.merges)
    rx = re.compile(pattern)
    do_lower = lowercase

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts):
        import pandas as pd

        ranks = {pair: i for i, pair in enumerate(bc.value)}
        memo: dict = {}

        def enc(text):
            if text is None:
                return []
            if do_lower:
                text = text.lower()
            out = []
            for w in rx.findall(text):
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return pd.Series([enc(t) for t in texts])

    out = df.withColumn(out_col, encode(F.col(text_col)))
    return out.withColumn(f"n_{out_col}", F.size(out_col).cast("long"))


def bpe_encode_ids(df: DataFrame, model: BPEModel,
                   text_col: str = "text",
                   out_col: str = "bpe_token_ids",
                   pattern: str = BPE_ISH_PATTERN,
                   lowercase: bool = False) -> DataFrame:
    """Append `out_col` (array<int> token ids under `model.token_ids()`;
    unseen tokens -> UNK_ID) and `n_{out_col}` (long). Same map-only
    broadcast-kernel shape as `bpe_encode`; feed the result straight to
    packing.pack_sequences for budget-exact training sequences."""
    import re

    from pyspark.sql.types import IntegerType

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast((model.merges, model.alphabet))
    rx = re.compile(pattern)
    do_lower = lowercase

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(texts):
        import pandas as pd

        merges, alphabet = bc.value
        m = BPEModel(merges=merges, alphabet=alphabet)
        ranks, ids = m.ranks, m.token_ids()
        memo: dict = {}

        def enc(text):
            if text is None:
                return []
            if do_lower:
                text = text.lower()
            out = []
            for w in rx.findall(text):
                t = memo.get(w)
                if t is None:
                    t = [ids.get(s, UNK_ID)
                         for s in _encode_word(w, ranks)]
                    memo[w] = t
                out.extend(t)
            return out

        return pd.Series([enc(t) for t in texts])

    out = df.withColumn(out_col, encode(F.col(text_col)))
    return out.withColumn(f"n_{out_col}", F.size(out_col).cast("long"))
