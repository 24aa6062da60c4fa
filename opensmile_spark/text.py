"""Text analysis for training-data pipelines over the `documents` table.

Beyond the reference's numeric-only data plane, a 100 TB corpus pipeline
needs text quality/diagnostic signals. All pure built-in expressions
(codegen'd, zero Python), each mirrored by ANSI SQL for the oracle gate:

  token_count      whitespace + word-regex token counts
  quality_score    length/punct/stopword-ratio composite
  lang_id          n-gram/stopword-hit heuristic (en/de/fr/es/unknown)
  fingerprint      md5 document fingerprint + rolling-shingle fingerprint
  repetition_metrics  Gopher-style top-n-gram / duplicated-n-gram ratios
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por"],
}


def _hit_ratio(tokens_col, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.array_intersect(tokens_col, arr))
    # ratio of distinct stopwords present (stable under doc length)
    return hits.cast("double") / float(len(words))


# GPT-2-style pretokenizer (Radford et al. 2019, public), restricted to
# the ASCII classes both regex engines (Java / RE2) treat identically:
# contractions, space-prefixed letter runs, digit runs, punctuation runs.
# Counting these approximates BPE token counts far better than whitespace
# (BPE splits punctuation and contractions into their own tokens).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    words = F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+"))
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    return (
        df.withColumn("n_tokens_ws", F.size(toks).cast("long"))
        .withColumn("n_tokens_word", words.cast("long"))
        .withColumn("n_tokens_bpe", bpe.cast("long"))
        .withColumn("n_chars_engine", F.length(text_col).cast("long"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword composite in [0,1]-ish; deterministic."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tok = F.size(toks).cast("double")
    n_chr = F.length(text_col).cast("double")
    punct_ratio = (F.length(F.regexp_replace(text_col, r"[^.,!?;:]", ""))
                   .cast("double") / n_chr)
    stop_ratio = _hit_ratio(toks, STOPWORDS["en"])
    mean_tok_len = n_chr / n_tok
    score = (
        F.least(n_tok / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 2.0, F.lit(1.0)) * 0.3
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.2).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.1).otherwise(0.0)
    )
    return (
        df.withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("quality", score)
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit heuristic language ID (argmax over per-language distinct
    stopword hit ratios; 'unknown' when the best ratio is < 0.1)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    scores = [(_hit_ratio(toks, ws), lang) for lang, ws in STOPWORDS.items()]
    best = F.greatest(*[s for s, _ in scores])
    expr = F.lit("unknown")
    # reverse order so ties resolve to the FIRST language in STOPWORDS order
    for s, lang in reversed(scores):
        expr = F.when((best >= 0.1) & (s == best), F.lit(lang)).otherwise(expr)
    return df.withColumn("lang_pred", expr)


def fingerprint(df: DataFrame, text_col: str = "text",
                shingle_k: int = 3) -> DataFrame:
    """md5 doc fingerprint + min-of-shingle-hash rolling fingerprint
    (order-sensitive content signature; shingles of k consecutive tokens)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, shingle_k), " ")
    )
    min_shingle = F.array_min(F.transform(shingles, F.md5))
    return (
        df.withColumn("doc_md5", F.md5(F.col(text_col)))
        .withColumn("shingle_fp", min_shingle)
    )


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       dup_k: int = 5) -> DataFrame:
    """Gopher-style (Rae et al. 2021, §A1.1) repetition quality signals per
    document, over whitespace tokens of the lowercased text:

      top_2gram_frac       chars covered by MOST FREQUENT 2-gram / doc chars
      top_3gram_frac       same for 3-grams
      dup_{k}gram_ratio    sum over k-grams occurring >= 2x of
                           count*len(gram), / doc chars (standard
                           overlap-counting form — grams share characters,
                           so the ratio can exceed 1 on degenerate
                           repetition; filter thresholds are tuned on this
                           raw scale). k = `dup_k` (Gopher uses 5-10;
                           shorter corpora use 2-3).

    Ties for the top gram resolve to the lexicographically smallest gram.
    Implementation is a single linear pass per document: sort the gram
    array, then fold run-lengths with `aggregate` — pure JVM column
    expressions, zero shuffle and zero Python, unlike the explode +
    groupBy(doc, gram) formulation whose shuffle would carry one row per
    gram occurrence (~doc length) at 100 TB."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    n_chr = F.length(text_col).cast("double")

    def sorted_grams(k: int):
        g = F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_sort(g)

    zero = F.lit(0).cast("long")

    def top_frac(k: int):
        init = F.struct(
            F.lit("").alias("prev"), zero.alias("cur"),
            zero.alias("best"), F.lit("").alias("bestg"))

        def step(acc, x):
            cur = F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1))
            better = cur > acc.best
            return F.struct(
                x.alias("prev"), cur.cast("long").alias("cur"),
                F.when(better, cur).otherwise(acc.best)
                 .cast("long").alias("best"),
                F.when(better, x).otherwise(acc.bestg).alias("bestg"))

        fin = F.aggregate(sorted_grams(k), init, step)
        return F.when(
            fin.best > 0,
            fin.best.cast("double") * F.length(fin.bestg) / n_chr,
        ).otherwise(F.lit(0.0))

    def dup_ratio(k: int):
        init = F.struct(
            F.lit("").alias("prev"), zero.alias("cur"), zero.alias("tot"))

        def step(acc, x):
            closed = F.when(acc.cur >= 2,
                            acc.cur * F.length(acc.prev)).otherwise(F.lit(0))
            return F.struct(
                x.alias("prev"),
                F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1))
                 .cast("long").alias("cur"),
                F.when(x == acc.prev, acc.tot)
                 .otherwise(acc.tot + closed).cast("long").alias("tot"))

        def finish(acc):
            last = F.when(acc.cur >= 2,
                          acc.cur * F.length(acc.prev)).otherwise(F.lit(0))
            return (acc.tot + last).cast("double") / n_chr

        return F.aggregate(sorted_grams(k), init, step, finish)

    return (
        df.withColumn("top_2gram_frac", top_frac(2))
        .withColumn("top_3gram_frac", top_frac(3))
        .withColumn(f"dup_{dup_k}gram_ratio", dup_ratio(dup_k))
    )


# PII patterns kept deliberately simple so the Java (Spark) and RE2
# (DuckDB oracle) regex dialects agree token-for-token
REDACT_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "PHONE": r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}",
}


def redact(df: DataFrame, text_col: str = "text",
           patterns: dict[str, str] | None = None) -> DataFrame:
    """PII scrubbing (the Dolma/CCNet-style pre-training cleanup stage):
    replace every match of each named pattern with its [NAME] token and
    count the replacements per document. Pure column expressions
    (regexp_replace / regexp_count are JVM codegen) — a map-only pass
    that composes with sampling/dedup filters and pushes down past
    column pruning. Patterns apply in sorted-name order so output is
    deterministic regardless of dict ordering."""
    pats = REDACT_PATTERNS if patterns is None else patterns
    out = df
    text = F.col(text_col)
    for name in sorted(pats):
        out = out.withColumn(
            f"n_{name.lower()}",
            F.regexp_count(text, F.lit(pats[name])).cast("long"))
        text = F.regexp_replace(text, pats[name], f"[{name}]")
    return out.withColumn(f"{text_col}_redacted", text)


def corpus_stats(df: DataFrame, strata_col=None,
                 text_col: str = "text", id_col: str = "doc_id",
                 approx_rsd: float | None = None) -> DataFrame:
    """Per-stratum corpus statistics for mixture planning: document count,
    token count, EXACT distinct-token vocabulary, and mean document
    length. `strata_col` may be a column name or Column expression; None
    computes one global row (stratum = '__all').

    Scale note: `n_vocab` uses count_distinct, which shuffles every
    distinct token once — exact and fine up to ~10^9 tokens/stratum. At
    100 TB pass `approx_rsd` (e.g. 0.02) to swap in HyperLogLog++
    (`approx_count_distinct`): one pass, fixed-size sketches, map-side
    combinable — the standard trade. The exact variant is the one the
    DuckDB oracle checks; the approx variant is pinned by a
    relative-error pytest."""
    strata = (F.lit("__all") if strata_col is None
              else F.col(strata_col) if isinstance(strata_col, str)
              else strata_col)
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = df.select(
        strata.alias("stratum"),
        F.col(id_col).alias("__id"),
        F.explode(toks).alias("token"))
    ndistinct = (F.approx_count_distinct("token", approx_rsd)
                 if approx_rsd is not None
                 else F.count_distinct("token"))
    return (
        exploded.groupBy("stratum")
        .agg(
            F.count_distinct("__id").alias("n_docs"),
            F.count("token").alias("n_tokens"),
            ndistinct.alias("n_vocab"),
            (F.count("token")
             / F.count_distinct("__id")).alias("mean_doc_tokens"),
        )
    )


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        shingle_k: int = 3, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme,
    Schleimer/Wilkerson/Aiken 2003): hash every k-token shingle to a 32-bit
    value (first 8 hex chars of md5 — portable to DuckDB), slide a window
    of `window` consecutive shingle hashes, keep the MINIMUM of each window
    (leftmost on ties), emit the distinct set. Guarantees any shared run of
    window+k-1 tokens between two documents shares at least one
    fingerprint — the positional dedup primitive between exact-hash and
    minhash. Output: one (id, fp) row per distinct fingerprint; join on fp
    for candidate pairs (bucketed, never O(n^2))."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0)))
    hashes = F.transform(
        idx,
        lambda i: F.conv(F.substring(
            F.md5(F.array_join(F.slice(toks, i + 1, shingle_k), " ")),
            1, 8), 16, 10).cast("long"),
    )
    m = F.size(hashes)
    win_starts = F.sequence(F.lit(0), F.greatest(m - window, F.lit(0)))
    mins = F.transform(
        win_starts,
        lambda i: F.array_min(F.slice(hashes, i + 1, window)),
    )
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(mins)).alias("fp"),
    )


def c4_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4-style structural quality signals (Raffel et al. 2020, §2.2 —
    public): line counts, fraction of lines ending in terminal
    punctuation, words per line, sentence count, and the curly-brace /
    "lorem ipsum" boilerplate markers. Signals, not decisions — a filter
    policy composes them downstream (e.g. keep iff
    frac_lines_term >= 0.5 AND NOT has_brace). Pure column expressions,
    zero shuffle; each mirrored by ANSI SQL in the oracle twin."""
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    term = F.size(F.filter(lines, lambda l: l.rlike(r'[.!?"]\s*$')))
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    return (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("frac_lines_term",
                    term.cast("double") / n_lines.cast("double"))
        .withColumn("words_per_line",
                    n_tok.cast("double") / n_lines.cast("double"))
        .withColumn("n_sentences",
                    F.regexp_count(F.col(text_col), F.lit(r"[.!?]+"))
                    .cast("long"))
        .withColumn("has_brace",
                    F.col(text_col).contains("{").cast("int"))
        .withColumn("has_lorem",
                    F.lower(F.col(text_col)).contains("lorem ipsum")
                    .cast("int"))
    )


def char_entropy(df: DataFrame, text_col: str = "text",
                 out_col: str = "char_entropy") -> DataFrame:
    """Character-level Shannon entropy per document — the CCNet-style
    gibberish/boilerplate proxy (low entropy = repeated characters or
    padding, high = encrypted/binary junk; natural text sits ~3.5-4.5
    bits). Arrow-batched pandas UDF (a per-doc Counter is cheaper than
    exploding every character through a shuffle); the oracle twin is the
    unnest + group-by entropy in SQL."""
    import math
    from collections import Counter

    # module-level `pd` (below import) is required: with
    # `from __future__ import annotations` the UDF type hints are
    # strings, and pyspark resolves them against the module globals
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ent(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if not t:
                out.append(0.0)
                continue
            n = len(t)
            out.append(-sum((c / n) * math.log2(c / n)
                            for c in Counter(t).values()))
        return pd.Series(out, dtype="float64")

    return df.withColumn(out_col, ent(F.col(text_col)))


def winnow_near_dups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     shingle_k: int = 3, window: int = 4,
                     min_shared: int = 2) -> DataFrame:
    """MOSS-style near-duplicate pairs from shared winnowing fingerprints
    (Schleimer/Wilkerson/Aiken 2003 §4: two documents sharing a token run
    of length window+k-1 MUST share a fingerprint, so counting shared
    fingerprints lower-bounds shared content). Self-join on the
    fingerprint key — the same output-bounded bucket-join shape as
    MinHash-LSH banding, never O(n^2); pairs are (a < b) with the shared
    fingerprint count for thresholding."""
    fps = winnow_fingerprints(df, text_col, id_col, shingle_k, window)
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= min_shared)
    )
