"""Seed-based document quality classifier — multinomial Naive Bayes.

The standard web-corpus quality filter (GPT-3's LR-on-ngrams, CCNet's
fastText, DCLM's fastText OH-2.5+ELI5) scores every document against a
small labeled seed set: positive = curated text, negative = random crawl.
This is the Spark-native analogue with multinomial NB, chosen over SGD
models because its fit is ONE aggregation — per-token class counts — so
training is a single shuffle at any corpus size and the whole fit+score
chain stays expressible in portable SQL (DuckDB-twinnable, hence
driver-gateable bit-for-bit).

  fit:    tokenize -> groupBy(token) -> per-class counts -> log-odds
          w(t) = log (c1(t)+a)/(T1+aV) - log (c0(t)+a)/(T0+aV)
          (Laplace alpha; V = vocab size; T_k = class token totals)
  score:  tokenize -> broadcast-join the log-odds table -> per-doc
          sum(w) + n_unseen * w_unseen + prior
          where w_unseen = log (T0+aV)/(T1+aV) is the constant every
          out-of-vocab token contributes (both classes back off to a).

100 TB design: the model is <= vocab rows (bounded by `max_vocab` via
deterministic top-by-total-count), broadcast to executors; the corpus is
scanned once for fit (one explode + one hash aggregate with map-side
partial) and once per scoring pass (explode + broadcast join + one
aggregate — zero corpus-side shuffle beyond the doc_id re-group, which
AQE folds into the aggregate). No Python in either path.

Reference anchor: openSMILE ships no text classifier (cLibsvmSink merely
exports features; SURVEY §2 maps ML sinks out of scope) — this is part
of the beyond-reference training-data surface, alongside lm.charlm
(perplexity filter) and text.quality_score (heuristic filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = r"[a-z0-9]+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        id_col,
        F.explode(F.expr(
            f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)"
        )).alias("token"))


def nb_fit(docs: DataFrame, label_col: str = "label",
           id_col: str = "doc_id", text_col: str = "text",
           alpha: float = 1.0, max_vocab: int | None = None):
    """Fit per-token log-odds from a labeled seed frame (label 1 =
    positive / keep-worthy, 0 = negative). Returns (weights_df, params):
    weights_df = (token, log_odds) — persistable, joinable, bounded;
    params = dict(prior, w_unseen, alpha, vocab) — scalars."""
    import math

    toks = _tokens(docs, id_col, text_col).join(
        docs.select(id_col, F.col(label_col).cast("int").alias("__y")),
        id_col)
    counts = (toks.groupBy("token")
              .agg(F.sum("__y").alias("c1"),
                   (F.count("*") - F.sum("__y")).alias("c0"),
                   F.count("*").alias("c")))
    if max_vocab is not None:
        # deterministic truncation: top by total count, ties on token
        counts = (counts.orderBy(F.desc("c"), F.asc("token"))
                  .limit(max_vocab))
    counts = counts.persist()
    tot = counts.agg(F.sum("c1").alias("t1"), F.sum("c0").alias("t0"),
                     F.count("*").alias("v")).collect()[0]
    t1, t0, v = float(tot["t1"] or 0), float(tot["t0"] or 0), int(tot["v"])
    d1 = t1 + alpha * v
    d0 = t0 + alpha * v
    weights = counts.select(
        "token",
        (F.log((F.col("c1") + alpha) / d1)
         - F.log((F.col("c0") + alpha) / d0)).alias("log_odds"))
    n1 = docs.filter(F.col(label_col).cast("int") == 1).count()
    n0 = docs.count() - n1
    params = {
        "prior": math.log(max(n1, 1) / max(n0, 1)),
        "w_unseen": math.log(d0 / d1) if d1 > 0 and d0 > 0 else 0.0,
        "alpha": alpha,
        "vocab": v,
    }
    return weights, params


def nb_score(docs: DataFrame, weights: DataFrame, params: dict,
             id_col: str = "doc_id", text_col: str = "text",
             out_col: str = "nb_score") -> DataFrame:
    """Score every document: sum of seen-token log-odds + the constant
    out-of-vocab contribution per unseen token + class prior. One corpus
    scan, broadcast model join, no Python. Output: one row per doc —
    (id, n_tokens_nb, n_seen_nb, <out_col>, <out_col>_pred)."""
    toks = _tokens(docs, id_col, text_col)
    joined = toks.join(F.broadcast(weights), "token", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens_nb"),
        F.count("log_odds").alias("n_seen_nb"),
        F.coalesce(F.sum("log_odds"), F.lit(0.0)).alias("__seen_sum"))
    score = (F.col("__seen_sum")
             + (F.col("n_tokens_nb") - F.col("n_seen_nb"))
             * F.lit(float(params["w_unseen"]))
             + F.lit(float(params["prior"])))
    out = agg.select(id_col, "n_tokens_nb", "n_seen_nb",
                     score.alias(out_col))
    # docs whose text yields zero tokens score prior alone
    empties = (docs.select(id_col).join(out.select(id_col), id_col,
                                        "left_anti")
               .select(id_col,
                       F.lit(0).cast("long").alias("n_tokens_nb"),
                       F.lit(0).cast("long").alias("n_seen_nb"),
                       F.lit(float(params["prior"])).alias(out_col)))
    out = out.unionByName(empties)
    return out.withColumn(f"{out_col}_pred",
                          (F.col(out_col) > 0).cast("int"))
