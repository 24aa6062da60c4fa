"""Line-level exact deduplication (boilerplate removal) over `documents`.

The layer BETWEEN doc-level dedup (dedup.py: whole-document hashes /
MinHash) and substring-level dedup (spandedup.py: arbitrary repeated
spans): remove individual LINES that recur across many documents —
navigation menus, cookie banners, footers, signatures. This is the
CCNet / RefinedWeb "repeated line" filter (Wenzek et al. LREC'20 §3;
Penedo et al. NeurIPS'23 §3.3 remove exact duplicate lines as part of
line-wise corrections).

Reference anchor: same select-then-cut shape as cValbasedSelector
(/root/reference/src/dspcore/valbasedSelector.cpp) — a data-driven
predicate computed in one pass decides which elements of each vector
survive — lifted from frame columns to document lines.

Scale design (100 TB):
  1. lines = posexplode(split(text, sep))          -- narrow, no shuffle
  2. freq  = lines groupBy(line) countDistinct(doc) -- the ONE corpus
     shuffle (Spark's two-phase distinct-agg, map-side partials); only
     lines passing `min_chars` are counted, so whitespace noise never
     ships. Keys are the line strings themselves (exact semantics, no
     collision risk); Spark hashes them for partitioning anyway, so key
     width costs bytes, not skew.
  3. duplicated lines (n_docs >= min_docs) join back against the
     exploded lines on `line` — sort-merge on the same key space; AQE
     broadcasts when the boilerplate set is small (it usually is:
     bounded by lines occurring in >= min_docs DISTINCT docs, a tiny
     fraction of distinct lines).
  4. per-doc rebuild: groupBy(doc_id) with sort_array(collect_list(
     struct(pos, ...))) -- one doc-key shuffle; the cut itself is a JVM
     filter/transform lambda, zero Python.
Three linear shuffles total, no pairwise work anywhere — a line shared
by a million documents costs one count row plus one join row per
occurrence, never O(n^2).

A super-common line IS a skewed join key in step 3; `approx=True`
switches step 2 to approx_count_distinct (single shuffle, HLL
partials) and is the knob to pair with AQE skew-join at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["line_stats", "line_dedup"]


def _lines(df: DataFrame, text_col: str, id_col: str, sep: str) -> DataFrame:
    return df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "line"))


def line_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n",
               min_chars: int = 1, approx: bool = False) -> DataFrame:
    """(line, n_docs) for every line of >= `min_chars` non-space chars:
    the number of DISTINCT documents containing it. Distinct-doc counting
    (not occurrence counting) so a single doc repeating its own header
    does not look like corpus boilerplate. `approx=True` uses HLL
    partials (approx_count_distinct) — one shuffle instead of Spark's
    two-phase exact distinct rewrite; counts are then ~±2 %."""
    lines = (_lines(df, text_col, id_col, sep)
             .filter(F.length(F.trim("line")) >= min_chars))
    cd = (F.approx_count_distinct(id_col) if approx
          else F.count_distinct(id_col))
    return lines.groupBy("line").agg(cd.alias("n_docs"))


def line_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n",
               min_docs: int = 2, min_chars: int = 1,
               approx: bool = False) -> DataFrame:
    """Remove every occurrence of each line found in >= `min_docs`
    distinct documents (RefinedWeb removes all copies — by the time a
    line is corpus boilerplate, no occurrence is the "original").

    Lines with fewer than `min_chars` non-space characters are never
    removed (empty/whitespace lines keep document structure; raise it
    to ~10 to also spare short common lines like headings).

    Returns one row per input document:
      id_col, n_lines, n_removed, dup_ratio (= n_removed/n_lines,
      6 dp), clean_text (surviving lines joined by `sep`; '' when every
      line was boilerplate).
    """
    lines = _lines(df, text_col, id_col, sep)
    dup = (line_stats(df, text_col, id_col, sep, min_chars, approx)
           .filter(F.col("n_docs") >= min_docs)
           .select("line", F.lit(True).alias("__dup")))
    marked = (lines.join(dup, "line", "left")
              .select(id_col, "pos", "line",
                      F.coalesce("__dup", F.lit(False)).alias("__dup")))
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("__dup").cast("long")).alias("n_removed"),
        F.sort_array(F.collect_list(
            F.struct("pos", "line", "__dup"))).alias("__ls"))
    kept = F.transform(
        F.filter("__ls", lambda s: ~s["__dup"]), lambda s: s["line"])
    return per_doc.select(
        id_col, "n_lines", "n_removed",
        F.round(F.col("n_removed") / F.col("n_lines"), 6).alias("dup_ratio"),
        F.array_join(kept, sep).alias("clean_text"))
